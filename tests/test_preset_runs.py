"""Every implemented benchmark preset drives its model end-to-end for a
couple of epochs on a tiny synthetic KG — the cheap net that catches
preset <-> model contract breaks and run-loop regressions."""

import numpy as np
import pytest

from openea_tpu.data.synthetic import synthesize_kg_pair
from openea_tpu.presets import get_preset, preset_names
from openea_tpu.registry import get_model

# presets skipped here: GMNN has its own candidate pipeline covered in
# test_gmnn; the *_100K deltas only change sizes
SKIP = {"gmnn"}

# per-preset tiny-run overrides (shrink dims/epochs; keep the contract)
COMMON = dict(max_epoch=2, start_valid=100, eval_freq=100, batch_size=300,
              csls=2, top_k=[1, 5], is_save=False, seed=0,
              eval_block_size=512)
SPECIAL = {
    "rsn4ea": dict(max_length=7, num_samples=32, hidden_size=16, dim=16,
                   batch_size=128),
    "rdgcn": dict(dim=16),
    "alinet": dict(layer_dims=[16, 16], batch_size=60, min_rel_win=4,
                   start_augment=99),
    "multike": dict(dim=16, literal_len=3, word2vec_dim=16, encoder_epoch=2,
                    attribute_batch_size=200, entity_batch_size=200,
                    start_predicate_soft_alignment=99),
    "kdcoe": dict(dim=16, wv_dim=16, desc_batch_size=32, max_iter=1,
                  default_desc_length=4, eval_freq=2),
    "bootea": dict(sub_epoch=2),
    "bootea_transh": dict(sub_epoch=2),
    "bootea_rotate": dict(sub_epoch=2, start_bp=1, min_iter=0),
    "conve": dict(dnn_neg_nums=32, dim=16, filter_num=2),
    "proje": dict(dnn_neg_nums=32, dim=16),
    "jape": dict(attr_max_epoch=2, sub_mat_size=40),
    "imuse": dict(interactive_model_iter_num=1),
    "iptranse": dict(bp_freq=1),
}


@pytest.fixture(scope="module")
def tiny_kgs_cache():
    cache = {}

    def get(mode):
        if mode not in cache:
            cache[mode] = synthesize_kg_pair(
                num_entities=120, num_relations=6, num_triples=700,
                mode=mode, edge_keep_prob=1.0, noise_edge_frac=0.0,
                train_frac=0.3, num_attributes=8, attrs_per_entity=3,
                seed=23)
        return cache[mode]

    return get


_SLOW_PRESETS = {"gcnalign"}       # >20s: full-graph SE+AE double step


@pytest.mark.parametrize(
    "name", [pytest.param(n, marks=pytest.mark.slow)
             if n in _SLOW_PRESETS else n
             for n in preset_names() if n not in SKIP])
def test_preset_tiny_run(name, tiny_kgs_cache):
    args = get_preset(name, "15K")
    for k, v in COMMON.items():
        setattr(args, k, v)
    for k, v in SPECIAL.get(name, {}).items():
        setattr(args, k, v)
    if name not in SPECIAL or "dim" not in SPECIAL.get(name, {}):
        args.dim = 16
    kgs = tiny_kgs_cache(args.alignment_module)
    model = get_model(args.embedding_module)()
    model.set_args(args)
    model.set_kgs(kgs)
    model.init()
    model.run()
    hits1 = model.valid("hits1")
    assert np.isfinite(hits1)
