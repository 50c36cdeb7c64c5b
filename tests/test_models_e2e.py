"""End-to-end smoke tests: small synthetic KG pair (isomorphic-ish so
alignment is learnable), few epochs, Hits@1 far above the ~0.5% random
baseline."""

import numpy as np
import pytest

from openea_tpu.config import Args
from openea_tpu.data.synthetic import synthesize_kg_pair
from openea_tpu.eval.evaluation import test as eval_test
from openea_tpu.registry import get_model


def make_kgs(mode, seed=7):
    return synthesize_kg_pair(num_entities=200, num_relations=8,
                              num_triples=2000, mode=mode,
                              edge_keep_prob=1.0, noise_edge_frac=0.0,
                              train_frac=0.3, seed=seed)


def run_model(name, mode, epochs=100, kgs=None, **overrides):
    kgs = kgs or make_kgs(mode)
    values = dict(
        embedding_module=name, alignment_module=mode, dim=48,
        batch_size=400, learning_rate=0.02, max_epoch=epochs,
        start_valid=epochs + 1, eval_freq=epochs + 1, top_k=[1, 5, 10],
        csls=3, is_save=False, seed=0)
    values.update(overrides)
    args = Args(values)
    model = get_model(name)()
    model.set_args(args)
    model.set_kgs(kgs)
    model.init()
    model.run()
    return model, kgs


def test_hits1(model):
    e1, e2, mapping = model._eval_test_embeddings()
    _, hits1, mrr = eval_test(e1, e2, mapping, [1, 5, 10],
                              metric=model.args.eval_metric,
                              normalize=model.args.eval_norm)
    return hits1, mrr


def test_mtranse_e2e_learns():
    model, kgs = run_model(
        "MTransE", "mapping",
        init="unit", optimizer="Adagrad", eval_metric="inner",
        ent_l2_norm=True, rel_l2_norm=True, alpha=5, eval_norm=True)
    hits1, mrr = test_hits1(model)
    assert hits1 > 20.0  # random baseline ~0.5%
    assert mrr > 0.3


def test_aligne_e2e_learns():
    model, kgs = run_model(
        "AlignE", "swapping", epochs=100, learning_rate=0.05,
        init="normal", loss="limited", neg_sampling="truncated",
        optimizer="Adagrad", eval_metric="inner", loss_norm="L2",
        ent_l2_norm=True, rel_l2_norm=True, pos_margin=0.01,
        neg_margin=2.0, neg_margin_balance=0.2, neg_triple_num=5,
        truncated_epsilon=0.9, truncated_freq=10, eval_norm=False)
    hits1, mrr = test_hits1(model)
    assert hits1 > 40.0
    assert mrr > 0.5


def test_save_and_retest(tmp_path):
    model, kgs = run_model(
        "MTransE", "mapping", epochs=10,
        init="unit", optimizer="Adagrad", eval_metric="inner",
        ent_l2_norm=True, rel_l2_norm=True, alpha=5, eval_norm=True,
        output=str(tmp_path) + "/")
    model.save()
    import os
    assert os.path.exists(os.path.join(model.out_folder, "ent_embeds.npy"))
    model.retest()
    model.test(save=True)
    assert os.path.exists(os.path.join(model.out_folder, "alignment_results_12"))


# pytest collects test_hits1 as a test by name; mark it as a helper
test_hits1.__test__ = False


def test_fused_valid_matches_separate_path():
    """The fused train+quick-valid super-step (one device call per eval
    window) must produce identical params and early-stop flags to the
    separate valid() path."""
    import openea_tpu.models.base as B

    kw = dict(init="unit", optimizer="Adagrad", eval_metric="inner",
              ent_l2_norm=True, rel_l2_norm=True, alpha=5, eval_norm=True,
              epochs_per_call=5, start_valid=5, eval_freq=5,
              stop_metric="hits1")
    m1, _ = run_model("MTransE", "mapping", epochs=20, **kw)
    assert any(k[0] == "superv" for k in m1._epoch_fn_cache
               if isinstance(k, tuple)), "fused-valid path never fired"
    orig = B.BasicModel._can_fuse_valid
    B.BasicModel._can_fuse_valid = lambda self: False
    try:
        m2, _ = run_model("MTransE", "mapping", epochs=20, **kw)
    finally:
        B.BasicModel._can_fuse_valid = orig
    assert m1.flag1 == m2.flag1 and m1.flag2 == m2.flag2
    assert m1.early_stop == m2.early_stop
    np.testing.assert_allclose(np.asarray(m1.params["ent_embeds"]),
                               np.asarray(m2.params["ent_embeds"]), atol=1e-6)


def test_multiwin_fused_matches_separate_path():
    """The multi-window fused call (8 eval windows + on-device early stop
    per device call) must stop at the same epoch with identical params
    and flags as the separate-valid host loop."""
    import openea_tpu.models.base as B

    kw = dict(init="unit", optimizer="Adagrad", eval_metric="inner",
              ent_l2_norm=True, rel_l2_norm=True, alpha=5, eval_norm=True,
              epochs_per_call=5, start_valid=5, eval_freq=5,
              stop_metric="hits1")
    m1, _ = run_model("MTransE", "mapping", epochs=400, **kw)
    assert any(k[0] == "multiwin" for k in m1._epoch_fn_cache
               if isinstance(k, tuple)), "multiwin path never fired"
    orig = B.BasicModel._can_fuse_valid
    B.BasicModel._can_fuse_valid = lambda self: False
    try:
        m2, _ = run_model("MTransE", "mapping", epochs=400, **kw)
    finally:
        B.BasicModel._can_fuse_valid = orig
    assert m1.early_stop == m2.early_stop
    assert abs(m1.flag1 - m2.flag1) < 2e-3 and abs(m1.flag2 - m2.flag2) < 2e-3
    np.testing.assert_allclose(np.asarray(m1.params["ent_embeds"]),
                               np.asarray(m2.params["ent_embeds"]), atol=1e-6)


@pytest.mark.slow
def test_sparse_updates_match_dense():
    """sparse_updates=True (touched-row Adagrad) trains identically to
    the dense optax path for MTransE (positive + mapping epochs) and
    AlignE (template triple loss with negatives)."""
    kw_m = dict(init="unit", optimizer="Adagrad", eval_metric="inner",
                ent_l2_norm=True, rel_l2_norm=True, alpha=5, eval_norm=True)
    m1, _ = run_model("MTransE", "mapping", epochs=30, sparse_updates=True,
                      **kw_m)
    m2, _ = run_model("MTransE", "mapping", epochs=30, **kw_m)
    np.testing.assert_allclose(np.asarray(m1.params["ent_embeds"]),
                               np.asarray(m2.params["ent_embeds"]),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(m1.params["mapping_mat"]),
                               np.asarray(m2.params["mapping_mat"]),
                               rtol=1e-4, atol=2e-5)

    kw_a = dict(init="normal", optimizer="Adagrad", eval_metric="inner",
                ent_l2_norm=True, rel_l2_norm=True, loss="limited",
                neg_sampling="truncated", truncated_epsilon=0.9,
                truncated_freq=10, pos_margin=0.01, neg_margin=2.0,
                neg_margin_balance=0.2, learning_rate=0.05, neg_triple_num=4,
                eval_norm=True)
    a1, _ = run_model("AlignE", "swapping", epochs=20, sparse_updates=True,
                      structured_neg=False, **kw_a)
    a2, _ = run_model("AlignE", "swapping", epochs=20, structured_neg=False,
                      **kw_a)
    np.testing.assert_allclose(np.asarray(a1.params["ent_embeds"]),
                               np.asarray(a2.params["ent_embeds"]),
                               rtol=1e-4, atol=2e-5)


def test_structured_negatives_match_legacy_path():
    """structured_neg (uncorrupted side rebuilt via jnp.repeat; scatter
    gets 2B+BK rows) trains identically to the legacy neg-triple path."""
    kw = dict(init="normal", optimizer="Adagrad", eval_metric="inner",
              ent_l2_norm=True, rel_l2_norm=True, loss="limited",
              neg_sampling="truncated", truncated_epsilon=0.9,
              truncated_freq=10, pos_margin=0.01, neg_margin=2.0,
              neg_margin_balance=0.2, learning_rate=0.05, neg_triple_num=4,
              eval_norm=True)
    a1, _ = run_model("AlignE", "swapping", epochs=6, **kw)
    a2, _ = run_model("AlignE", "swapping", epochs=6, structured_neg=False,
                      **kw)
    # identical math; only fp reassociation separates the paths (1 epoch
    # agrees to ~1e-7, then Adagrad-rsqrt chaos amplifies slowly)
    np.testing.assert_allclose(np.asarray(a1.params["ent_embeds"]),
                               np.asarray(a2.params["ent_embeds"]),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(a1.params["rel_embeds"]),
                               np.asarray(a2.params["rel_embeds"]),
                               atol=5e-5)
