"""RSN4EA: joint KB, path sampler, LSTM training."""

import numpy as np
import pytest

from openea_tpu.data.synthetic import synthesize_kg_pair
from tests.test_models_e2e import run_model, test_hits1


def small_kgs():
    return synthesize_kg_pair(num_entities=120, num_relations=6,
                              num_triples=800, mode="mapping",
                              edge_keep_prob=1.0, noise_edge_frac=0.0,
                              train_frac=0.3, seed=11)


def test_build_joint_kb_adds_reverse_and_substituted():
    from openea_tpu.models.rsn4ea import build_joint_kb
    kgs = small_kgs()
    kb, rel_vocab = build_joint_kb(kgs)
    assert rel_vocab == 2 * kgs.max_relations_id
    vals = kb.values
    base = len(kgs.kg1.relation_triples_list) + len(kgs.kg2.relation_triples_list)
    # reverse edges double the KB before substitution combos
    assert len(vals) >= 2 * base
    assert vals[:, 1].max() >= kgs.max_relations_id  # reverse relation ids


def test_sample_paths_shape_and_alternation():
    from openea_tpu.models.rsn4ea import build_joint_kb, sample_paths
    kgs = small_kgs()
    kb, _ = build_joint_kb(kgs)
    paths = sample_paths(kb, kgs, alpha=0.7, beta=0.7, max_length=7,
                         ent_num=kgs.max_entities_id, repeat_times=1, seed=0)
    assert paths.shape[1] == 7
    # entity positions hold entity ids, relation positions relation ids
    ents = set(int(e) for e in np.asarray(
        list(kgs.kg1.entities_set | kgs.kg2.entities_set)))
    for row in paths[:20]:
        assert int(row[0]) in ents
        assert int(row[2]) in ents


def test_rsn4ea_e2e_learns():
    model, kgs = run_model(
        "RSN4EA", "mapping", epochs=10, kgs=small_kgs(),
        dim=32, hidden_size=32, num_layers=2, max_length=7,
        num_samples=64, keep_prob=1.0, learning_rate=0.003,
        optimizer="Adagrad", alpha=0.7, beta=0.7, batch_size=256,
        eval_metric="inner", eval_norm=False, ent_l2_norm=True,
        rel_l2_norm=True, start_valid=1000, eval_freq=1000)
    hits1, mrr = test_hits1(model)
    assert np.isfinite(mrr)
    assert hits1 > 5.0


@pytest.mark.slow
def test_rsn4ea_mesh_training_matches_single_device():
    """RSN4EA trains data-parallel on the 8-device mesh: row-sharded
    ent/rel tables, LSTM batches sharded over 'data' (use_mesh=True) —
    same batch stream as single-device (identical PRNG draws)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    kw = dict(dim=32, hidden_size=32, num_layers=2, max_length=7,
              num_samples=64, keep_prob=1.0, learning_rate=0.003,
              optimizer="Adagrad", alpha=0.7, beta=0.7, batch_size=256,
              eval_metric="inner", eval_norm=False, ent_l2_norm=True,
              rel_l2_norm=True, start_valid=1000, eval_freq=1000)
    kgs = small_kgs()
    m1, _ = run_model("RSN4EA", "mapping", epochs=3, kgs=kgs, **kw)
    m2, _ = run_model("RSN4EA", "mapping", epochs=3, kgs=kgs,
                      use_mesh=True, **kw)
    assert m2.mesh is not None and m2.mesh.size == 8
    assert m2.params["ent_embeds"].sharding.spec[0] == "model"
    e1 = np.asarray(m1.params["ent_embeds"])
    e2 = np.asarray(m2.params["ent_embeds"])[:e1.shape[0]]
    assert np.isfinite(e2).all()
    # identical batch stream; divergence is f32 reduction order through
    # Adam — metric-level agreement is the contract
    assert float(np.abs(e2 - e1).mean()) < 2e-3
    h1, mrr1 = test_hits1(m1)
    h2, mrr2 = test_hits1(m2)
    assert abs(h1 - h2) <= 3.0
    assert abs(mrr1 - mrr2) < 0.03
