"""RDGCN: dual-graph helpers + name vectors + e2e."""

import numpy as np
import pytest

from openea_tpu.data.synthetic import synthesize_kg_pair
from tests.test_models_e2e import run_model, test_hits1


def test_dual_jaccard_matches_set_loop():
    from openea_tpu.models.rdgcn import dual_jaccard_adjacency, relation_structures
    triples = [(0, 0, 1), (0, 1, 1), (2, 0, 3), (2, 1, 4), (4, 2, 0)]
    head_inc, tail_inc, _ = relation_structures(triples, 5, 3)
    A = dual_jaccard_adjacency(head_inc, tail_inc)
    heads = [{0, 2}, {0, 2}, {4}]
    tails = [{1, 3}, {1, 4}, {0}]
    for i in range(3):
        for j in range(3):
            ah = len(heads[i] & heads[j]) / len(heads[i] | heads[j])
            at = len(tails[i] & tails[j]) / len(tails[i] | tails[j])
            assert np.isclose(A[i, j], ah + at, atol=1e-5)


def test_primal_adjacency_symmetric_with_self_loops():
    from openea_tpu.models.rdgcn import primal_adjacency
    row, col, val = primal_adjacency([(0, 0, 1), (1, 1, 2)], 3)
    dense = np.zeros((3, 3))
    dense[row, col] = val
    assert np.allclose(dense, dense.T, atol=1e-6)
    assert np.all(np.diag(dense) > 0)


def test_name_vectors_identical_names_align():
    from openea_tpu.data.name_vectors import name_vectors
    kgs = synthesize_kg_pair(num_entities=50, num_relations=4,
                             num_triples=300, mode="mapping", seed=3)
    vecs = name_vectors(kgs, None, dim=32)
    # aligned pairs share the URI tail (eN) -> identical hashed name vectors
    a, b = kgs.test_entities1[0], kgs.test_entities2[0]
    assert np.allclose(vecs[a], vecs[b])
    assert np.linalg.norm(vecs[a]) > 0


def test_rdgcn_e2e_learns():
    model, kgs = run_model(
        "RDGCN", "mapping", epochs=30,
        dim=32, learning_rate=0.005, alpha=0.1, beta=0.3, gamma=1.0,
        neg_triple_num=5, dropout=0.0, eval_metric="manhattan",
        eval_norm=False, start_valid=1000, eval_freq=1000)
    hits1, mrr = test_hits1(model)
    # name vectors make aligned entities near-identical from epoch 0
    assert hits1 > 60.0


def test_rdgcn_wo_attr_variant_runs():
    model, kgs = run_model(
        "RDGCN", "mapping", epochs=15,
        dim=24, learning_rate=0.005, alpha=0.1, beta=0.3, gamma=1.0,
        neg_triple_num=3, dropout=0.0, eval_metric="manhattan",
        eval_norm=False, use_attributes=False,
        start_valid=1000, eval_freq=1000)
    hits1, mrr = test_hits1(model)
    assert np.isfinite(mrr)


@pytest.mark.slow
def test_rdgcn_mesh_training_matches_single_device():
    """RDGCN trains on the 8-device mesh: boundary-exchange SpMM for the
    GCN layers, sharded edge-softmax for the primal attention, psum'd
    incidence sums for the dual features — same math as single-device."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    kgs = synthesize_kg_pair(num_entities=200, num_relations=8,
                             num_triples=2000, mode="mapping",
                             edge_keep_prob=1.0, noise_edge_frac=0.0,
                             train_frac=0.3, seed=7)
    kw = dict(dim=32, learning_rate=0.005, alpha=0.1, beta=0.3, gamma=1.0,
              neg_triple_num=5, dropout=0.0, eval_metric="manhattan",
              eval_norm=False, start_valid=1000, eval_freq=1000)
    # forward parity at init: the mesh ops (boundary SpMM, sharded edge
    # softmax, psum'd incidence sums) must match single-device exactly
    f1, _ = run_model("RDGCN", "mapping", epochs=0, kgs=kgs, **kw)
    f2, _ = run_model("RDGCN", "mapping", epochs=0, kgs=kgs,
                      use_mesh=True, **kw)
    assert f2.mesh is not None and f2.mesh.size == 8
    assert f2.params["x0"].sharding.spec[0] == "x", "x0 not row-sharded"
    np.testing.assert_allclose(np.asarray(f2._ent_embeds_for_eval()),
                               np.asarray(f1._ent_embeds_for_eval()),
                               atol=2e-4, rtol=1e-4)
    # trained agreement: Adam amplifies f32 reduction-order drift, so the
    # contract is metric-level equivalence, not bitwise embeddings
    m1, _ = run_model("RDGCN", "mapping", epochs=12, kgs=kgs, **kw)
    m2, _ = run_model("RDGCN", "mapping", epochs=12, kgs=kgs,
                      use_mesh=True, **kw)
    diff = np.abs(np.asarray(m2._ent_embeds_for_eval())
                  - np.asarray(m1._ent_embeds_for_eval()))
    assert float(diff.mean()) < 2e-3
    h1, mrr1 = test_hits1(m1)
    h2, mrr2 = test_hits1(m2)
    assert abs(h1 - h2) <= 2.0
    assert abs(mrr1 - mrr2) < 0.02


def test_cityblock_topk_matches_naive():
    import jax.numpy as jnp
    from openea_tpu.ops.neighbors import cityblock_topk
    rng = np.random.RandomState(0)
    anchors = rng.randn(37, 9).astype(np.float32)
    table = rng.randn(143, 9).astype(np.float32)
    idx = np.asarray(cityblock_topk(jnp.asarray(anchors), jnp.asarray(table),
                                    5, row_block=16))
    D = np.abs(anchors[:, None, :] - table[None, :, :]).sum(-1)
    ref = np.argsort(D, axis=1)[:, :5]
    # compare as sets per row (tie order may differ)
    for i in range(37):
        assert set(idx[i]) == set(ref[i]), i
