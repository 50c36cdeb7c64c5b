"""GCN-Align + sparse graph ops."""

import jax.numpy as jnp
import numpy as np
import pytest

from openea_tpu.ops import graph as G


def test_spmm_matches_dense():
    rng = np.random.RandomState(0)
    n, m, d = 12, 9, 5
    dense = (rng.rand(n, m) < 0.3) * rng.randn(n, m)
    row, col = np.nonzero(dense)
    adj = G.build_sparse(row.astype(np.int32), col.astype(np.int32),
                         dense[row, col].astype(np.float32), n)
    x = rng.randn(m, d).astype(np.float32)
    out = np.asarray(G.spmm(adj, jnp.asarray(x)))
    assert np.allclose(out, dense.astype(np.float32) @ x, atol=1e-5)


def test_relation_functionality():
    # r0: heads {0,1}, 3 triples -> func 2/3; tails {5}, -> ifunc 1/3
    triples = [(0, 0, 5), (1, 0, 5), (0, 0, 5)]  # duplicate collapses? no: list
    func, ifunc = G.relation_functionality([(0, 0, 5), (1, 0, 5), (2, 0, 5)])
    assert func[0] == 1.0
    assert ifunc[0] == pytest.approx(1 / 3)


def test_weighted_adjacency_floor_and_merge():
    triples = [(0, 0, 1), (0, 1, 1)]
    row, col, val = G.weighted_adjacency(4, triples)
    m = {(int(r), int(c)): float(v) for r, c, v in zip(row, col, val)}
    # reference convention: entry (row=t, col=h) accumulates ifunc weights
    # both relations have func=ifunc=1 -> merged weight 2 on each direction
    assert m[(1, 0)] == pytest.approx(2.0)
    assert m[(0, 1)] == pytest.approx(2.0)


def test_sym_normalize_row_sums():
    # sym-normalized (A+I) of a 2-node single-edge graph: all entries 1/2
    row = np.array([0, 1], np.int32)
    col = np.array([1, 0], np.int32)
    val = np.ones(2, np.float32)
    r, c, v = G.sym_normalize_with_self_loops(row, col, val, 2)
    dense = np.zeros((2, 2))
    dense[r, c] = v
    assert np.allclose(dense, 0.5)


def test_gcn_align_e2e_learns():
    from tests.test_models_e2e import run_model, test_hits1
    from openea_tpu.data.synthetic import synthesize_kg_pair

    kgs = synthesize_kg_pair(num_entities=200, num_relations=8,
                             num_triples=2000, mode="mapping",
                             edge_keep_prob=1.0, noise_edge_frac=0.0,
                             train_frac=0.3, num_attributes=30, seed=7)
    model, _ = run_model(
        "GCN_Align", "mapping", epochs=200, kgs=kgs,
        learning_rate=2.0, gamma=3.0, beta=0.9, neg_triple_num=5,
        se_dim=32, ae_dim=32, dim=32, eval_metric="manhattan",
        eval_norm=False, test_method="sa", start_valid=1000, eval_freq=1000)
    hits1, mrr = test_hits1(model)
    assert hits1 > 30.0


def test_gcn_align_no_attributes_falls_back_to_se():
    from tests.test_models_e2e import run_model, test_hits1
    model, _ = run_model(
        "GCN_Align", "mapping", epochs=50,
        learning_rate=2.0, gamma=3.0, beta=0.9, neg_triple_num=5,
        se_dim=32, ae_dim=32, dim=32, eval_metric="manhattan",
        eval_norm=False, test_method="sa", start_valid=1000, eval_freq=1000)
    assert model.vec_ae is None
    hits1, mrr = test_hits1(model)
    assert hits1 > 10.0


@pytest.mark.slow
def test_gcn_align_mesh_training_matches_single_device():
    """GCN-Align trains on the 8-device mesh via boundary-exchange SpMM
    (use_mesh=True) with the same math as single-device — the BASELINE
    north star consumed by a real registered model."""
    import jax
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from tests.test_models_e2e import run_model, test_hits1
    from openea_tpu.data.synthetic import synthesize_kg_pair

    kgs = synthesize_kg_pair(num_entities=200, num_relations=8,
                             num_triples=2000, mode="mapping",
                             edge_keep_prob=1.0, noise_edge_frac=0.0,
                             train_frac=0.3, num_attributes=30, seed=7)
    kw = dict(learning_rate=2.0, gamma=3.0, beta=0.9, neg_triple_num=5,
              se_dim=32, ae_dim=32, dim=32, eval_metric="manhattan",
              eval_norm=False, test_method="sa", start_valid=1000,
              eval_freq=1000)
    m1, _ = run_model("GCN_Align", "mapping", epochs=15, kgs=kgs, **kw)
    m2, _ = run_model("GCN_Align", "mapping", epochs=15, kgs=kgs,
                      use_mesh=True, **kw)
    assert m2.mesh is not None and m2.mesh.size == 8
    spec = m2.params["w_se"].sharding.spec
    assert spec and spec[0] == "x", "w_se not row-sharded over the mesh"
    np.testing.assert_allclose(m2.vec_se, m1.vec_se, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(m2.vec_ae, m1.vec_ae, atol=2e-3, rtol=1e-3)
    h1, mrr1 = test_hits1(m1)
    h2, mrr2 = test_hits1(m2)
    assert abs(h1 - h2) <= 1.0
    assert abs(mrr1 - mrr2) < 0.01
