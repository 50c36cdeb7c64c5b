"""BootEA: bootstrapping machinery unit tests + tiny e2e run."""

import numpy as np
import pytest

from openea_tpu.ops import bootstrapping as bs


def test_find_potential_alignment_threshold_and_topk():
    vals = np.array([[0.9, 0.8], [0.95, 0.2], [0.3, 0.1]], np.float32)
    idx = np.array([[0, 1], [1, 0], [2, 0]], np.int32)
    pairs = bs.find_potential_alignment_mwgm(vals, idx, sim_th=0.5, k=2)
    # greedy mwgm: (1,1,0.95) first, then (0,0,0.9); (0,1,0.8) conflicts
    assert pairs == {(1, 1), (0, 0)}


def test_find_potential_alignment_none_below_threshold():
    vals = np.array([[0.1, 0.05]], np.float32)
    idx = np.array([[0, 1]], np.int32)
    assert bs.find_potential_alignment_mwgm(vals, idx, 0.5, 2) is None


def test_update_labeled_alignment_x_keeps_higher_sim():
    pre = {(0, 5)}
    curr = {(0, 6), (1, 1)}
    sim = {(0, 5): 0.9, (0, 6): 0.8, (1, 1): 0.7}
    out = bs.update_labeled_alignment_x(pre, curr, sim)
    assert out == {(0, 5), (1, 1)}
    # new label wins on >= similarity
    sim2 = {(0, 5): 0.8, (0, 6): 0.8, (1, 1): 0.7}
    out2 = bs.update_labeled_alignment_x(pre, curr, sim2)
    assert out2 == {(0, 6), (1, 1)}


def test_update_labeled_alignment_y_resolves_conflicts():
    labeled = {(0, 3), (1, 3), (2, 4)}
    sim = {(0, 3): 0.5, (1, 3): 0.9, (2, 4): 0.4}
    out = bs.update_labeled_alignment_y(labeled, sim)
    assert out == {(1, 3), (2, 4)}


def test_pair_sims_matches_numpy():
    rng = np.random.RandomState(0)
    e1 = rng.randn(10, 4).astype(np.float32)
    e2 = rng.randn(12, 4).astype(np.float32)
    pairs = [(0, 1), (3, 11), (9, 0)]
    out = bs.pair_sims(e1, e2, pairs)
    for i, j in pairs:
        assert np.isclose(out[(i, j)], float(e1[i] @ e2[j]), atol=1e-5)


def test_ref_topk_matches_full_matrix():
    rng = np.random.RandomState(1)
    e1 = rng.randn(33, 8).astype(np.float32)
    e2 = rng.randn(17, 8).astype(np.float32)
    vals, idx = bs.ref_topk(e1, e2, 5, block=8)
    full = e1 @ e2.T
    for i in range(33):
        ref = np.sort(full[i])[::-1][:5]
        assert np.allclose(np.asarray(vals[i]), ref, atol=1e-5)


def test_generate_supervised_triples_swaps_both_sides():
    rt1 = {10: {(1, 11)}}
    hr1 = {11: {(10, 1)}}
    rt2 = {20: {(2, 21)}}
    hr2 = {21: {(20, 2)}}
    n1, n2 = bs.generate_supervised_triples(rt1, hr1, rt2, hr2, [10], [20])
    assert (20, 1, 11) in n1          # ent2 substituted as head in KG1 triple
    assert (10, 2, 21) in n2


def test_bootstrapping_perfect_embeddings_aligns_diagonal():
    rng = np.random.RandomState(2)
    e = rng.randn(20, 16).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    labeled, rows, cols = bs.bootstrapping(e, e, set(), sim_th=0.9, k=3)
    assert rows is not None
    assert set(zip(rows, cols)) == {(i, i) for i in range(20)}


@pytest.mark.slow
def test_bootea_mesh_bootstrapping_matches_single_device():
    """BootEA runs on the mesh end-to-end: sharded triple training
    (base-family use_mesh) PLUS row-sharded bootstrapping similarity/
    top-k and truncated-neighbor regeneration.  Contract: the mined
    pseudo-label set agrees with the single-device run."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from tests.test_models_e2e import make_kgs, run_model, test_hits1
    kw = dict(learning_rate=0.05, init="normal", loss="limited",
              neg_sampling="truncated", optimizer="Adagrad",
              eval_metric="inner", loss_norm="L2", ent_l2_norm=True,
              rel_l2_norm=True, pos_margin=0.01, neg_margin=2.0,
              neg_margin_balance=0.2, neg_triple_num=4,
              truncated_epsilon=0.9, truncated_freq=10, sub_epoch=10,
              sim_th=0.5, k=5, start_valid=1000, eval_freq=1000)
    m1, kgs = run_model("BootEA", "swapping", epochs=20, **kw)
    m2, _ = run_model("BootEA", "swapping", epochs=20, kgs=kgs,
                      use_mesh=True, **kw)
    assert m2.mesh is not None
    assert m2.params["ent_embeds"].sharding.spec[0] == "model"
    assert len(m2.labeled_align) > 0
    inter = len(m1.labeled_align & m2.labeled_align)
    union = len(m1.labeled_align | m2.labeled_align)
    assert inter / union > 0.95, (
        f"pseudo-label sets diverged: {inter}/{union}")
    h1, _ = test_hits1(m1)
    h2, _ = test_hits1(m2)
    assert abs(h1 - h2) <= 2.0


def test_bootea_e2e_learns():
    from tests.test_models_e2e import make_kgs, run_model, test_hits1
    model, kgs = run_model(
        "BootEA", "swapping", epochs=40, learning_rate=0.05,
        init="normal", loss="limited", neg_sampling="truncated",
        optimizer="Adagrad", eval_metric="inner", loss_norm="L2",
        ent_l2_norm=True, rel_l2_norm=True, pos_margin=0.01,
        neg_margin=2.0, neg_margin_balance=0.2, neg_triple_num=4,
        truncated_epsilon=0.9, truncated_freq=10, sub_epoch=10,
        sim_th=0.5, k=5, start_valid=1000, eval_freq=1000)
    hits1, mrr = test_hits1(model)
    assert hits1 > 30.0
    assert len(model.labeled_align) > 0
