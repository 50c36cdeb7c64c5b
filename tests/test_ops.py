import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openea_tpu.ops import losses as L
from openea_tpu.ops.initializers import init_embeddings, l2_normalize
from openea_tpu.ops.ranking import rank_and_argmax, metrics_from_ranks
from openea_tpu.ops.sampling import corrupt_batch, proportional_batch_sizes
from openea_tpu.ops.similarity import sim, csls_sim, blocked_row_topk_means
from openea_tpu.ops.neighbors import top_k_neighbors


# ---------------------------------------------------------------- losses

def _rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape)


def test_margin_loss_fixture():
    # hand-computed: pos d = [1,0], neg d = [0,0] -> pos=1, neg=0
    h = jnp.array([[1.0, 0.0]]); r = jnp.array([[1.0, 0.0]]); t = jnp.array([[1.0, 0.0]])
    nh = jnp.array([[1.0, 0.0]]); nt = jnp.array([[2.0, 0.0]])
    loss = L.margin_loss(h, r, t, nh, r, nt, margin=0.5, loss_norm="L2")
    # pos score = 1, neg score = 0 -> relu(0.5 + 1 - 0) = 1.5
    assert np.isclose(float(loss), 1.5)


def test_limited_loss_fixture():
    h = jnp.array([[1.0, 0.0]]); r = jnp.array([[1.0, 0.0]]); t = jnp.array([[1.0, 0.0]])
    nh = jnp.array([[1.0, 0.0]]); nt = jnp.array([[2.0, 0.0]])
    # pos=1, neg=0: relu(1-0.2) + 0.5*relu(2.0-0) = 0.8 + 1.0
    loss = L.limited_loss(h, r, t, nh, r, nt, 0.2, 2.0, "L2", balance=0.5)
    assert np.isclose(float(loss), 1.8)


def test_logistic_loss_matches_formula():
    phs, prs, pts = _rand(0, 5, 4), _rand(1, 5, 4), _rand(2, 5, 4)
    nhs, nrs, nts = _rand(3, 5, 4), _rand(4, 5, 4), _rand(5, 5, 4)
    got = float(L.logistic_loss(phs, prs, pts, nhs, nrs, nts, "L1"))
    pos = np.abs(np.asarray(phs + prs - pts)).sum(-1)
    neg = np.abs(np.asarray(nhs + nrs - nts)).sum(-1)
    want = np.log1p(np.exp(pos)).sum() + np.log1p(np.exp(-neg)).sum()
    assert np.isclose(got, want, rtol=1e-5)


def test_positive_loss_mask():
    phs, prs, pts = _rand(0, 4, 3), _rand(1, 4, 3), _rand(2, 4, 3)
    w = jnp.array([1.0, 1.0, 0.0, 0.0])
    got = float(L.positive_loss(phs, prs, pts, "L2", pos_w=w))
    want = float(L.positive_loss(phs[:2], prs[:2], pts[:2], "L2"))
    assert np.isclose(got, want, rtol=1e-6)


def test_mapping_loss_orthogonal_identity():
    e = _rand(0, 6, 4)
    eye = jnp.eye(4)
    # identical embeddings + identity mapping -> zero loss
    assert np.isclose(float(L.mapping_loss(e, e, eye)), 0.0, atol=1e-3)


# ------------------------------------------------------------ initializers

@pytest.mark.parametrize("method", ["xavier", "normal", "uniform", "unit"])
def test_init_shapes_and_norm(method):
    emb = init_embeddings(jax.random.PRNGKey(0), (10, 8), method, True)
    assert emb.shape == (10, 8)
    norms = np.linalg.norm(np.asarray(emb), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


# ------------------------------------------------------------- similarity

def test_csls_matches_reference_formula():
    rng = np.random.RandomState(0)
    s = rng.randn(12, 9).astype(np.float32)
    k = 3
    got = np.asarray(csls_sim(jnp.asarray(s), k))
    r1 = np.sort(s, axis=1)[:, ::-1][:, :k].mean(axis=1)
    r2 = np.sort(s.T, axis=1)[:, ::-1][:, :k].mean(axis=1)
    want = 2 * s - r1[:, None] - r2[None, :]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_blocked_topk_means_equals_full():
    rng = np.random.RandomState(1)
    e1 = rng.randn(50, 8).astype(np.float32)
    e2 = rng.randn(33, 8).astype(np.float32)
    got = np.asarray(blocked_row_topk_means(jnp.asarray(e1), jnp.asarray(e2),
                                            k=5, block=16))
    s = e1 @ e2.T
    want = np.sort(s, axis=1)[:, ::-1][:, :5].mean(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_sim_euclidean_matches_scipy():
    from scipy.spatial.distance import cdist
    rng = np.random.RandomState(2)
    e1 = rng.randn(10, 6).astype(np.float32)
    e2 = rng.randn(7, 6).astype(np.float32)
    got = np.asarray(sim(e1, e2, metric="euclidean"))
    want = 1 - cdist(e1, e2, metric="euclidean")
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------- ranking

def test_rank_matches_argsort():
    rng = np.random.RandomState(3)
    e1 = rng.randn(40, 8).astype(np.float32)
    e2 = rng.randn(40, 8).astype(np.float32)
    gold = jnp.arange(40, dtype=jnp.int32)
    ranks, best = rank_and_argmax(jnp.asarray(e1), jnp.asarray(e2), gold,
                                  block=16)
    s = e1 @ e2.T
    for i in range(40):
        order = np.argsort(-s[i], kind="stable")
        want_rank = int(np.where(order == i)[0][0])
        assert int(ranks[i]) == want_rank
        assert int(best[i]) == int(order[0])


def test_rank_with_csls_matches_full_csls():
    rng = np.random.RandomState(4)
    e1 = rng.randn(30, 8).astype(np.float32)
    e2 = rng.randn(25, 8).astype(np.float32)
    gold = jnp.asarray(rng.randint(0, 25, size=30), jnp.int32)
    ranks, _ = rank_and_argmax(jnp.asarray(e1), jnp.asarray(e2), gold,
                               csls_k=4, block=8)
    s = np.asarray(csls_sim(jnp.asarray(e1 @ e2.T), 4))
    for i in range(30):
        order = np.argsort(-s[i], kind="stable")
        want = int(np.where(order == int(gold[i]))[0][0])
        assert int(ranks[i]) == want


def test_metrics_from_ranks():
    hits, mr, mrr = metrics_from_ranks(np.array([0, 1, 4, 9]), [1, 5, 10])
    assert hits == [25.0, 75.0, 100.0]
    assert np.isclose(mr, (1 + 2 + 5 + 10) / 4)
    assert np.isclose(mrr, (1 + 0.5 + 0.2 + 0.1) / 4)


# --------------------------------------------------------------- sampling

def test_proportional_batch_sizes():
    bs1, bs2 = proportional_batch_sizes(100, 300, 40)
    assert bs1 == 10 and bs2 == 30


def test_corrupt_batch_shapes_and_semantics():
    pos = jnp.asarray(np.array([[0, 0, 1], [2, 1, 3]], np.int32))
    ents = jnp.arange(10, dtype=jnp.int32)
    neg = corrupt_batch(jax.random.PRNGKey(0), pos, 4, ents)
    assert neg.shape == (8, 3)
    neg = np.asarray(neg)
    pos_np = np.repeat(np.asarray(pos), 4, axis=0)
    # relation never corrupted; exactly one of head/tail changed or equal
    np.testing.assert_array_equal(neg[:, 1], pos_np[:, 1])
    same_h = neg[:, 0] == pos_np[:, 0]
    same_t = neg[:, 2] == pos_np[:, 2]
    assert np.all(same_h | same_t)


def test_top_k_neighbors_self_first():
    rng = np.random.RandomState(5)
    e = rng.randn(20, 6).astype(np.float32)
    e = e / np.linalg.norm(e, axis=1, keepdims=True)
    ids = jnp.arange(100, 120, dtype=jnp.int32)
    nb = np.asarray(top_k_neighbors(jnp.asarray(e), ids, k=3, block=8))
    assert nb.shape == (20, 3)
    # self-similarity is maximal for unit vectors
    np.testing.assert_array_equal(nb[:, 0], np.arange(100, 120))


def test_sparse_adagrad_apply_matches_dense_optax():
    """Touched-row Adagrad == dense optax.adagrad step (zero-grad rows
    are no-ops), including duplicate-index accumulation."""
    import jax
    import jax.numpy as jnp
    import optax
    from openea_tpu.ops.optim import (get_optimizer, sparse_adagrad_apply,
                                      rss_state, replace_rss)
    rng = np.random.RandomState(0)
    n, d, m = 50, 8, 24
    table = jnp.asarray(rng.randn(n, d).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, m).astype(np.int32))  # has dupes
    row_g = jnp.asarray(rng.randn(m, d).astype(np.float32))
    params = {"t": table}
    opt = get_optimizer("Adagrad", 0.3)
    state = opt.init(params)
    for _ in range(3):   # multiple steps: accumulator state must track
        dense_g = jnp.zeros((n, d)).at[idx].add(row_g)
        upd, state2 = opt.update({"t": dense_g}, state, params)
        dense_params = optax.apply_updates(params, upd)

        sos = rss_state(state)
        t2, acc2 = sparse_adagrad_apply(params["t"], sos["t"], idx, row_g, 0.3)
        np.testing.assert_allclose(np.asarray(t2),
                                   np.asarray(dense_params["t"]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(acc2), np.asarray(rss_state(state2)["t"]),
            rtol=1e-5, atol=1e-6)
        params, state = dense_params, state2
        row_g = row_g * 0.7 + 0.1


def test_rank_and_argmax_both_matches_separate_calls():
    import jax.numpy as jnp
    from openea_tpu.ops.ranking import rank_and_argmax, rank_and_argmax_both
    rng = np.random.RandomState(1)
    e1 = rng.randn(137, 24).astype(np.float32)
    e2 = rng.randn(150, 24).astype(np.float32)
    e2[:137] = e1 + 0.2 * rng.randn(137, 24)
    gold = np.arange(137, dtype=np.int32)
    for metric, norm in [("inner", True), ("euclidean", False)]:
        r0, b0 = rank_and_argmax(jnp.asarray(e1), jnp.asarray(e2),
                                 jnp.asarray(gold), metric=metric,
                                 normalize=norm, csls_k=0, block=64)
        rc, bc = rank_and_argmax(jnp.asarray(e1), jnp.asarray(e2),
                                 jnp.asarray(gold), metric=metric,
                                 normalize=norm, csls_k=5, block=64)
        r, b, r2, b2 = rank_and_argmax_both(
            jnp.asarray(e1), jnp.asarray(e2), jnp.asarray(gold),
            metric=metric, normalize=norm, csls_k=5, block=64)
        assert np.array_equal(np.asarray(r0), np.asarray(r))
        assert np.array_equal(np.asarray(b0), np.asarray(b))
        assert np.array_equal(np.asarray(rc), np.asarray(r2))
        assert np.array_equal(np.asarray(bc), np.asarray(b2))


def test_table_lookup_vjp_matches_gather():
    """ops/lookup.table_lookup: gather forward, one-hot-matmul backward
    — values and grads match the plain table[idx] formulation (f32
    backward exactly; default bf16 backward to bf16 tolerance)."""
    from openea_tpu.ops.lookup import table_lookup
    key = jax.random.PRNGKey(3)
    table = jax.random.normal(key, (13, 8))
    idx = jax.random.randint(key, (50,), 0, 13)
    coef = jax.random.normal(jax.random.PRNGKey(4), (50, 8))

    def f_ref(t):
        return jnp.sum(t[idx] * coef)

    def f_exact(t):
        return jnp.sum(table_lookup(t, idx, jnp.float32) * coef)

    def f_bf16(t):
        return jnp.sum(table_lookup(t, idx) * coef)

    np.testing.assert_allclose(f_exact(table), f_ref(table), rtol=1e-6)
    g_ref = jax.grad(f_ref)(table)
    g_exact = jax.grad(f_exact)(table)
    np.testing.assert_allclose(np.asarray(g_exact), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)
    g_bf16 = jax.grad(f_bf16)(table)
    np.testing.assert_allclose(np.asarray(g_bf16), np.asarray(g_ref),
                               rtol=2e-2, atol=2e-2)
