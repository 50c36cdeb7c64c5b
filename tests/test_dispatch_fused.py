"""Every fused-kernel dispatch branch is CPU-reachable and correct.

Round-3 shipped a dead dispatch branch (commit d51daea: a fused path
sitting after an unconditional return silently fell back for the whole
round) that the suite could not catch because all branches were gated on
``platform == "tpu"``.  ops/dispatch.force_fused() now routes the gates
through Pallas interpret mode on any backend; these tests enumerate the
branches, assert each one actually INVOKES its kernel (recorder
monkeypatch + jit-cache clear), and assert agreement with the XLA path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openea_tpu.ops import dispatch


def _rand(n1=96, n2=130, d=20, seed=0):
    rng = np.random.RandomState(seed)
    e1 = rng.randn(n1, d).astype(np.float32)
    e2 = rng.randn(n2, d).astype(np.float32)
    gold = rng.permutation(n2)[:n1].astype(np.int32)
    return jnp.asarray(e1), jnp.asarray(e2), jnp.asarray(gold)


def _recorder(monkeypatch, names):
    """Wrap pallas_kernels entry points with call recorders."""
    from openea_tpu.ops import pallas_kernels as pk
    calls = []
    for name in names:
        orig = getattr(pk, name)

        def wrap(*a, __orig=orig, __name=name, **k):
            calls.append(__name)
            return __orig(*a, **k)

        monkeypatch.setattr(pk, name, wrap)
    return calls


def _clear_rank_caches():
    from openea_tpu.ops import ranking
    ranking._rank_and_argmax.clear_cache()
    ranking._rank_and_argmax_both.clear_cache()


RANK_BRANCHES = [
    # (metric, csls_k, expected kernel)
    ("inner", 0, "inner_rank_both"),
    ("euclidean", 0, "inner_rank_both"),
    ("inner", 5, "inner_rank_both"),
    ("manhattan", 0, "manhattan_rank"),
    ("manhattan", 5, "manhattan_rank_both_cached"),
]


@pytest.mark.parametrize("metric,csls_k,kernel", RANK_BRANCHES)
def test_rank_and_argmax_fused_branch(monkeypatch, metric, csls_k, kernel):
    from openea_tpu.ops.ranking import rank_and_argmax
    e1, e2, gold = _rand(seed=hash((metric, csls_k)) % 1000)
    rk0, best0 = rank_and_argmax(e1, e2, gold, metric=metric,
                                 csls_k=csls_k)
    calls = _recorder(monkeypatch, [kernel])
    _clear_rank_caches()
    with dispatch.force_fused():
        rk1, best1 = rank_and_argmax(e1, e2, gold, metric=metric,
                                     csls_k=csls_k)
    assert calls, "fused branch never reached kernel %s" % kernel
    np.testing.assert_array_equal(np.asarray(rk1), np.asarray(rk0))
    np.testing.assert_array_equal(np.asarray(best1), np.asarray(best0))


@pytest.mark.parametrize("metric,kernel", [
    ("inner", "inner_rank_both"),
    ("euclidean", "inner_rank_both"),
    ("manhattan", "manhattan_rank_both_cached"),
])
def test_rank_and_argmax_both_fused_branch(monkeypatch, metric, kernel):
    from openea_tpu.ops.ranking import rank_and_argmax_both
    e1, e2, gold = _rand(seed=hash(metric) % 1000)
    out0 = rank_and_argmax_both(e1, e2, gold, metric=metric, csls_k=5)
    calls = _recorder(monkeypatch, [kernel])
    _clear_rank_caches()
    with dispatch.force_fused():
        out1 = rank_and_argmax_both(e1, e2, gold, metric=metric, csls_k=5)
    assert calls, "fused branch never reached kernel %s" % kernel
    for a, b in zip(out1, out0):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_spmm_fn_fused_dispatch_matches_xla():
    from openea_tpu.ops.graph import build_sparse, spmm, spmm_fn
    rng = np.random.RandomState(3)
    n, nnz, d = 60, 400, 16
    adj = build_sparse(rng.randint(0, n, nnz), rng.randint(0, n, nnz),
                       rng.rand(nnz).astype(np.float32), n)
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    y0 = spmm(adj, x)
    with dispatch.force_fused():
        f = spmm_fn(adj, min_nnz=0)       # fused even at tiny nnz
    # closure built under force_fused stays interpret-mode afterwards
    np.testing.assert_allclose(np.asarray(f(x)), np.asarray(y0),
                               atol=1e-5, rtol=1e-5)
    g0 = jax.grad(lambda v: jnp.sum(jnp.tanh(spmm(adj, v))))(x)
    g1 = jax.grad(lambda v: jnp.sum(jnp.tanh(f(v))))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               atol=1e-5, rtol=1e-5)


def test_spmm_fn_default_stays_xla_on_cpu():
    from openea_tpu.ops.graph import build_sparse, spmm_fn
    rng = np.random.RandomState(4)
    adj = build_sparse(rng.randint(0, 50, 200), rng.randint(0, 50, 200),
                       rng.rand(200).astype(np.float32), 50)
    f = spmm_fn(adj)
    # the CPU default is the segment-sum lambda, not a Pallas closure
    assert f.__name__ == "<lambda>"


def test_alinet_init_wires_att_metas_under_force_fused():
    """Model-level dispatch: AliNet.init() builds the fused-attention
    metas under force_fused (interpret), and its forward matches the
    XLA segment-softmax path."""
    from openea_tpu.config import Args
    from openea_tpu.registry import get_model
    from tests.test_models_e2e import make_kgs

    kw = dict(embedding_module="AliNet", alignment_module="mapping",
              init="xavier", layer_dims=[16, 16, 16], learning_rate=0.01,
              optimizer="Adam", neg_margin=1.5, neg_margin_balance=0.1,
              neg_triple_num=2, truncated_epsilon=0.98, truncated_freq=10,
              batch_size=60, min_rel_win=5, rel_param=0.0, sim_th=0.0,
              start_augment=100, k=5, csls=0, eval_metric="inner", seed=3,
              max_epoch=1, start_valid=100, eval_freq=100, top_k=[1])
    kgs = make_kgs("mapping", seed=13)

    m0 = get_model("AliNet")()
    m0.set_args(Args(dict(kw)))
    m0.set_kgs(kgs)
    m0.init()
    assert m0._att_metas is None            # CPU default -> XLA path

    m1 = get_model("AliNet")()
    m1.set_args(Args(dict(kw)))
    m1.set_kgs(kgs)
    with dispatch.force_fused():
        m1.init()
    assert m1._att_metas is not None and m1._att_interpret
    out0 = m0._forward(m0.params, *m0._graphs())
    out1 = m1._forward(m0.params, *m1._graphs())
    for a, b in zip(out0, out1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("metric", ["inner", "euclidean", "manhattan"])
def test_blocked_row_topk_means_fused_branch(monkeypatch, metric):
    from openea_tpu.ops.similarity import blocked_row_topk_means
    e1, e2, _ = _rand(seed=7)
    want = blocked_row_topk_means(e1, e2, 5, 64, metric, False)
    calls = _recorder(monkeypatch, ["topk_means"])
    blocked_row_topk_means.clear_cache()
    with dispatch.force_fused():
        got = blocked_row_topk_means(e1, e2, 5, 64, metric, False,
                                     fused=True, interpret=True)
    assert calls, "fused branch never reached topk_means"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_manhattan_cached_path_matches_two_pass(monkeypatch):
    """Past the HBM budget the manhattan+CSLS branch falls back to the
    two-pass kernels with identical ranks."""
    from openea_tpu.ops import ranking
    e1, e2, gold = _rand(seed=21)
    _clear_rank_caches()
    with dispatch.force_fused():
        cached = ranking.rank_and_argmax_both(e1, e2, gold,
                                              metric="manhattan", csls_k=5)
    monkeypatch.setattr(ranking, "_MANHATTAN_CACHE_BYTES", 0)
    _clear_rank_caches()
    with dispatch.force_fused():
        twopass = ranking.rank_and_argmax_both(e1, e2, gold,
                                               metric="manhattan", csls_k=5)
    for a, b in zip(cached, twopass):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
