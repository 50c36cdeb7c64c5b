"""Pallas sorted-segment CSR SpMM (ops/spmm_pallas.py) vs segment-sum.

Runs the kernel in interpret mode (CPU image); the on-chip path is
exercised by bench/GNN runs on TPU.  Reference op being replaced:
tf.sparse_tensor_dense_matmul (gcn_align.py:83, alinet.py:581,
rdgcn.py:202-215).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openea_tpu.ops.graph import build_sparse, spmm, spmm_fn
from openea_tpu.ops.spmm_pallas import (EC, TM, build_chunk_meta,
                                        build_spmm_plan, dyn_csr_spmm,
                                        make_csr_spmm, make_dynamic_csr_spmm,
                                        metas_from_coo, plans_from_coo)


def _random_coo(n, nnz, seed, empty_stride=0):
    rng = np.random.RandomState(seed)
    row = rng.randint(0, n, nnz).astype(np.int32)
    col = rng.randint(0, n, nnz).astype(np.int32)
    val = rng.randn(nnz).astype(np.float32)
    if empty_stride:
        keep = (row % empty_stride) != 1          # leave rows empty
        row, col, val = row[keep], col[keep], val[keep]
    return row, col, val


def _dense_ref(row, col, val, n, x):
    ref = np.zeros((n, x.shape[1]), np.float32)
    np.add.at(ref, row, val[:, None] * x[col])
    return ref


@pytest.mark.parametrize("n,nnz,d", [(700, 5000, 96), (300, 12000, 128),
                                     (129, 50, 40)])
def test_forward_matches_segment_sum(n, nnz, d):
    row, col, val = _random_coo(n, nnz, seed=n, empty_stride=7)
    x = np.random.RandomState(1).randn(n, d).astype(np.float32)
    plan, plan_t = plans_from_coo(row, col, val, n)
    f = make_csr_spmm(plan, plan_t, interpret=True)
    out = np.asarray(f(jnp.asarray(x)))
    ref = _dense_ref(row, col, val, n, x)
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(out - ref).max() / scale < 1e-5


def test_backward_matches_autodiff_of_segment_sum():
    n, nnz, d = 520, 4000, 64
    row, col, val = _random_coo(n, nnz, seed=3)
    x = jnp.asarray(np.random.RandomState(2).randn(n, d).astype(np.float32))
    plan, plan_t = plans_from_coo(row, col, val, n)
    f = make_csr_spmm(plan, plan_t, interpret=True)
    adj = build_sparse(row, col, val, n)
    g = jax.grad(lambda xx: jnp.sum(jnp.tanh(f(xx))))(x)
    gref = jax.grad(lambda xx: jnp.sum(jnp.tanh(spmm(adj, xx))))(x)
    scale = float(jnp.abs(gref).max()) + 1e-9
    assert float(jnp.abs(g - gref).max()) / scale < 1e-5


def test_plan_structure_invariants():
    n, nnz = 1000, 20000
    row, col, val = _random_coo(n, nnz, seed=5)
    plan = build_spmm_plan(row, col, val, n)
    nc = plan.window.shape[0]
    assert plan.col.shape == (nc * EC,)
    assert plan.val.shape == plan.rowloc.shape == (nc, 8, EC // 8)
    # windows sorted, every window present exactly once at a `first` chunk
    assert np.all(np.diff(plan.window) >= 0)
    firsts = plan.window[plan.first.astype(bool)]
    assert np.array_equal(firsts, np.arange(plan.n_windows))
    # rowloc stays inside its window
    assert plan.rowloc.min() >= 0 and plan.rowloc.max() < TM
    # padding carries zero weight
    used = int(plan.first.sum()) * 0  # noqa: F841 (doc only)
    assert float(np.abs(plan.val).sum()) == pytest.approx(
        float(np.abs(val).sum()), rel=1e-6)


def test_empty_adjacency_returns_zeros():
    p0, pt0 = plans_from_coo(np.zeros(0, np.int32), np.zeros(0, np.int32),
                             np.zeros(0, np.float32), 40)
    f0 = make_csr_spmm(p0, pt0, interpret=True)
    out = f0(jnp.ones((40, 16), jnp.float32))
    assert float(jnp.abs(out).max()) == 0.0


def test_spmm_fn_dispatches_to_segment_sum_on_cpu():
    n, nnz, d = 200, 3000, 32
    row, col, val = _random_coo(n, nnz, seed=9)
    adj = build_sparse(row, col, val, n)
    f = spmm_fn(adj)          # cpu backend -> fallback
    x = jnp.asarray(np.random.RandomState(3).randn(n, d).astype(np.float32))
    assert np.allclose(np.asarray(f(x)), np.asarray(spmm(adj, x)), atol=1e-5)


def test_spmm_fn_forced_pallas_matches():
    n, nnz, d = 400, 6000, 48
    row, col, val = _random_coo(n, nnz, seed=11)
    adj = build_sparse(row, col, val, n)
    x = np.random.RandomState(4).randn(n, d).astype(np.float32)
    plan, plan_t = plans_from_coo(row, col, val, n)
    f = make_csr_spmm(plan, plan_t, interpret=True)
    ref = _dense_ref(np.asarray(adj.row), np.asarray(adj.col),
                     np.asarray(adj.val), n, x)
    assert np.abs(np.asarray(f(jnp.asarray(x))) - ref).max() < 1e-4


# --------------------------------------------------------------------- #
# dynamic-value SpMM + SDDMM backward (attention path)
# --------------------------------------------------------------------- #


def test_dynamic_forward_matches_segment_sum():
    n, nnz, d = 600, 7000, 80
    row, col, _ = _random_coo(n, nnz, seed=21, empty_stride=5)
    val = np.random.RandomState(22).rand(len(row)).astype(np.float32)
    x = np.random.RandomState(23).randn(n, d).astype(np.float32)
    meta, meta_t = metas_from_coo(row, col, n)
    f = make_dynamic_csr_spmm(meta, meta_t, interpret=True)
    out = np.asarray(f(jnp.asarray(val), jnp.asarray(x)))
    ref = _dense_ref(row, col, val, n, x)
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(out - ref).max() / scale < 1e-5


def test_dynamic_grads_match_autodiff_in_val_and_x():
    n, nnz, d = 260, 3000, 48
    row, col, _ = _random_coo(n, nnz, seed=31)
    val = jnp.asarray(np.random.RandomState(32).rand(nnz).astype(np.float32))
    x = jnp.asarray(np.random.RandomState(33).randn(n, d).astype(np.float32))
    meta, meta_t = metas_from_coo(row, col, n)
    f = make_dynamic_csr_spmm(meta, meta_t, interpret=True)
    adj = build_sparse(row, col, np.asarray(val), n)
    # XLA reference differentiates through gather+segment_sum; its edges
    # are row-sorted, so map val through the same permutation
    order = np.argsort(row, kind="stable")

    def ref_fn(v, xx):
        vs = v[jnp.asarray(order)]
        gathered = vs[:, None] * xx[adj.col]
        y = jax.ops.segment_sum(gathered, adj.row, num_segments=n,
                                indices_are_sorted=True)
        return jnp.sum(jnp.tanh(y))

    gv, gx = jax.grad(lambda v, xx: jnp.sum(jnp.tanh(f(v, xx))),
                      argnums=(0, 1))(val, x)
    gv_ref, gx_ref = jax.grad(ref_fn, argnums=(0, 1))(val, x)
    for a, b in ((gv, gv_ref), (gx, gx_ref)):
        scale = float(jnp.abs(b).max()) + 1e-9
        assert float(jnp.abs(a - b).max()) / scale < 1e-5


def test_dynamic_meta_as_jit_argument():
    """ChunkMeta is a pytree: metas pass through jit boundaries as
    arguments (the AliNet step-arg pattern for 100K-scale adjacencies)."""
    n, nnz, d = 300, 2500, 32
    row, col, _ = _random_coo(n, nnz, seed=41)
    val = np.random.RandomState(42).rand(nnz).astype(np.float32)
    x = np.random.RandomState(43).randn(n, d).astype(np.float32)
    meta, meta_t = metas_from_coo(row, col, n)
    meta_d, meta_t_d = meta.device_put(), meta_t.device_put()

    @jax.jit
    def run(m, mt, v, xx):
        return dyn_csr_spmm(m, mt, v, xx, True)

    out = np.asarray(run(meta_d, meta_t_d, jnp.asarray(val), jnp.asarray(x)))
    ref = _dense_ref(row, col, val, n, x)
    assert np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9) < 1e-5


def test_dynamic_blocked_matches_unblocked_fwd_and_grads():
    """block_chunks mega-chunking (the 100K-scale memory guard) is
    numerically identical to the one-shot path, incl. both gradients."""
    n, nnz, d = 900, 12000, 40
    row, col, _ = _random_coo(n, nnz, seed=61, empty_stride=9)
    val = jnp.asarray(np.random.RandomState(62).rand(len(row))
                      .astype(np.float32))
    x = jnp.asarray(np.random.RandomState(63).randn(n, d).astype(np.float32))
    S = 4
    meta, meta_t = metas_from_coo(row, col, n, pad_chunks_to=S)
    f_blk = make_dynamic_csr_spmm(meta, meta_t, interpret=True,
                                  block_chunks=S)
    f_one = make_dynamic_csr_spmm(meta, meta_t, interpret=True)
    out_b = np.asarray(f_blk(val, x))
    out_1 = np.asarray(f_one(val, x))
    assert np.abs(out_b - out_1).max() < 1e-5

    gv_b, gx_b = jax.grad(lambda v, xx: jnp.sum(jnp.sin(f_blk(v, xx))),
                          argnums=(0, 1))(val, x)
    gv_1, gx_1 = jax.grad(lambda v, xx: jnp.sum(jnp.sin(f_one(v, xx))),
                          argnums=(0, 1))(val, x)
    assert float(jnp.abs(gv_b - gv_1).max()) < 1e-5
    assert float(jnp.abs(gx_b - gx_1).max()) < 1e-5


def test_chunk_meta_slots_are_a_bijection_onto_real_edges():
    n, nnz = 500, 9000
    row, col, _ = _random_coo(n, nnz, seed=51)
    meta = build_chunk_meta(row, col, n)
    slots = np.asarray(meta.slots)
    assert len(np.unique(slots)) == nnz            # injective
    # each slot's col matches its original edge's col
    assert np.array_equal(np.asarray(meta.col)[slots], col)


def test_forward_bf16_precision_close():
    """precision='default' (bf16 feature gather, f32 accumulate) stays
    within bf16 epsilon of the exact result."""
    n, nnz, d = 400, 6000, 64
    row, col, val = _random_coo(n, nnz, seed=9)
    x = np.random.RandomState(4).randn(n, d).astype(np.float32)
    plan, plan_t = plans_from_coo(row, col, val, n)
    f = make_csr_spmm(plan, plan_t, interpret=True, precision="default")
    out = np.asarray(f(jnp.asarray(x)))
    ref = _dense_ref(row, col, val, n, x)
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(out - ref).max() / scale < 2e-2
    # backward uses the same precision through the transpose plan
    g = jax.grad(lambda xx: jnp.sum(jnp.tanh(f(xx))))(jnp.asarray(x))
    adj = build_sparse(row, col, val, n)
    gref = jax.grad(lambda xx: jnp.sum(jnp.tanh(spmm(adj, xx))))(jnp.asarray(x))
    gscale = float(jnp.abs(gref).max()) + 1e-9
    assert float(jnp.abs(g - gref).max()) / gscale < 2e-2


# --------------------------------------------------------------------- #
# fused attention SpMM (att_spmm)
# --------------------------------------------------------------------- #

def _att_ref(row, col, val, s1, s2, x):
    """jnp reference of the att_spmm semantics (differentiable)."""
    import jax
    import jax.numpy as jnp
    n, d = x.shape
    pre = val * (s1[row] + s2[col])
    w = jnp.exp(jax.nn.leaky_relu(pre, 0.2)) * (val != 0)
    aug = jnp.concatenate([x, jnp.ones((n, 1), x.dtype)], axis=1)
    return jax.ops.segment_sum(w[:, None] * aug[col], row, num_segments=n)


def _att_setup(n, nnz, d, seed=0, pad_chunks_to=1):
    import jax.numpy as jnp
    from openea_tpu.ops.spmm_pallas import chunk_vals, metas_from_coo
    rng = np.random.RandomState(seed)
    row = rng.randint(0, n, nnz).astype(np.int32)
    col = rng.randint(0, n, nnz).astype(np.int32)
    val = (rng.rand(nnz).astype(np.float32) * 0.5 + 0.1)
    meta, meta_t = metas_from_coo(row, col, n, pad_chunks_to=pad_chunks_to)
    val_c = chunk_vals(meta, val)
    val_t = chunk_vals(meta_t, val)
    s1 = np.tanh(rng.randn(n)).astype(np.float32)
    s2 = np.tanh(rng.randn(n)).astype(np.float32)
    x = rng.randn(n, d).astype(np.float32)
    F = -(-(d + 2) // 128) * 128
    feats = np.zeros((n, F), np.float32)
    feats[:, :d] = x
    feats[:, d] = 1.0
    feats[:, d + 1] = s2
    return (row, col, val, meta, meta_t, val_c, val_t,
            jnp.asarray(s1), jnp.asarray(s2), jnp.asarray(x),
            jnp.asarray(feats))


@pytest.mark.parametrize("n,nnz,d", [(300, 3000, 64), (150, 5000, 128)])
def test_att_spmm_forward_matches_reference(n, nnz, d):
    import jax.numpy as jnp
    from openea_tpu.ops.spmm_pallas import att_spmm
    (row, col, val, meta, meta_t, val_c, val_t, s1, s2, x,
     feats) = _att_setup(n, nnz, d)
    out = att_spmm(meta, meta_t, val_c, val_t, s1, feats, d,
                   interpret=True)
    ref = _att_ref(jnp.asarray(row), jnp.asarray(col), jnp.asarray(val),
                   s1, s2, x)
    np.testing.assert_allclose(np.asarray(out[:, :d + 1]), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_att_spmm_grads_match_reference_autodiff():
    import jax
    import jax.numpy as jnp
    from openea_tpu.ops.spmm_pallas import att_spmm
    n, nnz, d = 200, 1500, 32
    (row, col, val, meta, meta_t, val_c, val_t, s1, s2, x,
     feats) = _att_setup(n, nnz, d, seed=3)
    rowj, colj, valj = jnp.asarray(row), jnp.asarray(col), jnp.asarray(val)
    g_out = jnp.asarray(
        np.random.RandomState(9).randn(n, d + 1).astype(np.float32))

    def loss_kernel(s1_, x_, s2_):
        F = feats.shape[1]
        f = jnp.zeros((n, F), jnp.float32)
        f = f.at[:, :d].set(x_).at[:, d].set(1.0).at[:, d + 1].set(s2_)
        out = att_spmm(meta, meta_t, val_c, val_t, s1_, f, d,
                       interpret=True)
        return jnp.sum(out[:, :d + 1] * g_out)

    def loss_ref(s1_, x_, s2_):
        return jnp.sum(_att_ref(rowj, colj, valj, s1_, s2_, x_) * g_out)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(s1, x, s2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(s1, x, s2)
    for a, b, name in zip(gk, gr, ("ds1", "dx", "ds2")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5, err_msg=name)


def test_att_spmm_blocked_matches_unblocked():
    import jax
    import jax.numpy as jnp
    from openea_tpu.ops.spmm_pallas import att_spmm
    n, nnz, d = 300, 4000, 32
    S = 2
    (row, col, val, meta, meta_t, val_c, val_t, s1, s2, x,
     feats) = _att_setup(n, nnz, d, seed=5, pad_chunks_to=S)
    out0 = att_spmm(meta, meta_t, val_c, val_t, s1, feats, d,
                    interpret=True)
    out1 = att_spmm(meta, meta_t, val_c, val_t, s1, feats, d,
                    interpret=True, block_chunks=S)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=2e-5, atol=2e-5)

    g_out = jnp.asarray(
        np.random.RandomState(1).randn(n, feats.shape[1]).astype(np.float32))

    def loss(blocked, s1_, f_):
        out = att_spmm(meta, meta_t, val_c, val_t, s1_, f_, d,
                       interpret=True, block_chunks=S if blocked else 0)
        return jnp.sum(out * g_out)

    g0 = jax.grad(lambda s1_, f_: loss(False, s1_, f_), (0, 1))(s1, feats)
    g1 = jax.grad(lambda s1_, f_: loss(True, s1_, f_), (0, 1))(s1, feats)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g0[0]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g0[1]),
                               rtol=2e-5, atol=2e-5)
