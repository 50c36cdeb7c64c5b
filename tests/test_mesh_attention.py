"""Mesh attention primitives: boundary-exchange softmax SpMM + sharded
incidence sums (parallel/spmm_sharded.py) vs the single-device reference
semantics (ops/graph.segment_softmax + weighted gather-sum)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import Mesh

from openea_tpu.ops.graph import SparseAdj, segment_softmax
from openea_tpu.parallel.spmm_sharded import (
    boundary_softmax_spmm_padded, pad_rows, partition_pairs_by_plan,
    plan_boundary_exchange, sharded_segment_sum, unpad_rows)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def _mesh():
    return Mesh(np.asarray(jax.devices()[:8]), ("x",))


def _random_coo(n, density, rng, attr_max=0):
    dense = (rng.rand(n, n) < density)
    row, col = np.nonzero(dense)
    order = np.argsort(row, kind="stable")
    row, col = row[order].astype(np.int32), col[order].astype(np.int32)
    val = rng.rand(len(row)).astype(np.float32) + 0.1
    attr = (rng.randint(0, attr_max, len(row)).astype(np.int32)
            if attr_max else None)
    return row, col, val, attr


@pytest.mark.slow
def test_softmax_spmm_matches_segment_softmax():
    """AliNet-style: logits from static edge weight x (dst + src scalars)."""
    rng = np.random.RandomState(0)
    n, d = 50, 6
    row, col, val, _ = _random_coo(n, 0.15, rng)
    adj = SparseAdj(jnp.asarray(row), jnp.asarray(col), jnp.asarray(val), n)
    x = rng.randn(n, d).astype(np.float32)
    s1 = rng.randn(n).astype(np.float32)
    s2 = rng.randn(n).astype(np.float32)

    # single-device reference
    evals = jax.nn.leaky_relu(val * (s1[row] + s2[col]), 0.2)
    soft = np.asarray(segment_softmax(jnp.asarray(evals), jnp.asarray(row), n))
    expect = np.zeros((n, d), np.float32)
    np.add.at(expect, row, soft[:, None] * x[col])

    mesh = _mesh()
    plan = plan_boundary_exchange(adj, 8)
    feats = np.concatenate([x, s1[:, None], s2[:, None]], axis=1)
    xp = pad_rows(plan, jnp.asarray(feats))

    def logit_fn(dst, src, v, attr):
        return jax.nn.leaky_relu(v * (dst[:, -2] + src[:, -1]), 0.2)

    out = boundary_softmax_spmm_padded(mesh, plan, xp, logit_fn, agg_cols=d)
    got = np.asarray(unpad_rows(plan, out))
    np.testing.assert_allclose(got, expect, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_softmax_spmm_edge_attr_and_shared_partition():
    """RDGCN-style: logits from a replicated per-relation table gathered by
    the partitioned edge attribute; edge plan reuses the primal plan's
    row partition."""
    rng = np.random.RandomState(1)
    n, d, R = 40, 5, 7
    prow, pcol, pval, _ = _random_coo(n, 0.2, rng)
    primal = SparseAdj(jnp.asarray(prow), jnp.asarray(pcol),
                       jnp.asarray(pval), n)
    erow, ecol, _, erel = _random_coo(n, 0.1, rng, attr_max=R)
    ones = np.ones(len(erow), np.float32)
    edges = SparseAdj(jnp.asarray(erow), jnp.asarray(ecol),
                      jnp.asarray(ones), n)
    x = rng.randn(n, d).astype(np.float32)
    rel_logit = rng.randn(R).astype(np.float32)

    evals = jax.nn.leaky_relu(rel_logit[erel], 0.2)
    soft = np.asarray(segment_softmax(jnp.asarray(evals), jnp.asarray(erow), n))
    expect = np.zeros((n, d), np.float32)
    np.add.at(expect, erow, soft[:, None] * x[ecol])

    mesh = _mesh()
    plan_p = plan_boundary_exchange(primal, 8)
    plan_e = plan_boundary_exchange(edges, 8,
                                    row_starts=plan_p.row_starts,
                                    edge_attr=erel)
    assert np.array_equal(np.asarray(plan_e.row_starts),
                          np.asarray(plan_p.row_starts))
    xp = pad_rows(plan_e, jnp.asarray(x))

    def logit_fn(dst, src, v, attr, rl):
        return jax.nn.leaky_relu(rl[attr], 0.2)

    out = boundary_softmax_spmm_padded(mesh, plan_e, xp, logit_fn,
                                       rep_args=(jnp.asarray(rel_logit),))
    got = np.asarray(unpad_rows(plan_e, out))
    np.testing.assert_allclose(got, expect, atol=1e-5, rtol=1e-5)


def test_softmax_spmm_inside_jit_with_plan_arg():
    """BoundaryPlan is a pytree: the plan rides through jit as an argument
    (no giant index constants in the lowered module)."""
    rng = np.random.RandomState(2)
    n, d = 30, 4
    row, col, val, _ = _random_coo(n, 0.2, rng)
    adj = SparseAdj(jnp.asarray(row), jnp.asarray(col), jnp.asarray(val), n)
    x = rng.randn(n, d).astype(np.float32)
    mesh = _mesh()
    plan = plan_boundary_exchange(adj, 8)
    xp = pad_rows(plan, jnp.asarray(x))

    def logit_fn(dst, src, v, attr):
        return v

    @jax.jit
    def f(plan, xp):
        return boundary_softmax_spmm_padded(mesh, plan, xp, logit_fn,
                                            agg_cols=d)

    out = np.asarray(unpad_rows(plan, f(plan, xp)))
    evals = val.astype(np.float32)
    soft = np.asarray(segment_softmax(jnp.asarray(evals), jnp.asarray(row), n))
    expect = np.zeros((n, d), np.float32)
    np.add.at(expect, row, soft[:, None] * x[col])
    np.testing.assert_allclose(out, expect, atol=1e-5, rtol=1e-5)


def test_sharded_row_topk_matches_host():
    """BootEA's mesh bootstrapping primitive: row-sharded top-k of
    e1 @ e2.T equals the host computation (values and indices)."""
    from openea_tpu.parallel.eval_sharded import sharded_row_topk
    rng = np.random.RandomState(5)
    n1, n2, d, k = 37, 53, 8, 6       # n1 NOT divisible by 8: pad path
    e1 = rng.randn(n1, d).astype(np.float32)
    e2 = rng.randn(n2, d).astype(np.float32)
    vals, idx = sharded_row_topk(_mesh(), jnp.asarray(e1), jnp.asarray(e2),
                                 k, block=16)
    S = e1 @ e2.T
    ref_idx = np.argsort(-S, axis=1)[:, :k]
    ref_vals = np.take_along_axis(S, ref_idx, axis=1)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, atol=1e-5)
    # tie order may differ; compare as sets per row
    for i in range(n1):
        assert set(np.asarray(idx)[i]) == set(ref_idx[i]), i


def test_sharded_segment_sum_matches_host():
    rng = np.random.RandomState(3)
    n, d, R = 45, 6, 9
    row, col, val, _ = _random_coo(n, 0.2, rng)
    adj = SparseAdj(jnp.asarray(row), jnp.asarray(col), jnp.asarray(val), n)
    mesh = _mesh()
    plan = plan_boundary_exchange(adj, 8)
    # incidence pairs: (rel, ent)
    rel = rng.randint(0, R, 120).astype(np.int32)
    ent = rng.randint(0, n, 120).astype(np.int32)
    x = rng.randn(n, d).astype(np.float32)
    parts = partition_pairs_by_plan(plan, ent, rel)
    xp = pad_rows(plan, jnp.asarray(x))
    got = np.asarray(sharded_segment_sum(mesh, parts, xp, R))
    expect = np.zeros((R, d), np.float32)
    np.add.at(expect, rel, x[ent])
    np.testing.assert_allclose(got, expect, atol=1e-5, rtol=1e-5)
