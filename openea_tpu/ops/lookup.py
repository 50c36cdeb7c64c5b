"""Small-table embedding lookup with an MXU-friendly backward.

XLA's VJP for ``table[idx]`` is a scatter-add, which runs ~4x slower
than the equivalent one-hot matmul segment-sum on TPU at 10^6-row index
batches into sub-1K-row tables (measured r5: 30.2 ms scatter vs 7.5 ms
one-hot matmul for [1.18M, 100] -> [800, 100]; segment_sum is 16.4 ms).
``table_lookup`` keeps the fast gather forward and swaps the backward
for ``one_hot(idx).T @ dval`` — the r2 "practical optimum" pattern
(gather + MXU one-hot segment matmul), packaged as a custom_vjp.

ONLY for small tables (relations, views): the one-hot matmul costs
``len(idx) * rows * dim`` FLOPs, linear in table rows — never use it on
a 10^5+-row entity table.

Used by IPTransE's path loss (reference approaches/iptranse.py:173-181),
where 4 x 1.2M relation lookups per step made the backward scatter the
epoch bottleneck at 100K scale.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def table_lookup(table: jax.Array, idx: jax.Array,
                 bwd_dtype=jnp.bfloat16) -> jax.Array:
    """``table[idx]`` with a one-hot-matmul backward.

    ``bwd_dtype``: precision of the backward segment matmul operands
    (accumulation is always f32 via preferred_element_type).  bf16
    doubles the MXU rate; pass jnp.float32 for exact segment sums.
    """
    return table[idx]


def _fwd(table, idx, bwd_dtype):
    # residuals must be jax types: keep the (small) table itself so the
    # backward knows rows + dtype without non-array residuals
    return table[idx], (idx, jax.lax.stop_gradient(table))


def _bwd(bwd_dtype, res, dval):
    idx, table = res
    oh = (idx[:, None] == jnp.arange(table.shape[0],
                                     dtype=idx.dtype)[None, :])
    dtable = jax.lax.dot_general(
        oh.astype(bwd_dtype), dval.astype(bwd_dtype),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return dtable.astype(table.dtype), None


table_lookup.defvjp(_fwd, _bwd)
