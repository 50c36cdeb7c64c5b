"""Pallas CSR SpMM for the GNN family (GCN-Align / AliNet / RDGCN).

Replaces `tf.sparse_tensor_dense_matmul` (reference
approaches/gcn_align.py:83, alinet.py:581,674-676, rdgcn.py:202-215) on
the TPU hot path.  The XLA fallback (`ops/graph.spmm`) lowers to
gather -> multiply -> scatter-add; measured on-chip at 100K scale
(n=200K, nnz=2.4M, d=128) that chain runs at ~22 GB/s effective — the
scatter-add alone is ~23 ms and the unfused [nnz, d] intermediate makes
three extra HBM round trips.  The gather itself is fast (~214 GB/s), so
the design here keeps XLA's gather and replaces everything after it:

    P = x[col]                                  (XLA gather, random reads)
    out = pallas sorted-segment matmul-reduce   (this module)

The kernel walks edge chunks of ``EC`` edges (row-sorted, so each chunk
lands in one ``TM``-row output window), builds a val-scaled one-hot
matrix S[TM, EC] on the VPU, and accumulates ``S @ P_chunk`` on the MXU
into a VMEM-resident output tile.  The output tile flushes to HBM once
per window (scalar-prefetched chunk->window routing), so the total HBM
traffic is one streaming read of P plus one write of the output —
roughly speed-of-light for this op — and the scatter-add becomes a
dense matmul the MXU is built for.

Zero-weight padding edges (col=0, val=0) make every chunk exactly EC
edges without branching; their one-hot column is all zeros so they
contribute nothing.

Backward: d/dx (A @ x) = A^T @ g — the same kernel run with a transpose
plan (edges re-sorted by source).  Adjacency values are treated as
constants (GNN adjacencies here are precomputed weights, never trained);
models that need val-gradients (attention) stay on the XLA path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TM = 128          # output rows per window (one-hot matmul height)
EC = 1024         # edges per chunk (= 8 x 128 metadata tile)
_LANE = 128


class SpmmPlan(NamedTuple):
    """Host-precomputed chunk routing for one row-sorted COO adjacency.

    col        [NC*EC]      gather indices (pad -> 0)
    val        [NC, 8, 128] edge weights per chunk (pad -> 0)
    rowloc     [NC, 8, 128] dest row local to the chunk's window
    window     [NC]         output window index per chunk (sorted)
    first      [NC]         1 where a chunk starts a new window
    n_rows     original row count (output sliced back to this)
    n_windows  padded row count // TM
    """

    col: jax.Array
    val: jax.Array
    rowloc: jax.Array
    window: jax.Array
    first: jax.Array
    n_rows: int
    n_windows: int


def build_spmm_plan(row: np.ndarray, col: np.ndarray, val: np.ndarray,
                    n_rows: int) -> SpmmPlan:
    """Chunk a row-sorted COO into EC-edge chunks that never span a
    TM-row window, padding each window's tail chunk with zero edges."""
    row = np.asarray(row)
    col = np.asarray(col)
    val = np.asarray(val)
    order = np.argsort(row, kind="stable")
    row, col, val = row[order], col[order], val[order]

    n_windows = max(-(-n_rows // TM), 1)
    win = row // TM
    # edges per window (every window gets >= 1 chunk: unvisited Pallas
    # output blocks are undefined, so empty windows need a zeroing chunk)
    wcounts = np.bincount(win, minlength=n_windows).astype(np.int64)
    wstarts = np.concatenate([[0], np.cumsum(wcounts)])
    chunks_per = np.maximum(-(-wcounts // EC), 1)
    nc = int(chunks_per.sum())

    col_p = np.zeros(nc * EC, np.int32)
    val_p = np.zeros(nc * EC, np.float32)
    rowloc_p = np.zeros(nc * EC, np.int32)
    window_p = np.zeros(nc, np.int32)
    first_p = np.zeros(nc, np.int32)

    ci = 0
    for w in range(n_windows):
        pos, cnt = int(wstarts[w]), int(wcounts[w])
        for j in range(int(chunks_per[w])):
            lo = pos + j * EC
            hi = min(pos + (j + 1) * EC, pos + cnt)
            k = hi - lo
            dst = ci * EC
            col_p[dst:dst + k] = col[lo:hi]
            val_p[dst:dst + k] = val[lo:hi]
            rowloc_p[dst:dst + k] = row[lo:hi] - w * TM
            window_p[ci] = w
            first_p[ci] = 1 if j == 0 else 0
            ci += 1

    # numpy on purpose: plans are usually CLOSURE constants of jitted
    # model steps — numpy embeds into the lowered module from host memory,
    # a device array would cost a blocking device->host read at trace time
    # (same rule as ops/graph.build_sparse(host=True))
    return SpmmPlan(
        col=col_p,
        val=val_p.reshape(nc, 8, EC // 8),
        rowloc=rowloc_p.reshape(nc, 8, EC // 8),
        window=window_p,
        first=first_p,
        n_rows=n_rows,
        n_windows=n_windows,
    )


def _segsum_kernel(win_ref, first_ref, val_ref, rowloc_ref, p_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rl = rowloc_ref[0].reshape(1, EC)              # [1, EC]
    v = val_ref[0].reshape(1, EC)                  # [1, EC]
    sel = (jax.lax.broadcasted_iota(jnp.int32, (TM, EC), 0)
           == rl).astype(jnp.float32)
    s = sel * v                                    # val-scaled one-hot
    # HIGHEST: multi-pass f32 on the MXU — a single bf16 pass rounds the
    # gathered features to ~3 digits (2e-3 rel err vs segment_sum)
    out_ref[:] += jnp.dot(s, p_ref[:], preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("n_rows", "n_windows",
                                             "interpret"))
def _sorted_segment_matmul(val, rowloc, window, first, p,
                           n_rows: int, n_windows: int,
                           interpret: bool = False):
    nc = window.shape[0]
    d = p.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                     # window, first
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((1, 8, EC // 8), lambda i, w, f: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, EC // 8), lambda i, w, f: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EC, d), lambda i, w, f: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, d), lambda i, w, f: (w[i], 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _segsum_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_windows * TM, d), jnp.float32),
        interpret=interpret,
    )(window, first, val, rowloc, p)
    return out


def _forward(plan: SpmmPlan, x: jax.Array, interpret: bool) -> jax.Array:
    d0 = x.shape[1]
    d = -(-d0 // _LANE) * _LANE
    xp = x.astype(jnp.float32)
    if d != d0:
        xp = jnp.pad(xp, ((0, 0), (0, d - d0)))
    p = xp[plan.col]                               # [NC*EC, d] XLA gather
    out = _sorted_segment_matmul(plan.val, plan.rowloc,
                                 plan.window, plan.first, p,
                                 plan.n_rows, plan.n_windows,
                                 interpret=interpret)
    return out[:plan.n_rows, :d0]


def make_csr_spmm(plan: SpmmPlan, plan_t: SpmmPlan, interpret: bool = False):
    """Differentiable y = A @ x with Pallas forward and transpose-plan
    backward.  ``plan_t`` is the plan of A^T (build_spmm_plan with row/col
    swapped); both close over the returned fn."""

    @jax.custom_vjp
    def csr_spmm(x):
        return _forward(plan, x, interpret)

    def fwd(x):
        return csr_spmm(x), None

    def bwd(_, g):
        return (_forward(plan_t, g, interpret),)

    csr_spmm.defvjp(fwd, bwd)
    return csr_spmm


def plans_from_coo(row: np.ndarray, col: np.ndarray, val: np.ndarray,
                   n_rows: int, n_cols: int | None = None):
    """(plan, plan_T) pair for make_csr_spmm.  ``n_cols`` defaults to
    n_rows (square adjacency)."""
    n_cols = n_rows if n_cols is None else n_cols
    plan = build_spmm_plan(row, col, val, n_rows)
    plan_t = build_spmm_plan(col, row, val, n_cols)
    return plan, plan_t
