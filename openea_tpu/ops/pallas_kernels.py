"""Pallas TPU kernels for the alignment-eval hot path.

`manhattan_rank`: fused cityblock-distance + exact-rank + argbest kernel.
The manhattan metric (GCN-Align / RDGCN eval, reference
similarity.py:29-33 `cityblock`) has no MXU mapping; the XLA formulation
|x[:,None,:] - y[None,:,:]|.sum(-1) materializes an [M, N, D] intermediate
(e.g. 10.5K x 10.5K x 300 f32 = 132 GB of HBM traffic at 15K-test scale,
forcing tiny blocks).  This kernel streams [TM, D] x [D, TN] tiles through
VMEM and accumulates the [TM, TN] distance tile feature-by-feature on the
VPU, then folds it straight into the exact-rank counters — the full
distance matrix never exists anywhere.

Rank semantics match ops/ranking.rank_and_argmax: rank(gold) = the count
of strictly-closer non-gold candidates (exact float ties between distinct
candidates are measure-zero in continuous embeddings).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG = -3.4e38


def _manhattan_rank_kernel(e1t_ref, e2t_ref, gold_ref, goldd_ref,
                           rank_ref, best_ref, bestd_ref, feat_chunk: int):
    j = pl.program_id(1)
    tm = e1t_ref.shape[1]
    tn = e2t_ref.shape[1]
    d = e1t_ref.shape[0]

    @pl.when(j == 0)
    def _():
        rank_ref[:] = jnp.zeros_like(rank_ref)
        best_ref[:] = jnp.zeros_like(best_ref)
        bestd_ref[:] = jnp.full_like(bestd_ref, _NEG)

    # both operands are [D, tile] so feature chunks slice the SUBLANE dim
    # (dynamic lane-dim slices don't lower on TPU); fori_loop reuses one
    # [FC, TM, TN] scratch instead of unrolled per-chunk temps
    def body(c, dist):
        off = pl.multiple_of(c * feat_chunk, feat_chunk)
        xd = e1t_ref[pl.ds(off, feat_chunk), :]               # [FC, TM]
        yd = e2t_ref[pl.ds(off, feat_chunk), :]               # [FC, TN]
        diff = jnp.abs(xd[:, :, None] - yd[:, None, :])       # [FC, TM, TN]
        return dist + jnp.sum(diff, axis=0)

    dist = jax.lax.fori_loop(0, d // feat_chunk, body,
                             jnp.zeros((tm, tn), jnp.float32))

    gold_d = goldd_ref[:]              # [TM, 1]
    gold_c = gold_ref[:]               # [TM, 1] global gold column
    col = (jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)
           + j * tn)
    # the gold column is excluded explicitly instead of relying on exact
    # float equality (tile accumulation order differs from the host-side
    # gold-distance reduction); non-gold exact ties are measure-zero in
    # continuous embeddings, so strict < is the whole count
    closer = ((dist < gold_d) & (col != gold_c)).astype(jnp.int32)
    rank_ref[:] += jnp.sum(closer, axis=1, keepdims=True)

    # running arg-best by similarity (= smallest distance, first index wins)
    simt = -dist
    tile_best = jnp.max(simt, axis=1, keepdims=True)
    tile_idx = jnp.argmax(simt, axis=1).astype(jnp.int32)[:, None] + j * tn
    better = tile_best > bestd_ref[:]
    bestd_ref[:] = jnp.where(better, tile_best, bestd_ref[:])
    best_ref[:] = jnp.where(better, tile_idx, best_ref[:])


def _cityblock_mat_kernel(e1t_ref, e2t_ref, out_ref, feat_chunk: int):
    tm = e1t_ref.shape[1]
    tn = e2t_ref.shape[1]
    d = e1t_ref.shape[0]

    def body(c, dist):
        off = pl.multiple_of(c * feat_chunk, feat_chunk)
        xd = e1t_ref[pl.ds(off, feat_chunk), :]
        yd = e2t_ref[pl.ds(off, feat_chunk), :]
        return dist + jnp.sum(jnp.abs(xd[:, :, None] - yd[:, None, :]), axis=0)

    out_ref[:] = jax.lax.fori_loop(0, d // feat_chunk, body,
                                   jnp.zeros((tm, tn), jnp.float32))


@functools.partial(jax.jit,
                   static_argnames=("tm", "tn", "feat_chunk", "interpret"))
def cityblock_matrix(embed1: jax.Array, embed2: jax.Array, tm: int = 256,
                     tn: int = 512, feat_chunk: int = 8,
                     interpret: bool = False) -> jax.Array:
    """[n1, n2] cityblock distance matrix via VMEM-tiled accumulation —
    the building block for hard-negative top-k mining (RDGCN) where XLA's
    broadcast formulation spills the [n1, n2, d] intermediate to HBM."""
    n1, d0 = embed1.shape
    n2 = embed2.shape[0]
    d = -(-d0 // feat_chunk) * feat_chunk
    m = -(-n1 // tm) * tm
    n = -(-n2 // tn) * tn
    e1 = jnp.zeros((m, d), jnp.float32).at[:n1, :d0].set(embed1)
    e2 = jnp.zeros((n, d), jnp.float32).at[:n2, :d0].set(embed2)
    out = pl.pallas_call(
        functools.partial(_cityblock_mat_kernel, feat_chunk=feat_chunk),
        grid=(m // tm, n // tn),
        in_specs=[pl.BlockSpec((d, tm), lambda i, j: (0, i)),
                  pl.BlockSpec((d, tn), lambda i, j: (0, j))],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=interpret,
    )(e1.T, e2.T)
    return out[:n1, :n2]


@functools.partial(jax.jit,
                   static_argnames=("tm", "tn", "feat_chunk", "interpret"))
def manhattan_rank(embed1: jax.Array, embed2: jax.Array, gold_cols: jax.Array,
                   tm: int = 256, tn: int = 512, feat_chunk: int = 8,
                   interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """(rank_index[n1] i32, argbest[n1] i32) under cityblock similarity
    1 - ||x - y||_1 (constant shift leaves ranks unchanged)."""
    n1, d0 = embed1.shape
    n2 = embed2.shape[0]
    # pad features to the chunk, rows/cols to tiles
    d = -(-d0 // feat_chunk) * feat_chunk
    m = -(-n1 // tm) * tm
    n = -(-n2 // tn) * tn
    e1 = jnp.zeros((m, d), jnp.float32).at[:n1, :d0].set(embed1)
    # pad columns with +inf-distance rows: large coordinate keeps padded
    # candidates strictly farther than any real one
    e2 = jnp.full((n, d), 1e18, jnp.float32).at[:n2, :d0].set(embed2)
    e2 = e2.at[:n2, d0:].set(0.0)
    e1 = e1.at[:n1, d0:].set(0.0)
    e1t = e1.T                                    # [D, M]
    e2t = e2.T                                    # [D, N]

    gold = gold_cols.astype(jnp.int32)
    gold_vecs = embed2[gold]                      # [n1, d0]
    gold_dist = jnp.sum(jnp.abs(embed1 - gold_vecs), axis=1, keepdims=True)
    goldp = jnp.zeros((m, 1), jnp.int32).at[:n1, 0].set(gold)
    golddp = jnp.full((m, 1), -1.0, jnp.float32).at[:n1].set(gold_dist)

    grid = (m // tm, n // tn)
    kernel = functools.partial(_manhattan_rank_kernel, feat_chunk=feat_chunk)
    rank, best, _ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, tm), lambda i, j: (0, i)),
            pl.BlockSpec((d, tn), lambda i, j: (0, j)),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, 1), jnp.int32),
            jax.ShapeDtypeStruct((m, 1), jnp.int32),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ],
        interpret=interpret,
    )(e1t, e2t, goldp, golddp)
    return rank[:n1, 0], best[:n1, 0]
