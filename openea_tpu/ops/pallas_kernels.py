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

`inner_rank_both`: the MXU analog for the inner/cosine family (reference
alignment.py:69-80 test() prints BOTH the plain and CSLS metric
families).  The blocked XLA rank pass materializes each [block, n2] sim
slab in HBM and re-reads it for the gold-take / greater-count / tie /
argmax passes — measured 22% of f32 peak at 100K eval scale while the
bare sim matmul runs at 90+ TF/s.  Here each [TM, TN] sim tile stays in
registers/VMEM and feeds BOTH families' rank counters and arg-bests
before being discarded: the CSLS comparison 2*s - r1_i - r2_j vs the
gold's CSLS value reduces to (2*s - r2_j) > (2*gv_i - r2[gold_i]) — r1
cancels — so one tile serves plain and CSLS without a second matmul.

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


def _manhattan_rank_kernel(e1t_ref, e2t_ref, gold_ref, goldd_ref, r2_ref,
                           tcs_ref, rank_ref, best_ref, bestd_ref,
                           rankc_ref, bestc_ref, bestcd_ref,
                           feat_chunk: int, csls: bool):
    j = pl.program_id(1)
    tm = e1t_ref.shape[1]
    tn = e2t_ref.shape[1]
    d = e1t_ref.shape[0]

    @pl.when(j == 0)
    def _():
        rank_ref[:] = jnp.zeros_like(rank_ref)
        best_ref[:] = jnp.zeros_like(best_ref)
        bestd_ref[:] = jnp.full_like(bestd_ref, _NEG)
        rankc_ref[:] = jnp.zeros_like(rankc_ref)
        bestc_ref[:] = jnp.zeros_like(bestc_ref)
        bestcd_ref[:] = jnp.full_like(bestcd_ref, _NEG)

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

    if csls:
        # CSLS over cityblock similarity 1 - dist: the comparison
        # 2*(1-d_ij) - r1_i - r2_j > gold's reduces to
        # (-2*d_ij - r2_j) > (-2*gd_i - r2[gold_i]) — constants and r1
        # cancel.  Padding columns carry huge dist -> sc ~ -inf.
        sc = -2.0 * dist - r2_ref[:]
        closer_c = ((sc > tcs_ref[:]) & (col != gold_c)).astype(jnp.int32)
        rankc_ref[:] += jnp.sum(closer_c, axis=1, keepdims=True)
        tile_best = jnp.max(sc, axis=1, keepdims=True)
        tile_idx = (jnp.argmax(sc, axis=1).astype(jnp.int32)[:, None]
                    + j * tn)
        better = tile_best > bestcd_ref[:]
        bestcd_ref[:] = jnp.where(better, tile_best, bestcd_ref[:])
        bestc_ref[:] = jnp.where(better, tile_idx, bestc_ref[:])


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


_PRECS = {"highest": jax.lax.Precision.HIGHEST,
          "default": jax.lax.Precision.DEFAULT}


def _inner_rank_kernel(e1_ref, e2_ref, gold_ref, goldv_ref, r2_ref,
                       tcs_ref, sq1_ref, sq2_ref,
                       rank_ref, best_ref, bestv_ref,
                       rankc_ref, bestc_ref, bestcv_ref,
                       *, n2: int, precision: str, csls: bool,
                       metric: str):
    j = pl.program_id(1)
    tm, tn = rank_ref.shape[0], e2_ref.shape[0]

    @pl.when(j == 0)
    def _():
        rank_ref[:] = jnp.zeros_like(rank_ref)
        best_ref[:] = jnp.zeros_like(best_ref)
        bestv_ref[:] = jnp.full_like(bestv_ref, _NEG)
        rankc_ref[:] = jnp.zeros_like(rankc_ref)
        bestc_ref[:] = jnp.zeros_like(bestc_ref)
        bestcv_ref[:] = jnp.full_like(bestcv_ref, _NEG)

    s = jax.lax.dot_general(e1_ref[:], e2_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_PRECS[precision])        # [TM, TN]
    if metric == "euclidean":
        # sim = 1 - ||x - y||_2 (ops/similarity._pairwise) from the same
        # MXU dot via the norm expansion; sqrt runs on the VPU per tile
        d2 = jnp.maximum(sq1_ref[:] + sq2_ref[:] - 2.0 * s, 0.0)
        s = 1.0 - jnp.sqrt(d2)
    col = jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1) + j * tn
    gold_c = gold_ref[:]                                        # [TM, 1]
    valid = (col < n2) & (col != gold_c)

    closer = (s > goldv_ref[:]) & valid
    rank_ref[:] += jnp.sum(closer.astype(jnp.int32), axis=1, keepdims=True)
    sm = jnp.where(col < n2, s, _NEG)
    tile_best = jnp.max(sm, axis=1, keepdims=True)
    tile_idx = jnp.argmax(sm, axis=1).astype(jnp.int32)[:, None] + j * tn
    better = tile_best > bestv_ref[:]
    bestv_ref[:] = jnp.where(better, tile_best, bestv_ref[:])
    best_ref[:] = jnp.where(better, tile_idx, best_ref[:])

    if csls:
        sc = 2.0 * s - r2_ref[:]                 # r2 tile broadcast [1, TN]
        closer_c = (sc > tcs_ref[:]) & valid
        rankc_ref[:] += jnp.sum(closer_c.astype(jnp.int32), axis=1,
                                keepdims=True)
        scm = jnp.where(col < n2, sc, _NEG)
        tile_best = jnp.max(scm, axis=1, keepdims=True)
        tile_idx = jnp.argmax(scm, axis=1).astype(jnp.int32)[:, None] + j * tn
        better = tile_best > bestcv_ref[:]
        bestcv_ref[:] = jnp.where(better, tile_best, bestcv_ref[:])
        bestc_ref[:] = jnp.where(better, tile_idx, bestc_ref[:])


@functools.partial(jax.jit, static_argnames=("csls", "tm", "tn",
                                             "precision", "interpret",
                                             "metric"))
def inner_rank_both(embed1: jax.Array, embed2: jax.Array,
                    gold_cols: jax.Array, r2=None, r2_gold=None,
                    csls: bool = True, tm: int = 0, tn: int = 0,
                    precision: str = "highest", interpret: bool = False,
                    metric: str = "inner"):
    """Fused MXU exact-rank for the plain AND (optionally) CSLS metric
    families in one matmul pass: (rank, best, rank_csls, best_csls),
    each [n1] i32 (csls outputs None when csls=False).

    ``metric``: 'inner' or 'euclidean' (1 - L2, derived from the same
    dot tile via the norm expansion).
    ``r2`` [n2]: mean top-k sim of each CANDIDATE against all queries
    (blocked_row_topk_means(embed2, embed1)); ``r2_gold`` [n1] = r2 at
    each row's gold column.  The r1 row statistic cancels from every
    CSLS comparison, so it is never needed."""
    n1, d0 = embed1.shape
    n2 = embed2.shape[0]
    d = -(-d0 // 128) * 128          # lane-align features (zeros: dot safe)
    # bf16 inputs (compute_dtype='bfloat16' eval opt-in) stay bf16 into
    # the MXU dot; everything downstream of the dot is f32 regardless
    pack_dt = (jnp.bfloat16 if (embed1.dtype == jnp.bfloat16
                                and embed2.dtype == jnp.bfloat16)
               else jnp.float32)
    if not tm:
        # e1/e2 tiles are double-buffered in VMEM (~16 MB/core): size
        # (tm + tn) so 2 * (tm + 2*tm) * d * 4 plus the kernel's [tm, tn]
        # temporaries stay under budget — wide concat embeddings (AliNet
        # eval: d ~ 1300) need smaller tiles than the d=128 default.  A
        # 12 MB operand budget left no headroom for the temporaries and
        # hit scoped-vmem OOM at d=1280 (caught by the alinet_15k drive);
        # 9 MB keeps ~2x margin
        tm = max(128, min(512, (9 * 2 ** 20 // (24 * d)) // 128 * 128))
        tn = 2 * tm
    m = -(-n1 // tm) * tm
    n = -(-n2 // tn) * tn
    e1 = jnp.zeros((m, d), pack_dt).at[:n1, :d0].set(embed1)
    e2 = jnp.zeros((n, d), pack_dt).at[:n2, :d0].set(embed2)

    gold = gold_cols.astype(jnp.int32)
    # gold sim via the SAME contraction the tiles use (dot_general row-
    # wise), so the exclude-gold-column + strict-> semantics are the only
    # tie surface (see module docstring).  Under bf16 packing the gold
    # value is f32-exact while tile sims carry bf16 rounding — rank
    # flips stay within bf16 epsilon (same caveat as the XLA bf16 path)
    gv = jnp.sum(embed1.astype(jnp.float32)
                 * embed2[gold].astype(jnp.float32),
                 axis=1, dtype=jnp.float32)
    sq1p = jnp.zeros((m, 1), jnp.float32)
    sq2p = jnp.zeros((1, n), jnp.float32)
    if metric == "euclidean":
        sq1 = jnp.sum(jnp.square(embed1), axis=1, dtype=jnp.float32)
        sq2 = jnp.sum(jnp.square(embed2), axis=1, dtype=jnp.float32)
        sq1p = sq1p.at[:n1, 0].set(sq1)
        sq2p = sq2p.at[0, :n2].set(sq2)
        gv = 1.0 - jnp.sqrt(jnp.maximum(sq1 + sq2[gold] - 2.0 * gv, 0.0))
    goldp = jnp.zeros((m, 1), jnp.int32).at[:n1, 0].set(gold)
    goldvp = jnp.full((m, 1), 3.4e38, jnp.float32).at[:n1, 0].set(gv)
    if csls:
        assert r2 is not None and r2_gold is not None
        r2p = jnp.zeros((1, n), jnp.float32).at[0, :n2].set(r2)
        tcs = 2.0 * gv - r2_gold
        tcsp = jnp.full((m, 1), 3.4e38, jnp.float32).at[:n1, 0].set(tcs)
    else:
        r2p = jnp.zeros((1, n), jnp.float32)
        tcsp = jnp.full((m, 1), 3.4e38, jnp.float32)

    grid = (m // tm, n // tn)
    kernel = functools.partial(_inner_rank_kernel, n2=n2,
                               precision=precision, csls=csls,
                               metric=metric)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, d), lambda i, j: (i, 0)),
            pl.BlockSpec((tn, d), lambda i, j: (j, 0)),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, tn), lambda i, j: (0, j)),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, tn), lambda i, j: (0, j)),
        ],
        out_specs=[pl.BlockSpec((tm, 1), lambda i, j: (i, 0))] * 6,
        out_shape=[jax.ShapeDtypeStruct((m, 1), jnp.int32),
                   jax.ShapeDtypeStruct((m, 1), jnp.int32),
                   jax.ShapeDtypeStruct((m, 1), jnp.float32),
                   jax.ShapeDtypeStruct((m, 1), jnp.int32),
                   jax.ShapeDtypeStruct((m, 1), jnp.int32),
                   jax.ShapeDtypeStruct((m, 1), jnp.float32)],
        interpret=interpret,
    )(e1, e2, goldp, goldvp, r2p, tcsp, sq1p, sq2p)
    rank, best, _, rank_c, best_c, _ = outs
    if csls:
        return (rank[:n1, 0], best[:n1, 0], rank_c[:n1, 0], best_c[:n1, 0])
    return rank[:n1, 0], best[:n1, 0], None, None


@functools.partial(jax.jit, static_argnames=("csls", "tm", "tn",
                                             "feat_chunk", "interpret"))
def manhattan_rank_both(embed1: jax.Array, embed2: jax.Array,
                        gold_cols: jax.Array, r2=None, r2_gold=None,
                        csls: bool = True, tm: int = 256, tn: int = 512,
                        feat_chunk: int = 8, interpret: bool = False):
    """Fused cityblock exact-rank for the plain AND (optionally) CSLS
    families in one distance pass: (rank, best, rank_csls, best_csls),
    each [n1] i32 (csls outputs None when csls=False).

    Cityblock similarity is 1 - ||x - y||_1; ``r2`` [n2] is the mean
    top-k of that similarity per CANDIDATE (blocked_row_topk_means with
    metric='manhattan'), ``r2_gold`` [n1] its value at each row's gold
    column.  r1 cancels from every CSLS comparison."""
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
    if csls:
        assert r2 is not None and r2_gold is not None
        r2p = jnp.zeros((1, n), jnp.float32).at[0, :n2].set(r2)
        tcs = -2.0 * gold_dist[:, 0] - r2_gold
        tcsp = jnp.full((m, 1), 3.4e38, jnp.float32).at[:n1, 0].set(tcs)
    else:
        r2p = jnp.zeros((1, n), jnp.float32)
        tcsp = jnp.full((m, 1), 3.4e38, jnp.float32)

    grid = (m // tm, n // tn)
    kernel = functools.partial(_manhattan_rank_kernel,
                               feat_chunk=feat_chunk, csls=csls)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, tm), lambda i, j: (0, i)),
            pl.BlockSpec((d, tn), lambda i, j: (0, j)),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, tn), lambda i, j: (0, j)),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),
        ],
        out_specs=[pl.BlockSpec((tm, 1), lambda i, j: (i, 0))] * 6,
        out_shape=[jax.ShapeDtypeStruct((m, 1), jnp.int32),
                   jax.ShapeDtypeStruct((m, 1), jnp.int32),
                   jax.ShapeDtypeStruct((m, 1), jnp.float32),
                   jax.ShapeDtypeStruct((m, 1), jnp.int32),
                   jax.ShapeDtypeStruct((m, 1), jnp.int32),
                   jax.ShapeDtypeStruct((m, 1), jnp.float32)],
        interpret=interpret,
    )(e1t, e2t, goldp, golddp, r2p, tcsp)
    rank, best, _, rank_c, best_c, _ = outs
    if csls:
        return (rank[:n1, 0], best[:n1, 0], rank_c[:n1, 0], best_c[:n1, 0])
    return rank[:n1, 0], best[:n1, 0], None, None


def manhattan_rank(embed1: jax.Array, embed2: jax.Array, gold_cols: jax.Array,
                   tm: int = 256, tn: int = 512, feat_chunk: int = 8,
                   interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """(rank_index[n1] i32, argbest[n1] i32) under cityblock similarity
    1 - ||x - y||_1 (constant shift leaves ranks unchanged)."""
    rank, best, _, _ = manhattan_rank_both(
        embed1, embed2, gold_cols, csls=False, tm=tm, tn=tn,
        feat_chunk=feat_chunk, interpret=interpret)
    return rank, best


# --------------------------------------------------------------------- #
# fused streaming exact top-k row means — the CSLS r2 statistic
# (reference similarity.py:57-83 calculate_nearest_k).  The XLA path
# materializes each [block, n] sim slab in HBM and runs lax.top_k over it
# (109 ms/pass at the 100K eval shape — ~40% of the fused both-family
# eval).  Here each [TM, TN] sim tile is merged into an exact running
# top-k register block ([TM, 128] lanes, first k live) with k
# extract-max steps on the VPU, so the slab never exists and no sort
# ever runs.  Exact: after merging every tile, the running block holds
# the true k largest values of the row (duplicates handled one
# occurrence per step, same value semantics as lax.top_k).
# --------------------------------------------------------------------- #

_TKLANES = 128


def _topk_update(s, acc, k: int):
    """Merge sim tile s [tm, tn] into running top-k acc [tm, _TKLANES]
    (first k lanes live, rest _NEG): k exact extract-max steps over the
    concatenation.  Returns the new acc block."""
    tm, tn = s.shape
    u = jnp.concatenate([s, acc], axis=1)
    W = u.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tm, W), 1)
    outlane = jax.lax.broadcasted_iota(jnp.int32, (tm, _TKLANES), 1)
    new = jnp.full((tm, _TKLANES), _NEG, jnp.float32)
    for step in range(k):
        m = jnp.max(u, axis=1, keepdims=True)
        pos = jnp.min(jnp.where(u == m, lane, W), axis=1, keepdims=True)
        u = jnp.where(lane == pos, _NEG, u)
        new = jnp.where(outlane == step, m, new)
    return new


def _topk_mean_out(new, k: int):
    outlane = jax.lax.broadcasted_iota(jnp.int32, new.shape, 1)
    return jnp.sum(jnp.where(outlane < k, new, 0.0), axis=1,
                   keepdims=True) / k


def _topk_means_kernel(a_ref, b_ref, sqa_ref, sqb_ref, acc_ref, out_ref,
                       *, k: int, nb: int, metric: str, precision: str):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.full_like(acc_ref, _NEG)

    tn = b_ref.shape[0]
    s = jax.lax.dot_general(a_ref[:], b_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_PRECS[precision])
    if metric == "euclidean":
        d2 = jnp.maximum(sqa_ref[:] + sqb_ref[:] - 2.0 * s, 0.0)
        s = 1.0 - jnp.sqrt(d2)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * tn
    s = jnp.where(col < nb, s, _NEG)
    new = _topk_update(s, acc_ref[:], k)
    acc_ref[:] = new

    @pl.when(j == nj - 1)
    def _():
        out_ref[:] = _topk_mean_out(new, k)


def _topk_means_manhattan_kernel(at_ref, bt_ref, acc_ref, out_ref, *,
                                 k: int, nb: int, feat_chunk: int):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.full_like(acc_ref, _NEG)

    tm = at_ref.shape[1]
    tn = bt_ref.shape[1]
    d = at_ref.shape[0]

    def body(c, dist):
        off = pl.multiple_of(c * feat_chunk, feat_chunk)
        xd = at_ref[pl.ds(off, feat_chunk), :]
        yd = bt_ref[pl.ds(off, feat_chunk), :]
        return dist + jnp.sum(jnp.abs(xd[:, :, None] - yd[:, None, :]),
                              axis=0)

    dist = jax.lax.fori_loop(0, d // feat_chunk, body,
                             jnp.zeros((tm, tn), jnp.float32))
    s = 1.0 - dist
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * tn
    s = jnp.where(col < nb, s, _NEG)
    new = _topk_update(s, acc_ref[:], k)
    acc_ref[:] = new

    @pl.when(j == nj - 1)
    def _():
        out_ref[:] = _topk_mean_out(new, k)


@functools.partial(jax.jit, static_argnames=("k", "metric", "tm", "tn",
                                             "precision", "feat_chunk",
                                             "interpret"))
def topk_means(a: jax.Array, b: jax.Array, k: int, metric: str = "inner",
               tm: int = 0, tn: int = 0, precision: str = "highest",
               feat_chunk: int = 8, interpret: bool = False) -> jax.Array:
    """mean of the exact top-k of each row of sim(a, b) — [na] f32 —
    without materializing any sim slab (drop-in for the blocked
    lax.top_k pass in ops/similarity.blocked_row_topk_means)."""
    na, d0 = a.shape
    nb = b.shape[0]
    assert 0 < k <= nb, (k, nb)
    assert k <= _TKLANES, (k, "running top-k lives in one 128-lane block")
    if metric == "cosine":
        from openea_tpu.ops.initializers import l2_normalize
        a, b = l2_normalize(a), l2_normalize(b)
        metric = "inner"

    if metric in ("manhattan", "cityblock"):
        tm = tm or 256
        tn = tn or 512
        d = -(-d0 // feat_chunk) * feat_chunk
        m = -(-na // tm) * tm
        n = -(-nb // tn) * tn
        at = jnp.zeros((m, d), jnp.float32).at[:na, :d0].set(a)
        bt = jnp.zeros((n, d), jnp.float32).at[:nb, :d0].set(b)
        acc, out = pl.pallas_call(
            functools.partial(_topk_means_manhattan_kernel, k=k, nb=nb,
                              feat_chunk=feat_chunk),
            grid=(m // tm, n // tn),
            in_specs=[pl.BlockSpec((d, tm), lambda i, j: (0, i)),
                      pl.BlockSpec((d, tn), lambda i, j: (0, j))],
            out_specs=[pl.BlockSpec((tm, _TKLANES), lambda i, j: (i, 0)),
                       pl.BlockSpec((tm, 1), lambda i, j: (i, 0))],
            out_shape=[jax.ShapeDtypeStruct((m, _TKLANES), jnp.float32),
                       jax.ShapeDtypeStruct((m, 1), jnp.float32)],
            interpret=interpret,
        )(at.T, bt.T)
        return out[:na, 0]

    assert metric in ("inner", "euclidean"), metric
    pack_dt = (jnp.bfloat16 if (a.dtype == jnp.bfloat16
                                and b.dtype == jnp.bfloat16)
               else jnp.float32)
    d = -(-d0 // 128) * 128
    if not tm:
        # same VMEM budget rule as inner_rank_both (wide concat
        # embeddings need smaller tiles; 9 MB leaves headroom for the
        # [tm, tn+128] merge temporaries)
        tm = max(128, min(512, (9 * 2 ** 20 // (24 * d)) // 128 * 128))
    tn = tn or 2 * tm  # tm-only overrides must not leave tn = 0
    m = -(-na // tm) * tm
    n = -(-nb // tn) * tn
    ap = jnp.zeros((m, d), pack_dt).at[:na, :d0].set(a)
    bp = jnp.zeros((n, d), pack_dt).at[:nb, :d0].set(b)
    sqa = jnp.zeros((m, 1), jnp.float32)
    sqb = jnp.zeros((1, n), jnp.float32)
    if metric == "euclidean":
        sqa = sqa.at[:na, 0].set(jnp.sum(jnp.square(a), axis=1,
                                         dtype=jnp.float32))
        sqb = sqb.at[0, :nb].set(jnp.sum(jnp.square(b), axis=1,
                                         dtype=jnp.float32))
    acc, out = pl.pallas_call(
        functools.partial(_topk_means_kernel, k=k, nb=nb, metric=metric,
                          precision=precision),
        grid=(m // tm, n // tn),
        in_specs=[pl.BlockSpec((tm, d), lambda i, j: (i, 0)),
                  pl.BlockSpec((tn, d), lambda i, j: (j, 0)),
                  pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),
                  pl.BlockSpec((1, tn), lambda i, j: (0, j))],
        out_specs=[pl.BlockSpec((tm, _TKLANES), lambda i, j: (i, 0)),
                   pl.BlockSpec((tm, 1), lambda i, j: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((m, _TKLANES), jnp.float32),
                   jax.ShapeDtypeStruct((m, 1), jnp.float32)],
        interpret=interpret,
    )(ap, bp, sqa, sqb)
    return out[:na, 0]


# --------------------------------------------------------------------- #
# cached-distance manhattan both-family eval.  The two-pass form pays
# the VPU cityblock floor TWICE (r2 pass + rank pass, ~290 ms each at
# the 100K shape — manhattan has no MXU mapping).  When the full [m, n]
# f32 distance matrix fits HBM (8.4 GB at 30K x 70K; ~16 GB/chip), it
# is cheaper to compute it ONCE (one VPU pass + one HBM write) and have
# both the column-top-k r2 statistic and the rank counters stream it
# back (HBM reads, trivial compute).  ops/ranking.py gates this on a
# memory budget and falls back to the two-pass kernels above.
# --------------------------------------------------------------------- #


def _col_topk_means_kernel(mat_ref, acc_ref, out_ref, *, k: int, sub: int,
                           n1: int, tm: int):
    """Running exact top-k per COLUMN of sim = 1 - dist, streamed over
    row tiles (grid = (nj, ni), i innermost).  acc [sub, tn] holds the
    first k live values per column; rows >= n1 (padding) are masked."""
    i = pl.program_id(1)
    ni = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.full_like(acc_ref, _NEG)

    tn = mat_ref.shape[1]
    s = 1.0 - mat_ref[:]
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + i * tm
    s = jnp.where(row < n1, s, _NEG)
    u = jnp.concatenate([s, acc_ref[:]], axis=0)
    H = u.shape[0]
    ridx = jax.lax.broadcasted_iota(jnp.int32, (H, tn), 0)
    oidx = jax.lax.broadcasted_iota(jnp.int32, (sub, tn), 0)
    new = jnp.full((sub, tn), _NEG, jnp.float32)
    for step in range(k):
        m = jnp.max(u, axis=0, keepdims=True)
        pos = jnp.min(jnp.where(u == m, ridx, H), axis=0, keepdims=True)
        u = jnp.where(ridx == pos, _NEG, u)
        new = jnp.where(oidx == step, m, new)
    acc_ref[:] = new

    @pl.when(i == ni - 1)
    def _():
        out_ref[:] = jnp.sum(jnp.where(oidx < k, new, 0.0), axis=0,
                             keepdims=True) / k


def _manhattan_rank_from_mat_kernel(mat_ref, gold_ref, goldd_ref, r2_ref,
                                    tcs_ref, rank_ref, best_ref, bestd_ref,
                                    rankc_ref, bestc_ref, bestcd_ref,
                                    *, tn: int):
    """_manhattan_rank_kernel's counter logic with the distance tile
    READ from the cached HBM matrix instead of recomputed."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        rank_ref[:] = jnp.zeros_like(rank_ref)
        best_ref[:] = jnp.zeros_like(best_ref)
        bestd_ref[:] = jnp.full_like(bestd_ref, _NEG)
        rankc_ref[:] = jnp.zeros_like(rankc_ref)
        bestc_ref[:] = jnp.zeros_like(bestc_ref)
        bestcd_ref[:] = jnp.full_like(bestcd_ref, _NEG)

    dist = mat_ref[:]
    tm = dist.shape[0]
    gold_d = goldd_ref[:]
    gold_c = gold_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1) + j * tn
    closer = ((dist < gold_d) & (col != gold_c)).astype(jnp.int32)
    rank_ref[:] += jnp.sum(closer, axis=1, keepdims=True)
    simt = -dist
    tile_best = jnp.max(simt, axis=1, keepdims=True)
    tile_idx = jnp.argmax(simt, axis=1).astype(jnp.int32)[:, None] + j * tn
    better = tile_best > bestd_ref[:]
    bestd_ref[:] = jnp.where(better, tile_best, bestd_ref[:])
    best_ref[:] = jnp.where(better, tile_idx, best_ref[:])
    sc = -2.0 * dist - r2_ref[:]
    closer_c = ((sc > tcs_ref[:]) & (col != gold_c)).astype(jnp.int32)
    rankc_ref[:] += jnp.sum(closer_c, axis=1, keepdims=True)
    tile_best = jnp.max(sc, axis=1, keepdims=True)
    tile_idx = jnp.argmax(sc, axis=1).astype(jnp.int32)[:, None] + j * tn
    better = tile_best > bestcd_ref[:]
    bestcd_ref[:] = jnp.where(better, tile_best, bestcd_ref[:])
    bestc_ref[:] = jnp.where(better, tile_idx, bestc_ref[:])


@functools.partial(jax.jit, static_argnames=("k", "tm", "tn", "feat_chunk",
                                             "interpret"))
def manhattan_rank_both_cached(embed1: jax.Array, embed2: jax.Array,
                               gold_cols: jax.Array, k: int = 10,
                               tm: int = 256, tn: int = 512,
                               feat_chunk: int = 8,
                               interpret: bool = False):
    """(rank, best, rank_csls, best_csls) under cityblock similarity,
    with the r2 CSLS statistic computed from the SAME cached distance
    matrix — one VPU distance pass total instead of two."""
    n1, d0 = embed1.shape
    n2 = embed2.shape[0]
    # csls_k beyond the family-1 row count would silently average -3.4e38
    # sentinels into the column top-k means (mirrors the topk_means guard)
    assert 0 < k <= n1, (k, n1)
    d = -(-d0 // feat_chunk) * feat_chunk
    m = -(-n1 // tm) * tm
    n = -(-n2 // tn) * tn
    e1 = jnp.zeros((m, d), jnp.float32).at[:n1, :d0].set(embed1)
    # pad candidates at 1e18 coordinates -> huge distance (never ranked,
    # never in any column top-k); pad e1 rows are masked in the r2 kernel
    e2 = jnp.full((n, d), 1e18, jnp.float32).at[:n2, :d0].set(embed2)
    e2 = e2.at[:n2, d0:].set(0.0)
    e1 = e1.at[:n1, d0:].set(0.0)

    dist = pl.pallas_call(
        functools.partial(_cityblock_mat_kernel, feat_chunk=feat_chunk),
        grid=(m // tm, n // tn),
        in_specs=[pl.BlockSpec((d, tm), lambda i, j: (0, i)),
                  pl.BlockSpec((d, tn), lambda i, j: (0, j))],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=interpret,
    )(e1.T, e2.T)

    sub = max(8, -(-k // 8) * 8)
    _, r2w = pl.pallas_call(
        functools.partial(_col_topk_means_kernel, k=k, sub=sub, n1=n1,
                          tm=tm),
        grid=(n // tn, m // tm),
        in_specs=[pl.BlockSpec((tm, tn), lambda jj, ii: (ii, jj))],
        out_specs=[pl.BlockSpec((sub, tn), lambda jj, ii: (0, jj)),
                   pl.BlockSpec((1, tn), lambda jj, ii: (0, jj))],
        out_shape=[jax.ShapeDtypeStruct((sub, n), jnp.float32),
                   jax.ShapeDtypeStruct((1, n), jnp.float32)],
        interpret=interpret,
    )(dist)
    r2 = r2w[0, :n2]

    gold = gold_cols.astype(jnp.int32)
    gold_vecs = embed2[gold]
    gold_dist = jnp.sum(jnp.abs(embed1 - gold_vecs), axis=1, keepdims=True)
    goldp = jnp.zeros((m, 1), jnp.int32).at[:n1, 0].set(gold)
    golddp = jnp.full((m, 1), -1.0, jnp.float32).at[:n1].set(gold_dist)
    r2p = jnp.zeros((1, n), jnp.float32).at[0, :n2].set(r2)
    tcs = -2.0 * gold_dist[:, 0] - r2[gold]
    tcsp = jnp.full((m, 1), 3.4e38, jnp.float32).at[:n1, 0].set(tcs)

    outs = pl.pallas_call(
        functools.partial(_manhattan_rank_from_mat_kernel, tn=tn),
        grid=(m // tm, n // tn),
        in_specs=[
            pl.BlockSpec((tm, tn), lambda i, j: (i, j)),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, tn), lambda i, j: (0, j)),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),
        ],
        out_specs=[pl.BlockSpec((tm, 1), lambda i, j: (i, 0))] * 6,
        out_shape=[jax.ShapeDtypeStruct((m, 1), jnp.int32),
                   jax.ShapeDtypeStruct((m, 1), jnp.int32),
                   jax.ShapeDtypeStruct((m, 1), jnp.float32),
                   jax.ShapeDtypeStruct((m, 1), jnp.int32),
                   jax.ShapeDtypeStruct((m, 1), jnp.int32),
                   jax.ShapeDtypeStruct((m, 1), jnp.float32)],
        interpret=interpret,
    )(dist, goldp, golddp, r2p, tcsp)
    rank, best, _, rank_c, best_c, _ = outs
    return rank[:n1, 0], best[:n1, 0], rank_c[:n1, 0], best_c[:n1, 0]
