"""On-device exact ranking for alignment evaluation.

Replaces the reference's argsort-over-mp.Pool ranking
(modules/finding/alignment.py:44-168) with the exact-rank trick: the rank of
the gold column is 1 + #{j : s_ij > s_i,gold} + #{j < gold : s_ij == s_i,gold}
— O(n) per row, no argsort, tie-breaking identical to a stable descending
argsort.  Rows are processed in blocks via lax.map so the full n1 x n2
matrix never materializes (70K x 70K at 100K scale).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from openea_tpu.ops import dispatch
from openea_tpu.ops.initializers import l2_normalize
from openea_tpu.ops.similarity import _pairwise, blocked_row_topk_means

# manhattan CSLS eval: cache the full [n1, n2] f32 distance matrix in HBM
# when it fits (one VPU cityblock pass instead of two — the metric has no
# MXU mapping, so recomputation is the dominant cost).  8.4 GB at the
# 100K eval shape vs ~16 GB/chip; tests/benches may patch this down.
_MANHATTAN_CACHE_BYTES = 9 * 10 ** 9


def _manhattan_cache_fits(n1: int, n2: int) -> bool:
    return 4 * n1 * n2 <= _MANHATTAN_CACHE_BYTES


def rank_and_argmax(embed1: jax.Array, embed2: jax.Array,
                    gold_cols: jax.Array, metric: str = "inner",
                    normalize: bool = False, csls_k: int = 0,
                    block: int = 4096) -> Tuple[jax.Array, jax.Array]:
    """For each row i of sim(embed1, embed2): the 0-based rank of column
    ``gold_cols[i]`` and the argmax column.  Returns (rank_index[n1] i32,
    argmax[n1] i32).

    Backend dispatch (fused Pallas vs XLA) is resolved HERE, outside
    jit, and threaded in as static args — so ops.dispatch.force_fused()
    exercises every fused branch in interpret mode on CPU without a
    stale jit-cache hiding the switch."""
    # the HBM-cache budget gate is ALSO resolved here: _MANHATTAN_CACHE_BYTES
    # is a module global, and reading it inside the jitted body would bake
    # the decision into a stale trace cache when a caller patches the budget
    return _rank_and_argmax(embed1, embed2, gold_cols, metric=metric,
                            normalize=normalize, csls_k=csls_k, block=block,
                            fused=dispatch.use_fused(),
                            interpret=dispatch.interpret_mode(),
                            manh_cached=_manhattan_cache_fits(
                                embed1.shape[0], embed2.shape[0]))


@partial(jax.jit, static_argnames=("metric", "normalize", "csls_k", "block",
                                   "fused", "interpret", "manh_cached"))
def _rank_and_argmax(embed1, embed2, gold_cols, metric, normalize,
                     csls_k, block, fused, interpret, manh_cached):
    embed1 = jnp.asarray(embed1)
    embed2 = jnp.asarray(embed2)
    if normalize:
        embed1 = l2_normalize(embed1)
        embed2 = l2_normalize(embed2)
        metric = "inner" if metric == "cosine" else metric

    if metric in ("manhattan", "cityblock") and csls_k == 0 and fused:
        # fused Pallas distance+rank kernel: the full [n1, n2] cityblock
        # matrix never materializes (ops/pallas_kernels.py)
        from openea_tpu.ops.pallas_kernels import manhattan_rank
        return manhattan_rank(embed1, embed2, gold_cols.astype(jnp.int32),
                              interpret=interpret)

    if metric in ("inner", "euclidean") and fused:
        # fused MXU matmul + rank counting: each sim tile feeds the
        # counters in VMEM instead of round-tripping a [block, n2] slab
        # through HBM (ops/pallas_kernels.inner_rank_both).  bf16 inputs
        # (compute_dtype='bfloat16' opt-in) keep bf16 tiles + default-
        # precision dots for the 2x MXU rate.
        from openea_tpu.ops.pallas_kernels import inner_rank_both
        gold = gold_cols.astype(jnp.int32)
        prec = ("default" if (embed1.dtype == jnp.bfloat16
                              and embed2.dtype == jnp.bfloat16) else "highest")
        if csls_k > 0:
            # csls_k > 0 in rank_and_argmax means: rank under CSLS only
            r2k = blocked_row_topk_means(embed2, embed1, csls_k, block,
                                         metric, False, fused=fused,
                                         interpret=interpret)
            _, _, rk2, best2 = inner_rank_both(embed1, embed2, gold,
                                               r2=r2k, r2_gold=r2k[gold],
                                               metric=metric,
                                               precision=prec,
                                               interpret=interpret)
            return rk2, best2
        rk, best, _, _ = inner_rank_both(embed1, embed2, gold, csls=False,
                                         metric=metric, precision=prec,
                                         interpret=interpret)
        return rk, best

    if metric in ("manhattan", "cityblock") and csls_k > 0 and fused:
        gold = gold_cols.astype(jnp.int32)
        if manh_cached:
            from openea_tpu.ops.pallas_kernels import (
                manhattan_rank_both_cached)
            _, _, rk2, best2 = manhattan_rank_both_cached(
                embed1, embed2, gold, k=csls_k, interpret=interpret)
            return rk2, best2
        from openea_tpu.ops.pallas_kernels import manhattan_rank_both
        r2k = blocked_row_topk_means(embed2, embed1, csls_k, block,
                                     metric, False, fused=fused,
                                     interpret=interpret)
        _, _, rk2, best2 = manhattan_rank_both(embed1, embed2, gold,
                                               r2=r2k, r2_gold=r2k[gold],
                                               interpret=interpret)
        return rk2, best2

    r1 = r2 = None
    if csls_k > 0:
        r1 = blocked_row_topk_means(embed1, embed2, csls_k, block, metric, False)
        r2 = blocked_row_topk_means(embed2, embed1, csls_k, block, metric, False)

    n1, n2 = embed1.shape[0], embed2.shape[0]
    nb = -(-n1 // block)
    pad = nb * block - n1
    e1p = jnp.concatenate([embed1, jnp.zeros((pad, embed1.shape[1]), embed1.dtype)]) if pad else embed1
    goldp = jnp.concatenate([gold_cols.astype(jnp.int32),
                             jnp.zeros((pad,), jnp.int32)]) if pad else gold_cols.astype(jnp.int32)
    r1p = None
    if r1 is not None:
        r1p = jnp.concatenate([r1, jnp.zeros((pad,), r1.dtype)]) if pad else r1

    col_idx = jnp.arange(n2, dtype=jnp.int32)

    def one(args):
        rows, gold = args[0], args[1]
        s = _pairwise(rows, embed2, metric, False)
        if csls_k > 0:
            s = 2.0 * s - args[2][:, None] - r2[None, :]
        gold_val = jnp.take_along_axis(s, gold[:, None], axis=1)      # [b,1]
        # exclude the gold column from the count: XLA may rematerialize
        # the fused sim expression with different rounding on the gather
        # side vs the comparison side (one-ulp drift), making the gold
        # column compare greater than "itself" and inflating every rank
        # by 1 (caught by tests/test_dispatch_fused.py; the Pallas
        # kernels exclude it by construction)
        not_gold = col_idx[None, :] != gold[:, None]
        greater = jnp.sum(((s > gold_val) & not_gold).astype(jnp.int32),
                          axis=1)
        tie_before = jnp.sum(((s == gold_val) &
                              (col_idx[None, :] < gold[:, None])).astype(jnp.int32), axis=1)
        rank_index = greater + tie_before
        best = jnp.argmax(s, axis=1).astype(jnp.int32)
        return rank_index, best

    blocks = (e1p.reshape(nb, block, e1p.shape[1]),
              goldp.reshape(nb, block))
    if csls_k > 0:
        blocks = blocks + (r1p.reshape(nb, block),)
    ranks, best = jax.lax.map(one, blocks)
    return ranks.reshape(-1)[:n1], best.reshape(-1)[:n1]


def rank_and_argmax_both(embed1: jax.Array, embed2: jax.Array,
                         gold_cols: jax.Array, metric: str = "inner",
                         normalize: bool = False, csls_k: int = 10,
                         block: int = 4096):
    """Plain AND CSLS exact ranks in ONE blocked similarity pass:
    (ranks, best, ranks_csls, best_csls).  The reference's test() prints
    both metric families (alignment.py:69-80); computing them together
    halves the similarity FLOPs and the device round trips.

    Dispatch is resolved outside jit (see rank_and_argmax)."""
    if csls_k <= 0:
        raise ValueError("rank_and_argmax_both requires csls_k > 0 "
                         "(use rank_and_argmax for plain-only ranking)")
    return _rank_and_argmax_both(embed1, embed2, gold_cols, metric=metric,
                                 normalize=normalize, csls_k=csls_k,
                                 block=block, fused=dispatch.use_fused(),
                                 interpret=dispatch.interpret_mode(),
                                 manh_cached=_manhattan_cache_fits(
                                     embed1.shape[0], embed2.shape[0]))


@partial(jax.jit, static_argnames=("metric", "normalize", "csls_k", "block",
                                   "fused", "interpret", "manh_cached"))
def _rank_and_argmax_both(embed1, embed2, gold_cols, metric, normalize,
                          csls_k, block, fused, interpret, manh_cached):
    embed1 = jnp.asarray(embed1)
    embed2 = jnp.asarray(embed2)
    if normalize:
        embed1 = l2_normalize(embed1)
        embed2 = l2_normalize(embed2)
        metric = "inner" if metric == "cosine" else metric

    if metric in ("inner", "euclidean", "manhattan", "cityblock") and fused:
        # one fused pass serves BOTH families; the r1 row statistic
        # cancels from the CSLS comparisons, saving its whole top-k pass
        from openea_tpu.ops.pallas_kernels import (inner_rank_both,
                                                   manhattan_rank_both)
        gold = gold_cols.astype(jnp.int32)
        if metric in ("manhattan", "cityblock"):
            if manh_cached:
                # one VPU distance pass total: r2 AND both rank families
                # stream the cached HBM matrix (pallas_kernels section
                # comment; falls back to two passes past the HBM budget)
                from openea_tpu.ops.pallas_kernels import (
                    manhattan_rank_both_cached)
                return manhattan_rank_both_cached(embed1, embed2, gold,
                                                  k=csls_k,
                                                  interpret=interpret)
            r2k = blocked_row_topk_means(embed2, embed1, csls_k, block,
                                         metric, False, fused=fused,
                                         interpret=interpret)
            return manhattan_rank_both(embed1, embed2, gold, r2=r2k,
                                       r2_gold=r2k[gold],
                                       interpret=interpret)
        r2k = blocked_row_topk_means(embed2, embed1, csls_k, block,
                                     metric, False, fused=fused,
                                     interpret=interpret)
        prec = ("default" if (embed1.dtype == jnp.bfloat16
                              and embed2.dtype == jnp.bfloat16)
                else "highest")
        return inner_rank_both(embed1, embed2, gold, r2=r2k,
                               r2_gold=r2k[gold], metric=metric,
                               precision=prec, interpret=interpret)

    r1 = blocked_row_topk_means(embed1, embed2, csls_k, block, metric, False)
    r2 = blocked_row_topk_means(embed2, embed1, csls_k, block, metric, False)

    n1, n2 = embed1.shape[0], embed2.shape[0]
    nb = -(-n1 // block)
    pad = nb * block - n1
    e1p = jnp.concatenate([embed1, jnp.zeros((pad, embed1.shape[1]),
                                             embed1.dtype)]) if pad else embed1
    goldp = jnp.concatenate([gold_cols.astype(jnp.int32),
                             jnp.zeros((pad,), jnp.int32)]) if pad \
        else gold_cols.astype(jnp.int32)
    r1p = jnp.concatenate([r1, jnp.zeros((pad,), r1.dtype)]) if pad else r1
    col_idx = jnp.arange(n2, dtype=jnp.int32)

    def rank_of(s, gold):
        gold_val = jnp.take_along_axis(s, gold[:, None], axis=1)
        # gold column excluded: see the rank_and_argmax fallback comment
        # (XLA rematerialization can make gold compare greater than itself)
        not_gold = col_idx[None, :] != gold[:, None]
        greater = jnp.sum(((s > gold_val) & not_gold).astype(jnp.int32),
                          axis=1)
        ties = jnp.sum(((s == gold_val)
                        & (col_idx[None, :] < gold[:, None])).astype(jnp.int32),
                       axis=1)
        return greater + ties, jnp.argmax(s, axis=1).astype(jnp.int32)

    def one(args):
        rows, gold, r1b = args
        s = _pairwise(rows, embed2, metric, False)
        rk, best = rank_of(s, gold)
        rk_c, best_c = rank_of(2.0 * s - r1b[:, None] - r2[None, :], gold)
        return rk, best, rk_c, best_c

    ranks, best, ranks_c, best_c = jax.lax.map(
        one, (e1p.reshape(nb, block, e1p.shape[1]),
              goldp.reshape(nb, block), r1p.reshape(nb, block)))
    return (ranks.reshape(-1)[:n1], best.reshape(-1)[:n1],
            ranks_c.reshape(-1)[:n1], best_c.reshape(-1)[:n1])


def metrics_from_ranks(rank_index, top_k) -> Tuple[list, float, float]:
    """Hits@k (%, rounded to 3 like the reference), MR, MRR from 0-based
    rank indices."""
    import numpy as np
    ri = np.asarray(rank_index)
    n = len(ri)
    hits = [round(float((ri < k).sum()) / n * 100, 3) for k in top_k]
    mr = float((ri + 1).sum()) / n
    mrr = float((1.0 / (ri + 1)).sum()) / n
    return hits, mr, mrr
