"""Multi-chip sharded alignment evaluation (incl. CSLS).

The N1 x N2 similarity/ranking pass is embarrassingly row-parallel: shard
the query rows over every device (ICI), replicate the candidate block, and
compute exact ranks shard-locally — the scaling-book recipe of
annotate-shardings-and-let-XLA-partition, applied via shard_map for
explicitness.  This is the multi-chip form of ops/ranking.rank_and_argmax
(the reference's equivalent is a host multiprocessing.Pool over rows,
modules/finding/alignment.py:44-61).

CSLS (reference modules/finding/similarity.py:57-83) needs two global
statistics:

* r1[i] — mean top-k similarity of query row i against ALL candidates:
  shard-local (each shard holds full candidate block).
* r2[j] — mean top-k similarity of candidate j against ALL query rows:
  the query axis is sharded, so each shard computes its LOCAL per-candidate
  top-k [n2, k], one all_gather over 'x' combines them to [S*k] per
  candidate, and a second top-k reduces to the exact global top-k.  The
  collective moves O(S * n2 * k) floats — k/n1-th of the full matrix.

Row blocks bound peak memory to [block, n2] per shard, so 100K-scale
(70K x 70K) never materializes a full shard slab.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from openea_tpu.ops.initializers import l2_normalize
from openea_tpu.ops.ranking import metrics_from_ranks
from openea_tpu.ops.similarity import _pairwise

_NEG = jnp.float32(-1e30)


def eval_mesh(devices=None) -> Mesh:
    """1-D mesh over all devices for row-sharded eval."""
    devs = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devs), ("x",))


@lru_cache(maxsize=32)
def _row_topk_fn(mesh: Mesh, k: int, block: int, approx: bool):
    """Jitted shard_map for sharded_row_topk, cached per (mesh, k, block,
    approx) so repeated bootstrapping rounds / neighbor regenerations hit
    jax's trace cache instead of retracing a fresh closure every call."""

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P("x", None), P(None, None)),
             out_specs=(P("x", None), P("x", None)))
    def run(rows, table):
        nb = -(-rows.shape[0] // block)
        bpad = nb * block - rows.shape[0]
        rp = (jnp.concatenate([rows, jnp.zeros((bpad, rows.shape[1]),
                                               rows.dtype)])
              if bpad else rows)

        def one(rr):
            s = rr @ table.T
            if approx:
                return jax.lax.approx_max_k(s, k, recall_target=0.95)
            return jax.lax.top_k(s, k)

        vals, idx = jax.lax.map(one, rp.reshape(nb, -1, rp.shape[1]))
        return (vals.reshape(-1, k)[:rows.shape[0]],
                idx.reshape(-1, k)[:rows.shape[0]])

    return jax.jit(run)


def sharded_row_topk(mesh: Mesh, e1: jax.Array, e2: jax.Array, k: int,
                     block: int = 2048) -> Tuple[jax.Array, jax.Array]:
    """Row top-k of e1 @ e2.T with the query rows sharded over the 1-D
    eval mesh and e2 replicated — the multi-chip form of
    ops/bootstrapping._blocked_topk / ops/neighbors.top_k_neighbors
    (reference's ray-actor eval pool, bootea.py:214-228 + batch.py:122-165).
    Embarrassingly row-parallel: no collectives at all; each shard block-
    loops its rows against the resident candidate table."""
    k = min(k, e2.shape[0])
    n1 = e1.shape[0]
    S = mesh.size
    per = -(-n1 // S)
    pad = per * S - n1
    if pad:
        e1 = jnp.concatenate([e1, jnp.zeros((pad, e1.shape[1]), e1.dtype)])
    approx = k > 64 and jax.devices()[0].platform == "tpu"
    vals, idx = _row_topk_fn(mesh, int(k), int(block), approx)(e1, e2)
    return vals[:n1], idx[:n1]


def _row_blocks(x: jax.Array, block: int):
    """[m, ...] -> [nb, block, ...] zero-padded."""
    m = x.shape[0]
    nb = -(-m // block)
    pad = nb * block - m
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return x.reshape((nb, block) + x.shape[1:]), nb, pad


def sharded_rank_and_argmax(mesh: Mesh, embed1, embed2, gold_cols,
                            metric: str = "inner", normalize: bool = False,
                            csls_k: int = 0, block: int = 2048,
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """Exact 0-based rank of gold + argmax column per row, rows sharded
    over the mesh's 'x' axis.  Matches ops/ranking.rank_and_argmax
    (same tie-breaking: stable descending argsort order)."""
    n1 = int(embed1.shape[0])
    n_dev = mesh.size
    m = -(-n1 // n_dev)                      # rows per shard
    pad = m * n_dev - n1
    e1 = np.asarray(embed1, np.float32)
    gold = np.asarray(gold_cols, np.int32)
    valid = np.ones(n1, np.float32)
    if pad:
        e1 = np.concatenate([e1, np.zeros((pad, e1.shape[1]), np.float32)])
        gold = np.concatenate([gold, np.zeros(pad, np.int32)])
        valid = np.concatenate([valid, np.zeros(pad, np.float32)])
    e2 = jnp.asarray(embed2, jnp.float32)
    n2 = int(e2.shape[0])
    blk = min(block, m)
    k = min(csls_k, m * n_dev, n2) if csls_k > 0 else 0
    col_idx = jnp.arange(n2, dtype=jnp.int32)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P("x", None), P(None, None), P("x"), P("x")),
             out_specs=(P("x"), P("x")))
    def local(e1s, e2r, golds, val):
        a, b = e1s, e2r
        if normalize:
            a, b = l2_normalize(a), l2_normalize(b)
        met = "inner" if (normalize and metric == "cosine") else metric
        m_local = a.shape[0]
        a_blocks, nb, _ = _row_blocks(a, blk)
        v_blocks, _, _ = _row_blocks(val, blk)

        r1 = r2 = None
        if k > 0:
            # pass 1: row means of top-k (shard-local) + local column top-k
            def stat_blk(carry, xs):
                rows, v = xs
                s = _pairwise(rows, b, met, False)
                # padded rows must not contribute to column stats
                s_masked = jnp.where(v[:, None] > 0, s, _NEG)
                top_r, _ = jax.lax.top_k(s, k)
                cand = jnp.concatenate([carry, s_masked.T], axis=1)
                carry, _ = jax.lax.top_k(cand, k)            # [n2, k]
                return carry, jnp.mean(top_r, axis=1)

            # mark the init as device-varying so the scan carry types match
            col_top0 = jax.lax.pcast(jnp.full((n2, k), _NEG), ("x",),
                                     to="varying")
            col_top, r1_blocks = jax.lax.scan(
                stat_blk, col_top0, (a_blocks, v_blocks))
            r1 = r1_blocks.reshape(-1)
            # exact global top-k per candidate: gather every shard's local
            # top-k and reduce
            gathered = jax.lax.all_gather(col_top, "x", axis=0)  # [S, n2, k]
            merged = jnp.swapaxes(gathered, 0, 1).reshape(n2, -1)
            g_top, _ = jax.lax.top_k(merged, k)
            r2 = jnp.mean(g_top, axis=1)                         # [n2]

        def rank_blk(args):
            rows, g = args[0], args[1]
            s = _pairwise(rows, b, met, False)
            if k > 0:
                s = 2.0 * s - args[2][:, None] - r2[None, :]
            gv = jnp.take_along_axis(s, g[:, None].astype(jnp.int32), axis=1)
            greater = jnp.sum((s > gv).astype(jnp.int32), axis=1)
            ties = jnp.sum(((s == gv)
                            & (col_idx[None, :] < g[:, None])).astype(jnp.int32),
                           axis=1)
            return greater + ties, jnp.argmax(s, axis=1).astype(jnp.int32)

        g_blocks, _, _ = _row_blocks(golds, blk)
        args = (a_blocks, g_blocks)
        if k > 0:
            args = args + (r1.reshape(nb, blk),)
        ranks, best = jax.lax.map(rank_blk, args)
        return ranks.reshape(-1)[:m_local], best.reshape(-1)[:m_local]

    fn = jax.jit(local)
    ranks, best = fn(jnp.asarray(e1), e2, jnp.asarray(gold),
                     jnp.asarray(valid))
    return np.asarray(ranks)[:n1], np.asarray(best)[:n1]


def ring_rank_and_argmax(mesh: Mesh, embed1, embed2, gold_cols,
                         metric: str = "inner", normalize: bool = False,
                         csls_k: int = 0, block: int = 2048,
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """2-D ring-sharded exact ranking: BOTH axes sharded.  Each device
    holds one query block and one candidate block; candidate blocks (and
    their traveling CSLS top-k stats) rotate around the ring via ppermute,
    so no device ever materializes more than [n1/S, n2/S] similarity and
    the candidate matrix is never replicated — the 'sequence-parallel
    equivalent' of SURVEY.md §5 for graph-scale N x N similarity (the
    reference's version is host row-blocking, similarity.py:119).

    Bit-compatible with ops/ranking.rank_and_argmax (same _pairwise
    blocks, same tie-breaking, same CSLS transform), verified by test.

    Two ring passes: pass A extracts the gold similarity per row from the
    ring's own blocks (bit-consistency) and, for CSLS, the exact per-row
    (r1) and per-candidate (r2) top-k means — r2's top-k carry travels
    WITH its candidate block, arriving home exact after the full cycle.
    Pass B counts entries above gold, ties below, and the argmax."""
    S = mesh.size
    n1, dim = int(embed1.shape[0]), int(embed1.shape[1])
    n2 = int(embed2.shape[0])
    m = -(-n1 // S)                       # query rows per shard
    m2 = -(-n2 // S)                      # candidate rows per shard
    e1 = np.zeros((m * S, dim), np.float32)
    e1[:n1] = np.asarray(embed1, np.float32)
    e2 = np.zeros((m2 * S, dim), np.float32)
    e2[:n2] = np.asarray(embed2, np.float32)
    gold = np.zeros(m * S, np.int32)
    gold[:n1] = np.asarray(gold_cols, np.int32)
    qval = np.zeros(m * S, np.float32)
    qval[:n1] = 1.0
    cval = np.zeros(m2 * S, np.float32)
    cval[:n2] = 1.0
    k = min(csls_k, n1, n2) if csls_k > 0 else 0
    blk = min(block, m)
    met = "inner" if (normalize and metric == "cosine") else metric
    perm = [(i, (i + 1) % S) for i in range(S)]
    rot = lambda x: jax.lax.ppermute(x, "x", perm)
    loc_idx = jnp.arange(m2, dtype=jnp.int32)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P("x", None), P("x", None), P("x"), P("x"), P("x")),
             out_specs=(P("x"), P("x"), P("x")))
    def ring(e1s, e2s, golds, qv, cv):
        a = l2_normalize(e1s) if normalize else e1s
        c_home = l2_normalize(e2s) if normalize else e2s
        me = jax.lax.axis_index("x")
        a_blocks, nb, _ = _row_blocks(a, blk)
        g_blocks, _, _ = _row_blocks(golds, blk)
        qv_blocks, _, _ = _row_blocks(qv, blk)

        # ---- pass A: gold values (+ CSLS r1/r2) --------------------- #
        def stepA(t, st):
            C, cvb, r2top, r1top, gv = st
            base = (jnp.mod(me - t, S) * m2).astype(jnp.int32)

            def inner(r2c, xs):
                rows, gb, qvb, r1t, gvr = xs
                s = _pairwise(rows, C, met, False)            # [blk, m2]
                lg = (gb - base).astype(jnp.int32)
                in_blk = (lg >= 0) & (lg < m2)
                v = jnp.take_along_axis(
                    s, jnp.clip(lg, 0, m2 - 1)[:, None], axis=1)[:, 0]
                gvr = jnp.where(in_blk, v, gvr)
                if k > 0:
                    sc = jnp.where(cvb[None, :] > 0, s, _NEG)
                    top_r, _ = jax.lax.top_k(sc, k)
                    r1t, _ = jax.lax.top_k(
                        jnp.concatenate([r1t, top_r], axis=1), k)
                    sq = jnp.where(qvb[:, None] > 0, s, _NEG)
                    r2c, _ = jax.lax.top_k(
                        jnp.concatenate([r2c, sq.T], axis=1), k)
                return r2c, (r1t, gvr)

            r2c0 = jax.lax.pcast(jnp.full((m2, max(k, 1)), _NEG), ("x",),
                                 to="varying")
            r2c, (r1top, gv) = jax.lax.scan(
                inner, r2c0, (a_blocks, g_blocks, qv_blocks, r1top, gv))
            if k > 0:
                r2top, _ = jax.lax.top_k(
                    jnp.concatenate([r2top, r2c], axis=1), k)
            return (rot(C), rot(cvb), rot(r2top), r1top, gv)

        # mark freshly-created carries device-varying (scan-vma rule)
        vary = lambda x: jax.lax.pcast(x, ("x",), to="varying")
        stA = (c_home, cv, vary(jnp.full((m2, max(k, 1)), _NEG)),
               vary(jnp.full((nb, blk, max(k, 1)), _NEG)),
               vary(jnp.zeros((nb, blk), jnp.float32)))
        _, _, r2top, r1top, gv = jax.lax.fori_loop(0, S, stepA, stA)
        mloc = a.shape[0]
        r1 = jnp.mean(r1top, axis=-1).reshape(-1)[:mloc]      # [m]
        r2 = jnp.mean(r2top, axis=-1)                         # [m2]
        return gv.reshape(-1)[:mloc], r2, r1

    e1j, e2j = jnp.asarray(e1), jnp.asarray(e2)
    goldj, qvj, cvj = jnp.asarray(gold), jnp.asarray(qval), jnp.asarray(cval)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P("x", None), P("x", None), P("x"), P("x"), P("x"),
                       P("x"), P("x"), P("x")),
             out_specs=(P("x"), P("x")))
    def ringB(e1s, e2s, golds, qv, cv, gvB, r1s, r2s):
        a = l2_normalize(e1s) if normalize else e1s
        c_home = l2_normalize(e2s) if normalize else e2s
        me = jax.lax.axis_index("x")
        a_blocks, nb, _ = _row_blocks(a, blk)
        g_blocks, _, _ = _row_blocks(golds, blk)
        gv_blocks, _, _ = _row_blocks(gvB, blk)
        r1_blocks, _, _ = _row_blocks(r1s, blk)

        def stepB(t, st):
            C, cvb, r2b, greater, ties, bestv, bestc = st
            base = (jnp.mod(me - t, S) * m2).astype(jnp.int32)
            gcol = base + loc_idx

            def inner(_, xs):
                rows, gb, gvr, r1t, gr, ti, bv, bc = xs
                s = _pairwise(rows, C, met, False)
                if k > 0:
                    s = 2.0 * s - r1t[:, None] - r2b[None, :]
                s = jnp.where(cvb[None, :] > 0, s, _NEG)
                gr = gr + jnp.sum((s > gvr[:, None]).astype(jnp.int32), axis=1)
                ti = ti + jnp.sum(((s == gvr[:, None])
                                   & (gcol[None, :] < gb[:, None])
                                   ).astype(jnp.int32), axis=1)
                v = jnp.max(s, axis=1)
                c = base + jnp.argmax(s, axis=1).astype(jnp.int32)
                better = (v > bv) | ((v == bv) & (c < bc))
                return None, (jnp.where(better, v, bv),
                              jnp.where(better, c, bc), gr, ti)

            _, (bestv, bestc, greater, ties) = jax.lax.scan(
                inner, None, (a_blocks, g_blocks, gv_blocks, r1_blocks,
                              greater, ties, bestv, bestc))
            return (rot(C), rot(cvb), rot(r2b), greater, ties, bestv, bestc)

        vary = lambda x: jax.lax.pcast(x, ("x",), to="varying")
        stB = (c_home, cv, r2s, vary(jnp.zeros((nb, blk), jnp.int32)),
               vary(jnp.zeros((nb, blk), jnp.int32)),
               vary(jnp.full((nb, blk), _NEG)),
               vary(jnp.full((nb, blk), jnp.int32(2**30))))
        _, _, _, greater, ties, _, bestc = jax.lax.fori_loop(0, S, stepB, stB)
        mloc = a.shape[0]
        return ((greater + ties).reshape(-1)[:mloc],
                bestc.reshape(-1)[:mloc])

    @jax.jit
    def run(e1x, e2x, gx, qx, cx):
        gv, r2, r1 = ring(e1x, e2x, gx, qx, cx)
        # transform the gold value exactly as ringB transforms the matrix:
        # csls(s) = 2*s - r1[row] - r2[col]  (gather of sharded r2 -> XLA
        # SPMD inserts the collective)
        gvB = 2.0 * gv - r1 - r2[gx] if k > 0 else gv
        return ringB(e1x, e2x, gx, qx, cx, gvB, r1, r2)

    ranks, best = run(e1j, e2j, goldj, qvj, cvj)
    return np.asarray(ranks)[:n1], np.asarray(best)[:n1]


def sharded_greedy_eval(mesh: Mesh, embed1, embed2, top_k,
                        metric: str = "inner", normalize: bool = False,
                        csls_k: int = 0):
    """(hits@k list, MR, MRR) with rows sharded over the mesh."""
    gold = np.arange(embed1.shape[0], dtype=np.int32)
    ranks, _ = sharded_rank_and_argmax(mesh, embed1, embed2, gold,
                                       metric=metric, normalize=normalize,
                                       csls_k=csls_k)
    return metrics_from_ranks(ranks, list(top_k))
