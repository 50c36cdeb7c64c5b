"""Alignment evaluation façade.

Same contract and log-line format as the reference
(modules/finding/evaluation.py:6-33 + alignment.py:13-84) so downstream
log-parsing tooling works unchanged, but ranking runs entirely on device:
blocked similarity + exact ranks (no argsort, no process pool).  `accurate`
vs quick mode in the reference trades argsort for argpartition; on TPU the
exact rank is the cheap path, so both modes report exact numbers (quick mode
keeps the reference's reduced printout).
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from openea_tpu.ops.ranking import rank_and_argmax, metrics_from_ranks

# Candidate count past which mesh eval switches from row-sharded (each
# device holds ALL n2 candidate rows) to the 2-D ring form (candidate
# blocks rotate over ICI; peak per-device memory [n1/S, n2/S]).  At the
# default dim<=512 f32, 2M replicated rows ≈ 4 GB/device — near the v5e
# HBM comfort limit once the sim block is added.  Tunable per call.
RING_EVAL_THRESHOLD = 2_000_000


def greedy_alignment(embed1, embed2, top_k, nums_threads=1, metric="inner",
                     normalize=False, csls_k=0, accurate=True,
                     block=4096, compute_dtype=None,
                     mesh=None,
                     ring_threshold=RING_EVAL_THRESHOLD
                     ) -> Tuple[set, float, float, float]:
    """Row i of embed1 is gold-aligned to row i of embed2's first n1 rows.

    Returns (alignment_rest as {(i, argmax_i)}, hits@1, MR, MRR).
    `nums_threads` is accepted for reference API compat and ignored.
    ``compute_dtype='bfloat16'`` runs the similarity matmuls in bf16
    (2x MXU throughput; rank flips only between candidates within bf16
    epsilon of each other).  ``mesh`` (a 1-D Mesh) row-shards the ranking
    pass over every device (parallel/eval_sharded.py).
    """
    t = time.time()
    if compute_dtype == "bfloat16" and metric in ("inner", "cosine"):
        embed1 = jnp.asarray(embed1, jnp.bfloat16)
        embed2 = jnp.asarray(embed2, jnp.bfloat16)
    n1 = embed1.shape[0]
    gold = jnp.arange(n1, dtype=jnp.int32)
    if mesh is not None:
        from openea_tpu.parallel.eval_sharded import (
            ring_rank_and_argmax, sharded_rank_and_argmax)
        # past ring_threshold candidates the replicated block itself gets
        # heavy (each device holds all n2 rows regardless of mesh size):
        # switch to the 2-D ring form (both axes sharded, candidate blocks
        # rotate over ICI via ppermute; [n1/S, n2/S] peak per device)
        if int(embed2.shape[0]) >= ring_threshold:
            ranks, best = ring_rank_and_argmax(
                mesh, embed1, embed2, np.asarray(gold), metric=metric,
                normalize=normalize, csls_k=csls_k, block=min(block, 2048))
        else:
            ranks, best = sharded_rank_and_argmax(
                mesh, embed1, embed2, np.asarray(gold), metric=metric,
                normalize=normalize, csls_k=csls_k, block=min(block, 2048))
    else:
        ranks, best = rank_and_argmax(jnp.asarray(embed1),
                                      jnp.asarray(embed2),
                                      gold, metric=metric,
                                      normalize=normalize,
                                      csls_k=csls_k, block=block)
    ranks = np.asarray(ranks)
    best = np.asarray(best)
    hits, mr, mrr = metrics_from_ranks(ranks, top_k)
    alignment_rest = set(zip(range(n1), best.tolist()))
    cost = time.time() - t
    hits_arr = np.array(hits)
    if accurate:
        if csls_k > 0:
            print("accurate results with csls: csls={}, hits@{} = {}%, mr = {:.3f}, "
                  "mrr = {:.6f}, time = {:.3f} s ".format(csls_k, top_k, hits_arr, mr, mrr, cost))
        else:
            print("accurate results: hits@{} = {}%, mr = {:.3f}, mrr = {:.6f}, "
                  "time = {:.3f} s ".format(top_k, hits_arr, mr, mrr, cost))
    else:
        if csls_k > 0:
            print("quick results with csls: csls={}, hits@{} = {}%, time = {:.3f} s "
                  .format(csls_k, top_k, hits_arr, cost))
        else:
            print("quick results: hits@{} = {}%, time = {:.3f} s ".format(top_k, hits_arr, cost))
    return alignment_rest, hits[0], mr, mrr


def valid(embeds1, embeds2, mapping, top_k, threads_num=1, metric="inner",
          normalize=False, csls_k=0, accurate=False, compute_dtype=None,
          mesh=None, ring_threshold=RING_EVAL_THRESHOLD):
    if mapping is not None:
        embeds1 = jnp.asarray(embeds1) @ jnp.asarray(mapping)
    _, hits1_12, mr_12, mrr_12 = greedy_alignment(
        embeds1, embeds2, top_k, threads_num, metric, normalize, csls_k,
        accurate, compute_dtype=compute_dtype, mesh=mesh,
        ring_threshold=ring_threshold)
    return hits1_12, mrr_12


def test(embeds1, embeds2, mapping, top_k, threads_num=1, metric="inner",
         normalize=False, csls_k=0, accurate=True, compute_dtype=None,
         mesh=None, ring_threshold=RING_EVAL_THRESHOLD):
    if mapping is not None:
        embeds1 = jnp.asarray(embeds1) @ jnp.asarray(mapping)
    alignment_rest_12, hits1_12, mr_12, mrr_12 = greedy_alignment(
        embeds1, embeds2, top_k, threads_num, metric, normalize, csls_k,
        accurate, compute_dtype=compute_dtype, mesh=mesh,
        ring_threshold=ring_threshold)
    return alignment_rest_12, hits1_12, mrr_12


def test_both(embeds1, embeds2, mapping, top_k, threads_num=1,
              metric="inner", normalize=False, csls_k=10,
              compute_dtype=None, mesh=None):
    """test() with BOTH metric families (plain + CSLS) from one blocked
    similarity pass and one device round trip; prints the reference's
    two 'accurate results' lines.  Returns (alignment_rest_12, hits1,
    mrr) of the plain metrics, like test(csls_k=0)."""
    if mesh is not None or csls_k <= 0:
        # sharded path keeps the two-call form (manhattan included the
        # fused family since r4: rank_and_argmax_both serves it through
        # the cached-distance / two-pass kernels in ONE call)
        rest_12, hits1, mrr = test(embeds1, embeds2, mapping, top_k,
                                   threads_num, metric, normalize, 0, True,
                                   compute_dtype, mesh)
        if csls_k > 0:
            test(embeds1, embeds2, mapping, top_k, threads_num, metric,
                 normalize, csls_k, True, compute_dtype, mesh)
        return rest_12, hits1, mrr
    from openea_tpu.ops.ranking import rank_and_argmax_both
    t = time.time()
    if mapping is not None:
        embeds1 = jnp.asarray(embeds1) @ jnp.asarray(mapping)
    if compute_dtype == "bfloat16" and metric in ("inner", "cosine"):
        embeds1 = jnp.asarray(embeds1, jnp.bfloat16)
        embeds2 = jnp.asarray(embeds2, jnp.bfloat16)
    n1 = embeds1.shape[0]
    gold = jnp.arange(n1, dtype=jnp.int32)
    ranks, best, ranks_c, best_c = rank_and_argmax_both(
        jnp.asarray(embeds1), jnp.asarray(embeds2), gold, metric=metric,
        normalize=normalize, csls_k=csls_k)
    ranks = np.asarray(ranks)
    best = np.asarray(best)
    hits, mr, mrr = metrics_from_ranks(ranks, top_k)
    cost = time.time() - t
    print("accurate results: hits@{} = {}%, mr = {:.3f}, mrr = {:.6f}, "
          "time = {:.3f} s ".format(top_k, np.array(hits), mr, mrr, cost))
    t2 = time.time()
    hits_c, mr_c, mrr_c = metrics_from_ranks(np.asarray(ranks_c), top_k)
    print("accurate results with csls: csls={}, hits@{} = {}%, mr = {:.3f}, "
          "mrr = {:.6f}, time = {:.3f} s ".format(
              csls_k, top_k, np.array(hits_c), mr_c, mrr_c,
              time.time() - t2))
    alignment_rest_12 = set(zip(range(n1), best.tolist()))
    return alignment_rest_12, hits[0], mrr


def early_stop(flag1, flag2, flag):
    """Stop when the metric fell twice in a row (reference evaluation.py:28)."""
    if flag <= flag2 <= flag1:
        print("\n == should early stop == \n")
        return flag2, flag, True
    return flag2, flag, False
