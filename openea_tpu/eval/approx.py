"""Approximate large-scale alignment eval via LSH candidate blocking
(the analog of the reference's faiss evaluator, dbp2.0/eval_faiss.py:25-66,
and the intended consumer of the blocking module, modules/blocking/).

Exact blocked ranking (ops/ranking) is O(n1*n2) per eval; beyond ~1M
candidates, hash to buckets first: rank each query only against the union
of its LSH buckets (hashing is one device matmul), counting non-candidates
as ranked below.  Hits@k are exact whenever the true match falls in the
candidate set — report the candidate recall alongside.
"""

from __future__ import annotations

import numpy as np

from openea_tpu.ops.blocking import LSHBlocker
from openea_tpu.ops.ranking import metrics_from_ranks


def approx_greedy_eval(embed1, embed2, top_k, hash_size: int = 12,
                       num_tables: int = 8, seed: int = 0,
                       normalize: bool = True):
    """(hits@k list, MR lower bound, MRR, candidate_recall); gold is the
    diagonal, as in greedy_alignment."""
    e1 = np.asarray(embed1, np.float32)
    e2 = np.asarray(embed2, np.float32)
    if normalize:
        e1 = e1 / np.maximum(np.linalg.norm(e1, axis=1, keepdims=True), 1e-12)
        e2 = e2 / np.maximum(np.linalg.norm(e2, axis=1, keepdims=True), 1e-12)
    n1 = len(e1)
    blocker = LSHBlocker(hash_size, e1.shape[1], num_tables, seed=seed)
    blocker.index(e2, list(range(len(e2))))
    cands = blocker.query(e1)

    ranks = np.zeros(n1, np.int64)
    hit = 0
    for i, cand in enumerate(cands):
        if i in cand:
            hit += 1
        gold_sim = float(e1[i] @ e2[i])
        if cand:
            idx = np.fromiter(cand, np.int64)
            sims = e1[i] @ e2[idx].T
            # gold's rank among retrieved candidates (gold itself excluded)
            ranks[i] = int(((sims > gold_sim) & (idx != i)).sum())
        else:
            ranks[i] = 0
    hits, mr, mrr = metrics_from_ranks(ranks, list(top_k))
    recall = hit / max(n1, 1)
    print("approx (lsh) results: hits@{} = {}%, mr>= {:.3f}, mrr<= {:.6f}, "
          "cand recall = {:.3f}".format(list(top_k), hits, mr, mrr, recall))
    return hits, mr, mrr, recall
