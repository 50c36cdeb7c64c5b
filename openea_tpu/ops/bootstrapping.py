"""Bootstrapping: pseudo-label mining + conflict editing.

TPU re-design of the reference bootstrapping stack
(modules/bootstrapping/alignment_finder.py:8-151 + approaches/bootea.py:19-121).

The reference materializes the full n1 x n2 similarity matrix on host, then
runs threshold filtering, row-top-k search, and graph-tool/igraph
maximum-weight matching over it.  Here the device computes only a blocked
row-top-k (values + indices) and point gathers of pair similarities, so
host memory stays O(n*k) even at 100K scale; the host keeps only the
small, inherently sequential conflict-resolution steps (greedy
maximum-weight matching — the same objective graph-tool's heuristic
approximates — and the x/y label editing).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, Iterable, List, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openea_tpu.ops.matching import check_new_alignment, mwgm_greedy

Pair = Tuple[int, int]


@partial(jax.jit, static_argnames=("k", "block"))
def _blocked_topk(e1: jax.Array, e2: jax.Array, k: int, block: int):
    """Row top-k of e1 @ e2.T without materializing the full matrix.
    Large k uses approx_max_k on TPU (lax.top_k's lane sort is O(n log n)
    per row and dominates for k >~ 64)."""
    n1 = e1.shape[0]
    nb = -(-n1 // block)
    pad = nb * block - n1
    e1p = jnp.concatenate([e1, jnp.zeros((pad, e1.shape[1]), e1.dtype)]) if pad else e1
    approx = k > 64 and jax.devices()[0].platform == "tpu"

    def one(rows):
        s = rows @ e2.T
        if approx:
            return jax.lax.approx_max_k(s, k, recall_target=0.95)
        return jax.lax.top_k(s, k)

    vals, idx = jax.lax.map(one, e1p.reshape(nb, block, e1p.shape[1]))
    return vals.reshape(-1, k)[:n1], idx.reshape(-1, k)[:n1]


def ref_topk(e1, e2, k: int, block: int = 2048, mesh=None):
    """Host (values, indices) of each ref-row's top-k inner-product match.
    With ``mesh`` (1-D eval mesh), the query rows are sharded over the
    devices — BootEA's bootstrapping sims at multi-chip scale."""
    if mesh is not None:
        from openea_tpu.parallel.eval_sharded import sharded_row_topk
        vals, idx = sharded_row_topk(mesh, jnp.asarray(e1), jnp.asarray(e2),
                                     min(k, e2.shape[0]), block)
    else:
        vals, idx = _blocked_topk(jnp.asarray(e1), jnp.asarray(e2),
                                  min(k, e2.shape[0]), block)
    return np.asarray(vals), np.asarray(idx)


@jax.jit
def _pair_dots(e1: jax.Array, e2: jax.Array, rows: jax.Array,
               cols: jax.Array) -> jax.Array:
    return jnp.sum(e1[rows] * e2[cols], axis=-1)


def pair_sims(e1, e2, pairs: Iterable[Pair]) -> Dict[Pair, float]:
    """Similarity of specific (row, col) pairs via device gather — the
    replacement for random host access into the full sim matrix."""
    pairs = list(pairs)
    if not pairs:
        return {}
    arr = np.asarray(pairs, dtype=np.int32)
    d = _pair_dots(jnp.asarray(e1), jnp.asarray(e2),
                   jnp.asarray(arr[:, 0]), jnp.asarray(arr[:, 1]))
    d = np.asarray(d)
    return {p: float(v) for p, v in zip(pairs, d)}


def find_potential_alignment_mwgm(topk_vals: np.ndarray, topk_idx: np.ndarray,
                                  sim_th: float, k: int
                                  ) -> Optional[Set[Pair]]:
    """Pairs with sim > th AND within row top-k, resolved by greedy
    maximum-weight matching (reference alignment_finder.py:12-53; the
    threshold∩top-k intersection is computed directly from the top-k
    lists — identical to intersecting the two full-matrix sets)."""
    t = time.time()
    kk = min(k, topk_idx.shape[1]) if k > 0 else topk_idx.shape[1]
    rows, cols = np.nonzero(topk_vals[:, :kk] > sim_th)
    if len(rows) == 0:
        return None
    pairs = [(int(r), int(topk_idx[r, c]), float(topk_vals[r, c]))
             for r, c in zip(rows.tolist(), cols.tolist())]
    check_new_alignment({(i, j) for i, j, _ in pairs},
                        context="after filtering by sim and nearest k")
    t1 = time.time()
    selected = mwgm_greedy(pairs)
    check_new_alignment(selected, context="after mwgm")
    print("mwgm costs time: {:.3f} s".format(time.time() - t1))
    print("selecting potential alignment costs time: {:.3f} s".format(time.time() - t))
    return selected


def update_labeled_alignment_x(pre_labeled: Set[Pair], curr_labeled: Set[Pair],
                               sim_of: Dict[Pair, float]) -> Set[Pair]:
    """Merge the new pseudo-labels into the previous ones, keeping for each
    source entity the higher-similarity target (reference bootea.py:35-55;
    ties go to the new label, as there)."""
    labeled = dict(pre_labeled)
    n1 = n2 = 0
    for i, j in curr_labeled:
        if labeled.get(i, -1) == i and j != i:
            n2 += 1
        if i in labeled:
            pre_j = labeled[i]
            if sim_of[(i, j)] >= sim_of[(i, pre_j)]:
                if pre_j == i and j != i:
                    n1 += 1
                labeled[i] = j
        else:
            labeled[i] = j
    print("update wrongly: ", n1, "greedy update wrongly: ", n2)
    out = set(labeled.items())
    check_new_alignment(out, context="after editing (<-)")
    return out


def update_labeled_alignment_y(labeled: Set[Pair],
                               sim_of: Dict[Pair, float]) -> Set[Pair]:
    """Resolve target-side conflicts: each target keeps its most similar
    source (reference bootea.py:57-77)."""
    by_target: Dict[int, List[int]] = {}
    for i, j in labeled:
        by_target.setdefault(j, []).append(i)
    out: Set[Pair] = set()
    for j, i_list in by_target.items():
        if len(i_list) == 1:
            out.add((i_list[0], j))
        else:
            best = max(i_list, key=lambda i: sim_of[(i, j)])
            out.add((best, j))
    check_new_alignment(out, context="after editing (->)")
    return out


def bootstrapping(ref_e1, ref_e2, labeled: Set[Pair], sim_th: float, k: int,
                  block: int = 2048, mesh=None):
    """One bootstrapping round over ref embeddings (already l2-normalized,
    reference bootea.py:214-219 normalizes before the matmul).

    Returns (labeled_alignment, row_indices, col_indices) where the index
    lists are positions into the ref entity lists (the caller maps them to
    global entity ids).  ``mesh``: row-shard the similarity/top-k over the
    device mesh (the reference's ray-actor sim pool, bootea.py:214-228)."""
    vals, idx = ref_topk(ref_e1, ref_e2, max(k, 1), block, mesh=mesh)
    curr = find_potential_alignment_mwgm(vals, idx, sim_th, k)
    if curr is not None:
        need = set(curr)
        for i, j in labeled:
            need.add((i, j))
        # sims for editing: every (i, new_j), (i, pre_j) pair that the
        # editing steps compare
        pre_dict = dict(labeled)
        for i, j in curr:
            if i in pre_dict:
                need.add((i, pre_dict[i]))
        sim_of = pair_sims(ref_e1, ref_e2, need)
        labeled = update_labeled_alignment_x(labeled, curr, sim_of)
        sim_of = pair_sims(ref_e1, ref_e2, labeled)
        labeled = update_labeled_alignment_y(labeled, sim_of)
    if not labeled:
        return labeled, None, None
    rows = [i for i, _ in labeled]
    cols = [j for _, j in labeled]
    return labeled, rows, cols


def generate_supervised_triples(rt_dict1, hr_dict1, rt_dict2, hr_dict2,
                                ents1: Sequence[int], ents2: Sequence[int]):
    """Swap pseudo-labeled entities into each other's triples
    (reference bootea.py:105-121)."""
    assert len(ents1) == len(ents2)
    newly1: List[Tuple[int, int, int]] = []
    newly2: List[Tuple[int, int, int]] = []
    for e1, e2 in zip(ents1, ents2):
        for r, t in rt_dict1.get(e1, set()):
            newly1.append((e2, r, t))
        for h, r in hr_dict1.get(e1, set()):
            newly1.append((h, r, e2))
        for r, t in rt_dict2.get(e2, set()):
            newly2.append((e1, r, t))
        for h, r in hr_dict2.get(e2, set()):
            newly2.append((h, r, e1))
    print("newly triples: {}, {}".format(len(newly1), len(newly2)))
    return newly1, newly2


def calculate_likelihood_rows(n1: int, n2: int, labeled: Optional[Set[Pair]],
                              row_idx: np.ndarray) -> np.ndarray:
    """Rows of the likelihood target matrix for the optional likelihood
    objective (reference bootea.py:80-102): labeled rows are one-hot at
    their label, unlabeled rows uniform 1/n1."""
    mat = np.zeros((len(row_idx), n2), dtype=np.float32)
    lab = dict(labeled) if labeled else {}
    for out_r, i in enumerate(row_idx.tolist()):
        if i in lab:
            mat[out_r, lab[i]] = 1.0
        else:
            mat[out_r, :] = 1.0 / n1
    return mat
