"""Host-side matching algorithms: Gale–Shapley stable matching and
maximum-weight greedy matching for bootstrapping.

These are small (|candidates| ~ N*k) and inherently sequential, so they stay
on host (SURVEY.md §7.1 step 5); their *inputs* (top-k candidate lists,
filtered similarity pairs) are produced on device.

Gale–Shapley follows the textbook suitor-optimal algorithm the reference
ships (modules/finding/alignment.py:171-224); the bootstrapping matcher
replaces igraph/graph-tool maximum-weight bipartite matching
(modules/bootstrapping/alignment_finder.py:83-141) with the same
greedy-by-weight conflict resolution the graph-tool heuristic computes.
"""

from __future__ import annotations

import time
from typing import Dict, List, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openea_tpu.ops.similarity import sim as sim_matrix


def galeshapley(suitor_pref: Dict, reviewer_rank: Dict[Tuple, int],
                max_iteration: int) -> Dict:
    """Suitor-optimal stable matching.

    suitor_pref: suitor -> list of reviewers, best first (may be truncated).
    reviewer_rank: (reviewer, suitor) -> rank (lower is preferred).
    """
    pref = {s: list(p) for s, p in suitor_pref.items()}
    next_choice = {s: 0 for s in pref}
    matching: Dict = {}
    rev_matching: Dict = {}
    free = [s for s in pref if pref[s]]
    for _ in range(max_iteration):
        if not free:
            break
        still_free = []
        for s in free:
            if next_choice[s] >= len(pref[s]):
                continue  # exhausted truncated list -> stays unmatched
            r = pref[s][next_choice[s]]
            if r not in rev_matching:
                matching[s] = r
                rev_matching[r] = s
            else:
                cur = rev_matching[r]
                if reviewer_rank.get((r, s), np.inf) < reviewer_rank.get((r, cur), np.inf):
                    del matching[cur]
                    matching[s] = r
                    rev_matching[r] = s
                    next_choice[cur] += 0  # cur re-proposes next round
                    still_free.append(cur)
                else:
                    next_choice[s] += 1
                    still_free.append(s)
        free = [s for s in still_free if next_choice[s] < len(pref[s])]
    return matching


def stable_alignment(embed1, embed2, metric="inner", normalize=False,
                     csls_k=0, nums_threads=1, cut=100, sim_mat=None) -> float:
    """Stable matching accuracy over gold-diagonal embeddings; prints the
    reference's 'stable alignment precision' line.  Candidate lists are the
    device-computed top-`cut` per row/column (sufficient: Gale–Shapley runs
    at most `cut` proposal rounds in the reference)."""
    t = time.time()
    if sim_mat is None:
        s = sim_matrix(jnp.asarray(embed1), jnp.asarray(embed2),
                       metric=metric, normalize=normalize, csls_k=csls_k)
    else:
        s = jnp.asarray(sim_mat)
    n1, n2 = s.shape
    k1 = min(cut, n2)
    k2 = min(cut, n1)
    if jax.devices()[0].platform == "tpu" and cut > 64:
        # preference lists tolerate approximate top-k; exact lane sort is
        # prohibitively slow at k~100 over large candidate sets
        _, top1 = jax.lax.approx_max_k(s, k1, recall_target=0.95)
        _, top2 = jax.lax.approx_max_k(s.T, k2, recall_target=0.95)
    else:
        _, top1 = jax.lax.top_k(s, k1)      # suitors' preference lists
        _, top2 = jax.lax.top_k(s.T, k2)    # reviewers' preference lists
    top1 = np.asarray(top1)
    top2 = np.asarray(top2)

    suitor_pref = {f"x_{i}": [f"y_{j}" for j in top1[i]] for i in range(n1)}
    reviewer_rank: Dict[Tuple, int] = {}
    for j in range(n2):
        for rank, i in enumerate(top2[j]):
            reviewer_rank[(f"y_{j}", f"x_{i}")] = rank

    matching = galeshapley(suitor_pref, reviewer_rank, cut)
    n_correct = sum(1 for a, b in matching.items()
                    if int(a.split("_")[-1]) == int(b.split("_")[-1]))
    precision = n_correct / max(len(matching), 1) * 100
    print("stable alignment precision = {:.3f}%, time = {:.3f} s "
          .format(precision, time.time() - t))
    return precision


# ---------------------------------------------------------------------------
# bootstrapping: maximum-weight greedy matching over filtered sim pairs
# ---------------------------------------------------------------------------

def retrieve_topk_alignment(kg1_source_ents: Sequence[int], kg1_embeddings,
                            kg2_candidates: Sequence[int], kg2_embeddings,
                            k: int = 1, metric: str = "inner",
                            normalize: bool = False, csls_k: int = 0,
                            output_path: str = None
                            ) -> List[Tuple[int, int, float]]:
    """Top-k candidate retrieval with similarities (reference
    modules/finding/alignment.py:227-257 — defined but never called
    upstream; kept for API parity).  The reference argpartitions each
    host sim row; here one device top-k over the sim matrix.  Returns
    [(source_ent, candidate_ent, sim)] (k per source, best-first) and
    optionally writes them as a TSV."""
    e1 = jnp.asarray(kg1_embeddings)[jnp.asarray(kg1_source_ents,
                                                 jnp.int32)]
    e2 = jnp.asarray(kg2_embeddings)[jnp.asarray(kg2_candidates,
                                                 jnp.int32)]
    mat = sim_matrix(e1, e2, metric=metric, normalize=normalize,
                     csls_k=csls_k)
    k = min(k, int(mat.shape[1]))
    vals, idx = jax.lax.top_k(mat, k)
    vals, idx = np.asarray(vals), np.asarray(idx)
    src = list(kg1_source_ents)
    cand = list(kg2_candidates)
    out = [(src[i], cand[int(idx[i, j])], float(vals[i, j]))
           for i in range(len(src)) for j in range(k)]
    if output_path is not None:
        with open(output_path, "w", encoding="utf8") as f:
            for s, p, o in out:
                f.write(f"{s}\t{p}\t{o}\n")
        print(output_path, "saved")
    return out


def filter_and_topk_pairs(sim_mat: jax.Array, th: float, k: int
                          ) -> List[Tuple[int, int, float]]:
    """Device: pairs (i, j, w) with w > th AND j in row i's top-k
    (reference alignment_finder.py:28-81 'intersection' strategy)."""
    vals, idx = jax.lax.top_k(sim_mat, min(k, sim_mat.shape[1]))
    vals = np.asarray(vals)
    idx = np.asarray(idx)
    out: List[Tuple[int, int, float]] = []
    rows, cols = np.nonzero(vals > th)
    for r, c in zip(rows.tolist(), cols.tolist()):
        out.append((r, int(idx[r, c]), float(vals[r, c])))
    return out


def mwgm_greedy(pairs: Sequence[Tuple[int, int, float]]) -> Set[Tuple[int, int]]:
    """Greedy maximum-weight bipartite matching: sort by weight desc, take
    each pair whose endpoints are both unused.  Same objective the
    reference's graph-tool heuristic approximates."""
    chosen: Set[Tuple[int, int]] = set()
    used_x: Set[int] = set()
    used_y: Set[int] = set()
    for i, j, _ in sorted(pairs, key=lambda p: -p[2]):
        if i not in used_x and j not in used_y:
            chosen.add((i, j))
            used_x.add(i)
            used_y.add(j)
    return chosen


def check_new_alignment(aligned_pairs, context="check alignment") -> None:
    """Print pseudo-label precision assuming the gold mapping is i==j
    (reference alignment_finder.py:143-151)."""
    if not aligned_pairs:
        print("{}, empty aligned pairs".format(context))
        return
    num = sum(1 for x, y in aligned_pairs if x == y)
    print("{}: right alignment: {}/{}={:.3f}".format(
        context, num, len(aligned_pairs), num / len(aligned_pairs)))
