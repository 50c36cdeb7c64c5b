"""Course-lab utilities (reference tutorial/).

* ontology matching: name-similarity threshold matcher + the P/R/F1
  grader against a gold alignment (reference
  tutorial/ontology_matching/test/test.py:24-63 — the reference's only
  real test file);
* truth discovery: majority voting baseline + accuracy evaluation
  (reference tutorial/truth_discovery/majority_voting.py);
* the entity-alignment lab is the DBP2.0 MTransEV2 mini pipeline —
  provided by openea_tpu.dbp2.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, Iterable, List, Sequence, Tuple

try:
    import Levenshtein

    def _ratio(a: str, b: str) -> float:
        return Levenshtein.ratio(a, b)
except ImportError:                                    # pragma: no cover
    from difflib import SequenceMatcher

    def _ratio(a: str, b: str) -> float:
        return SequenceMatcher(None, a, b).ratio()


# ---------------------------------------------------------------------- #
# ontology matching
# ---------------------------------------------------------------------- #

def match_by_name_similarity(names1: Dict[str, str], names2: Dict[str, str],
                             threshold: float = 0.9
                             ) -> List[Tuple[str, str, float]]:
    """Greedy mutual-best Levenshtein matching above a threshold — the lab's
    baseline matcher."""
    best12 = {}
    for u1, n1 in names1.items():
        best, best_sim = None, threshold
        for u2, n2 in names2.items():
            s = _ratio(n1.lower(), n2.lower())
            if s > best_sim:
                best, best_sim = u2, s
        if best is not None:
            best12[u1] = (best, best_sim)
    used = set()
    out = []
    for u1, (u2, s) in sorted(best12.items(), key=lambda x: -x[1][1]):
        if u2 not in used:
            out.append((u1, u2, s))
            used.add(u2)
    return out


def grade_alignment(pred: Iterable[Tuple[str, str]],
                    gold: Iterable[Tuple[str, str]]):
    """Precision / recall / F1 against a gold alignment (reference
    tutorial/ontology_matching/test/test.py:44-63)."""
    pred = list(pred)
    gold_left = list(gold)
    n_pred, n_true = len(pred), len(gold_left)
    tp = 0
    for p in pred:
        for j, g in enumerate(gold_left):
            if p[0] == g[0] and p[1] == g[1]:
                tp += 1
                gold_left.pop(j)
                break
    precision = tp / max(n_pred, 1)
    recall = tp / max(n_true, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-12)
    print("Precision: {}/{} = {:.4f}".format(tp, n_pred, precision))
    print("Recall: {}/{} = {:.4f}".format(tp, n_true, recall))
    print("F1: {:.4f}".format(f1))
    return precision, recall, f1


# ---------------------------------------------------------------------- #
# truth discovery
# ---------------------------------------------------------------------- #

def majority_voting(claims: Iterable[Tuple[str, str, str]]) -> Dict[str, str]:
    """(source, object, value) claims -> per-object majority value."""
    votes: Dict[str, Counter] = {}
    for _, obj, value in claims:
        votes.setdefault(obj, Counter())[value] += 1
    return {obj: c.most_common(1)[0][0] for obj, c in votes.items()}


def truth_accuracy(pred: Dict[str, str], gold: Dict[str, str]) -> float:
    if not gold:
        return 0.0
    correct = sum(1 for k, v in gold.items() if pred.get(k) == v)
    acc = correct / len(gold)
    print("truth-discovery accuracy: {}/{} = {:.4f}".format(
        correct, len(gold), acc))
    return acc
