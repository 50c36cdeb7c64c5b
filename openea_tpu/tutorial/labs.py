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

def edit_distance_sim(str1: str, str2: str) -> float:
    """The lab baseline's edit-distance similarity (reference
    tutorial/ontology_matching/src/demo.py:5-13): ``1 - dist/min_len``
    rounded to 4 places, 0 when either string is empty.  Unlike
    Levenshtein.ratio this can go negative and is asymmetric in length;
    it must be reproduced exactly to match the README baseline table."""
    min_len = min(len(str1), len(str2))
    if min_len == 0:
        return 0.0
    try:
        import Levenshtein as lev
        dist = lev.distance(str1, str2)
    except ImportError:                                # pragma: no cover
        dist = _edit_distance(str1, str2)
    return round(1 - dist / min_len, 4)


def _edit_distance(a: str, b: str) -> int:            # pragma: no cover
    """Plain DP Levenshtein distance fallback."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def matching_by_similarity_threshold(src_rdf, target_rdf,
                                     threshold: float = 0.9
                                     ) -> List[Tuple[str, str, float, str]]:
    """The reference lab's baseline matcher (demo.py:30-59): for each of
    classes / attributes / relations independently, emit EVERY pair whose
    lowercased-label edit-distance similarity reaches the threshold.
    Reproduces the README baseline P/R/F1 table on the real OAEI datasets
    (301: 1.00/0.217/0.356 … 304: 0.918/0.592/0.720).

    ``src_rdf``/``target_rdf`` are RdfParser-like objects exposing
    ``{class,attribute,relation}_{uris,labels}``; None labels count as
    empty strings (rdflib returns '' for missing labels)."""
    print("Similarity threshold: {}".format(threshold))
    pairs: List[Tuple[str, str, float, str]] = []
    for kind in ("class", "attribute", "relation"):
        s_uris = getattr(src_rdf, kind + "_uris")
        s_labels = getattr(src_rdf, kind + "_labels")
        t_uris = getattr(target_rdf, kind + "_uris")
        t_labels = getattr(target_rdf, kind + "_labels")
        for i in range(len(s_uris)):
            for j in range(len(t_uris)):
                sim = edit_distance_sim((s_labels[i] or "").lower(),
                                        (t_labels[j] or "").lower())
                if sim >= threshold:
                    pairs.append((s_uris[i], t_uris[j], 1.0, "="))
    return pairs


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
    """(source, object, value) claims -> per-object majority value.

    Pandas-parity semantics (reference truth_discovery/majority_voting.py:
    7-21, which reads with read_csv): an empty value is NaN there, and
    ``df[col]==nan`` never matches, so empty claims can never WIN the
    vote — an object whose claims are all empty maps to ''.  Ties break
    to the first-seen candidate (strictly-greater count to replace),
    which Counter.most_common's insertion-order tie-break reproduces."""
    votes: Dict[str, Counter] = {}
    for _, obj, value in claims:
        c = votes.setdefault(obj, Counter())
        if value != "":
            c[value] += 1
        else:
            c.setdefault(value, 0)  # key present so empty-only objs emit ''
    out = {}
    for obj, c in votes.items():
        # first-seen candidate wins ties: scan in insertion order,
        # replace only on strictly greater count (reference :13-19)
        best, best_n = "", 0
        for v, n in c.items():
            if v != "" and n > best_n:
                best, best_n = v, n
        out[obj] = best
    return out


def read_book_claims(path: str) -> List[Tuple[str, str, str]]:
    """Read the truth-discovery book dataset (tab-separated
    ``source  isbn  book  author``, reference majority_voting.py:2-4)
    into (source, isbn, author) claims."""
    claims = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 4:
                claims.append((parts[0], parts[1], parts[3]))
    return claims


def author_token_set(s: str) -> set:
    """Tokenization of the reference's str_to_set
    (result_evaluation.py:7-9): lowercase, punctuation -> spaces, strip
    '(author)'/'(joint author)' markers, split on whitespace."""
    s = s.lower()
    for ch in (";", ",", ".", ":", "&", "/", "'"):
        s = s.replace(ch, " ")
    s = s.replace("(author)", " ").replace("(joint author)", " ")
    return set(s.split())


def jaccard_author_sim(str1: str, str2: str) -> float:
    """result_evaluation.py:11-14."""
    s1, s2 = author_token_set(str1), author_token_set(str2)
    return len(s1 & s2) / len(s1 | s2) if (s1 | s2) else 0.0


def evaluate_truth_jaccard(pred: Dict[str, str], golden: Dict[str, str]):
    """The reference's measure_result (result_evaluation.py:17-44):
    bucket each prediction with a golden label by Jaccard author
    similarity; a 'hit' is sim >= 0.8.  NOTE the reference iterates the
    PREDICTIONS and counts those without golden labels as misses (golden
    covers only 100 of ~1265 books, so miss_count is large by design).
    Returns (miss_count, measure_sum, measure_hit, answer_dict)."""
    ans = {"0.0-0.2": 0, "0.2-0.4": 0, "0.4-0.6": 0,
           "0.6-0.8": 0, "0.8-1.0": 0}
    miss_count, measure_sum, measure_hit = 0, 0.0, 0
    for obj, value in pred.items():
        if obj not in golden:
            miss_count += 1
            continue
        sim = jaccard_author_sim(value, golden[obj])
        if sim >= 0.8:
            measure_hit += 1
            ans["0.8-1.0"] += 1
        elif sim >= 0.6:
            ans["0.6-0.8"] += 1
        elif sim >= 0.4:
            ans["0.4-0.6"] += 1
        elif sim >= 0.2:
            ans["0.2-0.4"] += 1
        else:
            ans["0.0-0.2"] += 1
        measure_sum += sim
    print("miss_count", miss_count)
    print("measure_sum", measure_sum)
    print("measure_hit", measure_hit)
    print("answer_dict", str(ans))
    return miss_count, measure_sum, measure_hit, ans


def truth_accuracy(pred: Dict[str, str], gold: Dict[str, str]) -> float:
    if not gold:
        return 0.0
    correct = sum(1 for k, v in gold.items() if pred.get(k) == v)
    acc = correct / len(gold)
    print("truth-discovery accuracy: {}/{} = {:.4f}".format(
        correct, len(gold), acc))
    return acc
