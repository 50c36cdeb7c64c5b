"""Dataset file I/O and id assignment.

File formats and id-assignment semantics follow the reference
(modules/load/read.py): tab-separated triples / links, and the
frequency-ordered *interleaved* id scheme (KG1 entities get even ids, KG2
odd ids, sorted by triple frequency desc then URI desc) — metric parity
depends on this determinism (reference read.py:64-92).

Everything here is host-side, numpy-only, and runs once per experiment;
hot-path data (triples, links) is exported as dense int32 arrays by
:mod:`openea_tpu.data.kg`.
"""

from __future__ import annotations

import os
from collections import Counter
from typing import Dict, Iterable, List, Sequence, Set, Tuple

import numpy as np

Triple = Tuple[str, str, str]
Link = Tuple[str, str]


# ---------------------------------------------------------------------------
# readers
# ---------------------------------------------------------------------------

def read_relation_triples(path: str) -> Tuple[Set[Triple], Set[str], Set[str]]:
    """Read `h \\t r \\t t` lines. Returns (triples, entities, relations).

    Uses the native C++ interning loader (data/native.py) when available,
    falling back to the pure-Python parse."""
    if path is None or not os.path.exists(path):
        return set(), set(), set()
    try:
        from openea_tpu.data.native import read_relation_triples_fast
        fast = read_relation_triples_fast(path)
        if fast is not None:
            return fast
    except Exception:
        pass
    triples: Set[Triple] = set()
    entities: Set[str] = set()
    relations: Set[str] = set()
    with open(path, "r", encoding="utf8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) != 3:
                raise ValueError(f"bad relation triple line in {path}: {line!r}")
            h, r, t = (p.strip() for p in parts)
            triples.add((h, r, t))
            entities.add(h)
            entities.add(t)
            relations.add(r)
    return triples, entities, relations


def read_attribute_triples(path: str) -> Tuple[Set[Triple], Set[str], Set[str]]:
    """Read `e \\t a \\t value...` lines; extra tabs are folded into the value
    and a trailing '.' is stripped (reference read.py:368-391)."""
    if path is None or not os.path.exists(path):
        return set(), set(), set()
    triples: Set[Triple] = set()
    entities: Set[str] = set()
    attributes: Set[str] = set()
    with open(path, "r", encoding="utf8") as f:
        for line in f:
            parts = line.strip().rstrip("\n").split("\t")
            if len(parts) < 3:
                continue
            e = parts[0].strip()
            a = parts[1].strip()
            v = " ".join(p.strip() for p in parts[2:])
            v = v.strip().rstrip(".").strip()
            triples.add((e, a, v))
            entities.add(e)
            attributes.add(a)
    return triples, entities, attributes


def read_links(path: str) -> List[Link]:
    links: List[Link] = []
    with open(path, "r", encoding="utf8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) != 2:
                raise ValueError(f"bad link line in {path}: {line!r}")
            links.append((parts[0].strip(), parts[1].strip()))
    return links


def read_dict(path: str) -> Dict[str, int]:
    out: Dict[str, int] = {}
    with open(path, "r", encoding="utf8") as f:
        for line in f:
            k, v = line.rstrip("\n").split("\t")
            out[k] = int(v)
    return out


def read_pair_ids(path: str) -> List[Tuple[int, int]]:
    pairs: List[Tuple[int, int]] = []
    with open(path, "r", encoding="utf8") as f:
        for line in f:
            a, b = line.rstrip("\n").split("\t")
            pairs.append((int(a), int(b)))
    return pairs


# ---------------------------------------------------------------------------
# id assignment
# ---------------------------------------------------------------------------

def sort_elements(triples: Iterable[Triple], elements: Set[str]) -> List[str]:
    """Order elements by (frequency in triples desc, URI desc).

    Matches reference read.py:12-30: elements absent from triples count 0.
    """
    cnt: Counter = Counter()
    for s, p, o in triples:
        if s in elements:
            cnt[s] += 1
        if p in elements:
            cnt[p] += 1
        if o in elements:
            cnt[o] += 1
    for e in elements:
        if e not in cnt:
            cnt[e] = 0
    ordered = sorted(cnt.items(), key=lambda kv: (kv[1], kv[0]), reverse=True)
    return [k for k, _ in ordered]


def generate_mapping_id(
    kg1_triples: Iterable[Triple], kg1_elements: Set[str],
    kg2_triples: Iterable[Triple], kg2_elements: Set[str],
    ordered: bool = True,
) -> Tuple[Dict[str, int], Dict[str, int]]:
    """Interleaved id spaces: KG1 element i -> 2i, KG2 element i -> 2i+1,
    tail of the longer KG continues contiguously (reference read.py:64-92)."""
    ids1: Dict[str, int] = {}
    ids2: Dict[str, int] = {}
    if ordered:
        order1 = sort_elements(kg1_triples, kg1_elements)
        order2 = sort_elements(kg2_triples, kg2_elements)
        n1, n2 = len(order1), len(order2)
        for i in range(max(n1, n2)):
            if i < n1 and i < n2:
                ids1[order1[i]] = i * 2
                ids2[order2[i]] = i * 2 + 1
            elif i >= n1:
                ids2[order2[i]] = n1 * 2 + (i - n1)
            else:
                ids1[order1[i]] = n2 * 2 + (i - n2)
    else:
        idx = 0
        for e in kg1_elements:
            ids1[e] = idx
            idx += 1
        for e in kg2_elements:
            ids2[e] = idx
            idx += 1
    assert len(ids1) == len(kg1_elements)
    assert len(ids2) == len(kg2_elements)
    return ids1, ids2


def generate_sharing_id(
    train_links: Sequence[Link],
    kg1_triples: Iterable[Triple], kg1_elements: Set[str],
    kg2_triples: Iterable[Triple], kg2_elements: Set[str],
    ordered: bool = True,
) -> Tuple[Dict[str, int], Dict[str, int]]:
    """Seed-aligned entities share one id (reference read.py:32-61)."""
    ids1: Dict[str, int] = {}
    ids2: Dict[str, int] = {}
    if ordered:
        linked = {y: x for x, y in train_links}
        kg2_linked = [y for _, y in train_links]
        kg2_unlinked = set(kg2_elements) - set(kg2_linked)
        ids1, ids2 = generate_mapping_id(kg1_triples, kg1_elements,
                                         kg2_triples, kg2_unlinked, ordered=True)
        for e in kg2_linked:
            ids2[e] = ids1[linked[e]]
    else:
        idx = 0
        for e1, e2 in train_links:
            ids1[e1] = idx
            ids2[e2] = idx
            idx += 1
        for e in kg1_elements:
            if e not in ids1:
                ids1[e] = idx
                idx += 1
        for e in kg2_elements:
            if e not in ids2:
                ids2[e] = idx
                idx += 1
    assert len(ids1) == len(kg1_elements)
    assert len(ids2) == len(kg2_elements)
    return ids1, ids2


# ---------------------------------------------------------------------------
# uri -> id conversion
# ---------------------------------------------------------------------------

def uris_pair_2ids(pairs: Sequence[Link], ids1: Dict[str, int],
                   ids2: Dict[str, int]) -> List[Tuple[int, int]]:
    return [(ids1[a], ids2[b]) for a, b in pairs if a in ids1 and b in ids2]


def uris_relation_triple_2ids(triples: Iterable[Triple], ent_ids: Dict[str, int],
                              rel_ids: Dict[str, int]) -> List[Tuple[int, int, int]]:
    return [(ent_ids[h], rel_ids[r], ent_ids[t]) for h, r, t in triples]


def uris_attribute_triple_2ids(triples: Iterable[Triple], ent_ids: Dict[str, int],
                               attr_ids: Dict[str, int]) -> List[Tuple[int, int, str]]:
    return [(ent_ids[e], attr_ids[a], v) for e, a, v in triples]


# ---------------------------------------------------------------------------
# swapping-mode supervised triples (reference read.py:136-167)
# ---------------------------------------------------------------------------

def generate_sup_relation_triples(sup_links, rt_dict1, hr_dict1, rt_dict2, hr_dict2):
    """For each seed pair (e1,e2): copy e1's triples with e1 replaced by e2
    into KG1's new-triples set, and vice versa."""
    new1, new2 = set(), set()
    for e1, e2 in sup_links:
        for r, t in rt_dict1.get(e1, ()):  # e1 as head in KG1
            new1.add((e2, r, t))
        for h, r in hr_dict1.get(e1, ()):  # e1 as tail in KG1
            new1.add((h, r, e2))
        for r, t in rt_dict2.get(e2, ()):
            new2.add((e1, r, t))
        for h, r in hr_dict2.get(e2, ()):
            new2.add((h, r, e1))
    return new1, new2


def generate_sup_attribute_triples(sup_links, av_dict1, av_dict2):
    new1, new2 = set(), set()
    for e1, e2 in sup_links:
        for a, v in av_dict1.get(e1, ()):
            new1.add((e2, a, v))
        for a, v in av_dict2.get(e2, ()):
            new2.add((e1, a, v))
    return new1, new2


# ---------------------------------------------------------------------------
# filtering (reference kgs.py:192-224)
# ---------------------------------------------------------------------------

def remove_unlinked_triples(triples: Set[Triple], links: Sequence[Link]) -> Set[Triple]:
    linked = set()
    for a, b in links:
        linked.add(a)
        linked.add(b)
    return {(h, r, t) for h, r, t in triples if h in linked and t in linked}


# ---------------------------------------------------------------------------
# writers (reference read.py:282-366)
# ---------------------------------------------------------------------------

def pair2file(path: str, pairs) -> None:
    if pairs is None:
        return
    with open(path, "w", encoding="utf8") as f:
        for i, j in pairs:
            f.write(f"{i}\t{j}\n")


def dict2file(path: str, dic) -> None:
    if dic is None:
        return
    with open(path, "w", encoding="utf8") as f:
        for k, v in dic.items():
            f.write(f"{k}\t{v}\n")


def save_results(folder: str, pairs) -> None:
    os.makedirs(folder, exist_ok=True)
    pair2file(os.path.join(folder, "alignment_results_12"), pairs)


def save_embeddings(folder, kgs, ent_embeds, rel_embeds, attr_embeds,
                    mapping_mat=None, rev_mapping_mat=None) -> None:
    """Write .npy embeddings + id dicts, same artifact names as the
    reference (read.py:325-349) so its retest tooling can consume them."""
    os.makedirs(folder, exist_ok=True)
    for name, arr in (("ent_embeds", ent_embeds), ("rel_embeds", rel_embeds),
                      ("attr_embeds", attr_embeds), ("mapping_mat", mapping_mat),
                      ("rev_mapping_mat", rev_mapping_mat)):
        if arr is not None:
            np.save(os.path.join(folder, name + ".npy"), np.asarray(arr))
    dict2file(os.path.join(folder, "kg1_ent_ids"), kgs.kg1.entities_id_dict)
    dict2file(os.path.join(folder, "kg2_ent_ids"), kgs.kg2.entities_id_dict)
    dict2file(os.path.join(folder, "kg1_rel_ids"), kgs.kg1.relations_id_dict)
    dict2file(os.path.join(folder, "kg2_rel_ids"), kgs.kg2.relations_id_dict)
    dict2file(os.path.join(folder, "kg1_attr_ids"), kgs.kg1.attributes_id_dict)
    dict2file(os.path.join(folder, "kg2_attr_ids"), kgs.kg2.attributes_id_dict)


def load_embeddings(path: str):
    if os.path.exists(path):
        return np.load(path)
    return None
