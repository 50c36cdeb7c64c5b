"""KG / KGs containers.

Re-designed version of the reference's modules/load/kg.py + kgs.py: the same
public surface (id dicts, adjacency dicts, train/valid/test link lists,
sharing/mapping/swapping interaction modes) but with *dense int32 array
exports* as the primary representation — the arrays are what the jitted TPU
training/eval paths consume, and they are built once at load time.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

from openea_tpu.data import read as rd


class KG:
    """One knowledge graph in id space.

    Array exports (all int32 numpy):
      triples       [T,3]  relation triples incl. swapped sup triples
      local_triples [Tl,3] relation triples excl. sup triples
      entities      [n]    global entity ids appearing in this KG (sorted)
      relations     [m]    global relation ids (sorted)
    """

    def __init__(self, relation_triples: Sequence[Tuple[int, int, int]],
                 attribute_triples: Sequence[Tuple[int, int, str]] = ()):
        self.relation_triples_set: Set[Tuple[int, int, int]] = set(relation_triples)
        self.local_relation_triples_set = set(self.relation_triples_set)
        self.sup_relation_triples_set: Set[Tuple[int, int, int]] = set()

        self.attribute_triples_set: Set[Tuple[int, int, str]] = set(attribute_triples)
        self.local_attribute_triples_set = set(self.attribute_triples_set)
        self.sup_attribute_triples_set: Set[Tuple[int, int, str]] = set()

        self.entities_id_dict: Optional[Dict[str, int]] = None
        self.relations_id_dict: Optional[Dict[str, int]] = None
        self.attributes_id_dict: Optional[Dict[str, int]] = None

        self._rebuild()

    # -- construction ------------------------------------------------------

    def _rebuild(self) -> None:
        ents: Set[int] = set()
        rels: Set[int] = set()
        for h, r, t in self.relation_triples_set:
            ents.add(h)
            ents.add(t)
            rels.add(r)
        attrs: Set[int] = set()
        for e, a, _ in self.attribute_triples_set:
            ents.add(e)
            attrs.add(a)
        self.entities_set = ents
        self.relations_set = rels
        self.attributes_set = attrs
        self.entities_list = sorted(ents)
        self.relations_list = sorted(rels)
        self.attributes_list = sorted(attrs)
        self.entities_num = len(ents)
        self.relations_num = len(rels)
        self.attributes_num = len(attrs)
        self.relation_triples_num = len(self.relation_triples_set)
        self.local_relation_triples_num = len(self.local_relation_triples_set)
        self.attribute_triples_num = len(self.attribute_triples_set)
        self.local_attribute_triples_num = len(self.local_attribute_triples_set)

        # adjacency dicts (used by swapping-mode sup-triple generation and
        # by bootstrapping label editing; reference kg.py:101-121)
        self.rt_dict: Dict[int, Set[Tuple[int, int]]] = {}
        self.hr_dict: Dict[int, Set[Tuple[int, int]]] = {}
        for h, r, t in self.local_relation_triples_set:
            self.rt_dict.setdefault(h, set()).add((r, t))
            self.hr_dict.setdefault(t, set()).add((h, r))
        # CANONICAL iteration order for attribute triples: the set holds
        # string values, so raw set iteration follows PYTHONHASHSEED and
        # leaks per-process dict insertion order into every consumer
        # (caught as cross-process metric jitter in GCN-Align's
        # attribute-incidence build — same bug class as round 3's
        # rel_ht_table fix)
        sorted_attr = sorted(self.local_attribute_triples_set,
                             key=lambda t: (t[0], t[1], str(t[2])))
        self.av_dict: Dict[int, Set[Tuple[int, str]]] = {}
        for e, a, v in sorted_attr:
            self.av_dict.setdefault(e, set()).add((a, v))
        # ent -> attribute-id set / head -> relation-id set
        # (reference kg.py:115-129 parse_relations/parse_attributes)
        self.entity_attributes_dict: Dict[int, Set[int]] = {}
        for e, a, _ in sorted_attr:
            self.entity_attributes_dict.setdefault(e, set()).add(a)
        self.entity_relations_dict: Dict[int, Set[int]] = {}
        for h, r, _ in self.local_relation_triples_set:
            self.entity_relations_dict.setdefault(h, set()).add(r)

        # dense exports (deterministic order: sorted triples) — only once the
        # KG is in id space; the URI-stage KG built at file-load time has
        # string elements and no array form.
        if self._is_id_space():
            self.triples = _triples_array(self.relation_triples_set)
            self.local_triples = _triples_array(self.local_relation_triples_set)
            self.entities = np.asarray(self.entities_list, dtype=np.int32)
            self.relations = np.asarray(self.relations_list, dtype=np.int32)
        else:
            self.triples = None
            self.local_triples = None
            self.entities = None
            self.relations = None

    def _is_id_space(self) -> bool:
        for h, _, _ in self.relation_triples_set:
            return isinstance(h, (int, np.integer))
        for e, _, _ in self.attribute_triples_set:
            return isinstance(e, (int, np.integer))
        return True

    # -- reference API parity ---------------------------------------------

    @property
    def relation_triples_list(self) -> List[Tuple[int, int, int]]:
        if self.triples is None:
            return list(self.relation_triples_set)
        return [tuple(t) for t in self.triples.tolist()]

    @property
    def local_relation_triples_list(self) -> List[Tuple[int, int, int]]:
        if self.local_triples is None:
            return list(self.local_relation_triples_set)
        return [tuple(t) for t in self.local_triples.tolist()]

    # sorted, not list(set): attribute triples hold string values, so set
    # iteration order follows PYTHONHASHSEED and would leak per-process
    # nondeterminism into every consumer (attr vocab ids, n-gram batches,
    # predicate alignment ...)
    @property
    def attribute_triples_list(self):
        return sorted(self.attribute_triples_set,
                      key=lambda t: (t[0], t[1], str(t[2])))

    @property
    def local_attribute_triples_list(self):
        return sorted(self.local_attribute_triples_set,
                      key=lambda t: (t[0], t[1], str(t[2])))

    def set_id_dict(self, ent_ids, rel_ids, attr_ids) -> None:
        self.entities_id_dict = ent_ids
        self.relations_id_dict = rel_ids
        self.attributes_id_dict = attr_ids

    def set_attributes(self, attribute_triples) -> None:
        """Replace the attribute triple set (MultiKE re-keys values to
        literal ids, reference multi_ke.py:461-463)."""
        self.attribute_triples_set = set(attribute_triples)
        self.local_attribute_triples_set = set(attribute_triples)
        self.sup_attribute_triples_set = set()
        self._rebuild()

    def add_sup_relation_triples(self, sup_triples) -> None:
        self.sup_relation_triples_set |= set(sup_triples)
        self.relation_triples_set |= set(sup_triples)
        self._rebuild()

    def add_sup_attribute_triples(self, sup_triples) -> None:
        self.sup_attribute_triples_set |= set(sup_triples)
        self.attribute_triples_set |= set(sup_triples)
        self._rebuild()


def _triples_array(triples: Set[Tuple[int, int, int]]) -> np.ndarray:
    if not triples:
        return np.zeros((0, 3), dtype=np.int32)
    return np.asarray(sorted(triples), dtype=np.int32)


class KGs:
    """A pair of KGs + seed/valid/test alignment links under one id space.

    Interaction modes (reference kgs.py:6-76):
      sharing  — seed-aligned entities share one id (one embedding table row)
      mapping  — separate ids; a learned d×d transform aligns the spaces
      swapping — separate ids; each KG is augmented with counterpart triples
                 of seed-aligned entities
    """

    def __init__(self, kg1: KG, kg2: KG, train_links, test_links,
                 valid_links=None, mode: str = "mapping", ordered: bool = True):
        assert mode in ("sharing", "mapping", "swapping"), mode
        self.mode = mode
        if mode == "sharing":
            ent_ids1, ent_ids2 = rd.generate_sharing_id(
                train_links, kg1.relation_triples_set, kg1.entities_set,
                kg2.relation_triples_set, kg2.entities_set, ordered=ordered)
        else:
            ent_ids1, ent_ids2 = rd.generate_mapping_id(
                kg1.relation_triples_set, kg1.entities_set,
                kg2.relation_triples_set, kg2.entities_set, ordered=ordered)
        rel_ids1, rel_ids2 = rd.generate_mapping_id(
            kg1.relation_triples_set, kg1.relations_set,
            kg2.relation_triples_set, kg2.relations_set, ordered=ordered)
        attr_ids1, attr_ids2 = rd.generate_mapping_id(
            kg1.attribute_triples_set, kg1.attributes_set,
            kg2.attribute_triples_set, kg2.attributes_set, ordered=ordered)

        id_rel1 = rd.uris_relation_triple_2ids(kg1.relation_triples_set, ent_ids1, rel_ids1)
        id_rel2 = rd.uris_relation_triple_2ids(kg2.relation_triples_set, ent_ids2, rel_ids2)
        id_attr1 = rd.uris_attribute_triple_2ids(kg1.attribute_triples_set, ent_ids1, attr_ids1)
        id_attr2 = rd.uris_attribute_triple_2ids(kg2.attribute_triples_set, ent_ids2, attr_ids2)

        self.uri_kg1, self.uri_kg2 = kg1, kg2
        self.uri_train_links = list(train_links)
        self.uri_test_links = list(test_links)
        self.uri_valid_links = list(valid_links) if valid_links is not None else []

        kg1 = KG(id_rel1, id_attr1)
        kg2 = KG(id_rel2, id_attr2)
        kg1.set_id_dict(ent_ids1, rel_ids1, attr_ids1)
        kg2.set_id_dict(ent_ids2, rel_ids2, attr_ids2)

        self.train_links = rd.uris_pair_2ids(self.uri_train_links, ent_ids1, ent_ids2)
        self.test_links = rd.uris_pair_2ids(self.uri_test_links, ent_ids1, ent_ids2)
        self.valid_links = rd.uris_pair_2ids(self.uri_valid_links, ent_ids1, ent_ids2)

        if mode == "swapping":
            sup1, sup2 = rd.generate_sup_relation_triples(
                self.train_links, kg1.rt_dict, kg1.hr_dict, kg2.rt_dict, kg2.hr_dict)
            kg1.add_sup_relation_triples(sup1)
            kg2.add_sup_relation_triples(sup2)
            asup1, asup2 = rd.generate_sup_attribute_triples(
                self.train_links, kg1.av_dict, kg2.av_dict)
            kg1.add_sup_attribute_triples(asup1)
            kg2.add_sup_attribute_triples(asup2)

        self.kg1, self.kg2 = kg1, kg2

        self.train_entities1 = [a for a, _ in self.train_links]
        self.train_entities2 = [b for _, b in self.train_links]
        self.valid_entities1 = [a for a, _ in self.valid_links]
        self.valid_entities2 = [b for _, b in self.valid_links]
        self.test_entities1 = [a for a, _ in self.test_links]
        self.test_entities2 = [b for _, b in self.test_links]

        self.useful_entities_list1 = self.kg1.entities_list
        self.useful_entities_list2 = self.kg2.entities_list

        self.entities_num = len(self.kg1.entities_set | self.kg2.entities_set)
        self.relations_num = len(self.kg1.relations_set | self.kg2.relations_set)
        self.attributes_num = len(self.kg1.attributes_set | self.kg2.attributes_set)
        # id-space size for the embedding table: ids are dense in
        # [0, entities_num) only in sharing mode; in mapping/swapping they
        # are dense in [0, n1+n2).  Use max id + 1 to be safe.
        all_ids = list(self.kg1.entities_set | self.kg2.entities_set)
        self.max_entities_id = (max(all_ids) + 1) if all_ids else 0
        all_rids = list(self.kg1.relations_set | self.kg2.relations_set)
        self.max_relations_id = (max(all_rids) + 1) if all_rids else 0
        all_aids = list(self.kg1.attributes_set | self.kg2.attributes_set)
        self.max_attributes_id = (max(all_aids) + 1) if all_aids else 0

        # dense link arrays
        self.train_links_array = _links_array(self.train_links)
        self.valid_links_array = _links_array(self.valid_links)
        self.test_links_array = _links_array(self.test_links)


def _links_array(links) -> np.ndarray:
    if not links:
        return np.zeros((0, 2), dtype=np.int32)
    return np.asarray(links, dtype=np.int32)


# ---------------------------------------------------------------------------
# folder loaders (reference kgs.py:79-131)
# ---------------------------------------------------------------------------

def read_kgs_from_folder(training_data_folder: str, division: str, mode: str,
                         ordered: bool, remove_unlinked: bool = False) -> KGs:
    j = os.path.join
    kg1_rel, _, _ = rd.read_relation_triples(j(training_data_folder, "rel_triples_1"))
    kg2_rel, _, _ = rd.read_relation_triples(j(training_data_folder, "rel_triples_2"))
    kg1_attr, _, _ = rd.read_attribute_triples(j(training_data_folder, "attr_triples_1"))
    kg2_attr, _, _ = rd.read_attribute_triples(j(training_data_folder, "attr_triples_2"))

    train_links = rd.read_links(j(training_data_folder, division, "train_links"))
    valid_links = rd.read_links(j(training_data_folder, division, "valid_links"))
    test_links = rd.read_links(j(training_data_folder, division, "test_links"))

    if remove_unlinked:
        links = train_links + valid_links + test_links
        kg1_rel = rd.remove_unlinked_triples(kg1_rel, links)
        kg2_rel = rd.remove_unlinked_triples(kg2_rel, links)

    kg1 = KG(_as_id_or_uri(kg1_rel), list(kg1_attr))
    kg2 = KG(_as_id_or_uri(kg2_rel), list(kg2_attr))
    return KGs(kg1, kg2, train_links, test_links, valid_links=valid_links,
               mode=mode, ordered=ordered)


def read_reversed_kgs_from_folder(training_data_folder: str, division: str,
                                  mode: str, ordered: bool,
                                  remove_unlinked: bool = False) -> KGs:
    """Align KG2 -> KG1 (reference kgs.py:102-131)."""
    j = os.path.join
    kg1_rel, _, _ = rd.read_relation_triples(j(training_data_folder, "rel_triples_2"))
    kg2_rel, _, _ = rd.read_relation_triples(j(training_data_folder, "rel_triples_1"))
    kg1_attr, _, _ = rd.read_attribute_triples(j(training_data_folder, "attr_triples_2"))
    kg2_attr, _, _ = rd.read_attribute_triples(j(training_data_folder, "attr_triples_1"))
    train_links = [(b, a) for a, b in rd.read_links(j(training_data_folder, division, "train_links"))]
    valid_links = [(b, a) for a, b in rd.read_links(j(training_data_folder, division, "valid_links"))]
    test_links = [(b, a) for a, b in rd.read_links(j(training_data_folder, division, "test_links"))]
    if remove_unlinked:
        links = train_links + valid_links + test_links
        kg1_rel = rd.remove_unlinked_triples(kg1_rel, links)
        kg2_rel = rd.remove_unlinked_triples(kg2_rel, links)
    kg1 = KG(_as_id_or_uri(kg1_rel), list(kg1_attr))
    kg2 = KG(_as_id_or_uri(kg2_rel), list(kg2_attr))
    return KGs(kg1, kg2, train_links, test_links, valid_links=valid_links,
               mode=mode, ordered=ordered)


def read_kgs_from_files(kg1_rel, kg2_rel, kg1_attr, kg2_attr,
                        train_links, valid_links, test_links, mode: str) -> KGs:
    kg1 = KG(list(kg1_rel), list(kg1_attr))
    kg2 = KG(list(kg2_rel), list(kg2_attr))
    return KGs(kg1, kg2, train_links, test_links, valid_links=valid_links, mode=mode)


def _as_id_or_uri(triples):
    # KG accepts uri triples at load time; KGs re-creates it in id space.
    return list(triples)


def read_kgs_from_dbp_dwy(folder: str, division: str, mode: str,
                          ordered: bool, remove_unlinked: bool = False) -> KGs:
    """DBP15K / DWY100K folder layout: triples_1/2 + sup/ref pair files
    (reference kgs.py:134-169).  With ``remove_unlinked``, alternately
    drop triples whose endpoints are unlinked and links whose endpoints
    have no triples until a fixed point."""
    j = os.path.join
    base = j(folder, division)
    rel1, _, _ = rd.read_relation_triples(j(base, "triples_1"))
    rel2, _, _ = rd.read_relation_triples(j(base, "triples_2"))

    def links_file(*names):
        for n in names:
            p = j(base, n)
            if os.path.exists(p):
                return rd.read_links(p)
        return []

    train_links = links_file("sup_pairs", "sup_ent_ids")
    test_links = links_file("ref_pairs", "ref_ent_ids")

    if remove_unlinked:
        rel1, rel2 = set(rel1), set(rel2)
        while True:
            links = train_links + test_links
            rel1 = set(rd.remove_unlinked_triples(rel1, links))
            rel2 = set(rd.remove_unlinked_triples(rel2, links))
            ents1 = {e for h, _, t in rel1 for e in (h, t)}
            ents2 = {e for h, _, t in rel2 for e in (h, t)}
            new_train = [(a, b) for a, b in train_links
                         if a in ents1 and b in ents2]
            new_test = [(a, b) for a, b in test_links
                        if a in ents1 and b in ents2]
            n1, n2 = len(rel1), len(rel2)
            train_links, test_links = new_train, new_test
            links = train_links + test_links
            rel1 = set(rd.remove_unlinked_triples(rel1, links))
            rel2 = set(rd.remove_unlinked_triples(rel2, links))
            if len(rel1) == n1 and len(rel2) == n2:
                break

    kg1 = KG(list(rel1), [])
    kg2 = KG(list(rel2), [])
    return KGs(kg1, kg2, train_links, test_links, mode=mode, ordered=ordered)
