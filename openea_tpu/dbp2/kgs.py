"""MyKGs: KGs + labeled linked/unlinked entity lists per split
(reference dbp2.0/utils.py:51-97) and the DBP2.0 folder loader
(reference dbp2.0/main.py:64-98)."""

from __future__ import annotations

import os
from typing import List

from openea_tpu.data import read as rd
from openea_tpu.data.kg import KG, KGs

LINKED, UNLINKED = 0.0, 1.0


def read_items(path: str) -> List[str]:
    with open(path, "r", encoding="utf8") as f:
        return [line.strip("\n").strip() for line in f]


class MyKGs(KGs):

    def __init__(self, kg1: KG, kg2: KG, train_links, test_links,
                 train_unlinked1, valid_unlinked1, test_unlinked1,
                 train_unlinked2, valid_unlinked2, test_unlinked2,
                 valid_links=None, mode: str = "mapping", ordered: bool = True):
        super().__init__(kg1, kg2, train_links, test_links,
                         valid_links=valid_links, mode=mode, ordered=ordered)

        def to_ids(uris, id_dict):
            return [(id_dict.get(u), UNLINKED) for u in uris
                    if id_dict.get(u) is not None]

        d1 = self.kg1.entities_id_dict
        d2 = self.kg2.entities_id_dict
        self.train_unlinked_entities1 = to_ids(train_unlinked1, d1)
        self.valid_unlinked_entities1 = to_ids(valid_unlinked1, d1)
        self.test_unlinked_entities1 = to_ids(test_unlinked1, d1)
        self.train_unlinked_entities2 = to_ids(train_unlinked2, d2)
        self.valid_unlinked_entities2 = to_ids(valid_unlinked2, d2)
        self.test_unlinked_entities2 = to_ids(test_unlinked2, d2)

        self.train_linked_entities1 = [(e, LINKED) for e in self.train_entities1]
        self.valid_linked_entities1 = [(e, LINKED) for e in self.valid_entities1]
        self.test_linked_entities1 = [(e, LINKED) for e in self.test_entities1]
        self.train_linked_entities2 = [(e, LINKED) for e in self.train_entities2]
        self.valid_linked_entities2 = [(e, LINKED) for e in self.valid_entities2]
        self.test_linked_entities2 = [(e, LINKED) for e in self.test_entities2]


def read_dbp2_kgs_from_folder(training_data_folder: str, division: str,
                              mode: str, ordered: bool,
                              direction: str = "left") -> MyKGs:
    j = os.path.join
    rel1, _, _ = rd.read_relation_triples(j(training_data_folder, "rel_triples_1"))
    rel2, _, _ = rd.read_relation_triples(j(training_data_folder, "rel_triples_2"))
    train = rd.read_links(j(training_data_folder, division, "train_links"))
    valid = rd.read_links(j(training_data_folder, division, "valid_links"))
    test = rd.read_links(j(training_data_folder, division, "test_links"))
    unl = {}
    for split in ("train", "valid", "test"):
        for side in ("1", "2"):
            unl[(split, side)] = read_items(
                j(training_data_folder, division, f"{split}_unlinked_ent{side}"))
    kg1 = KG(list(rel1), [])
    kg2 = KG(list(rel2), [])
    if direction == "left":
        return MyKGs(kg1, kg2, train, test,
                     unl[("train", "1")], unl[("valid", "1")], unl[("test", "1")],
                     unl[("train", "2")], unl[("valid", "2")], unl[("test", "2")],
                     valid_links=valid, mode=mode, ordered=ordered)
    assert direction == "right"
    return MyKGs(kg2, kg1, [(b, a) for a, b in train], [(b, a) for a, b in test],
                 unl[("train", "2")], unl[("valid", "2")], unl[("test", "2")],
                 unl[("train", "1")], unl[("valid", "1")], unl[("test", "1")],
                 valid_links=[(b, a) for a, b in valid], mode=mode,
                 ordered=ordered)
