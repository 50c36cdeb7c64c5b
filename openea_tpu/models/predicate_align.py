"""Predicate (relation/attribute) alignment for MultiKE
(reference approaches/predicate_alignmnet.py).

Bootstrap: mutual-best Levenshtein match of predicate local names above
`predicate_init_sim`.  During training the alignment is refreshed by
blending the name similarity with the embedding similarity of mutually-
best predicate pairs (w=0.7), keeping pairs above `predicate_soft_sim`.
Aligned predicates produce (a) swapped "sup" triples carrying the pair
weight and (b) weighted copies of all local triples (weight 0.2 for
unaligned predicates, zoomed to [0.5, 1] for aligned ones).
"""

from __future__ import annotations

from typing import Dict, List, Set, Tuple

import numpy as np

try:
    import Levenshtein

    def _ratio(a: str, b: str) -> float:
        return Levenshtein.ratio(a, b)
except ImportError:                                        # pragma: no cover
    from difflib import SequenceMatcher

    def _ratio(a: str, b: str) -> float:
        return SequenceMatcher(None, a, b).ratio()


def link2dic(links):
    dic1 = {i: (j, w) for i, j, w in links}
    dic2 = {j: (i, w) for i, j, w in links}
    return dic1, dic2


def generate_sup_predicate_triples(predicate_links, triples1, triples2):
    dic1, dic2 = link2dic(predicate_links)
    sup1 = {(s, dic1[p][0], o, dic1[p][1]) for s, p, o in triples1 if p in dic1}
    sup2 = {(s, dic2[p][0], o, dic2[p][1]) for s, p, o in triples2 if p in dic2}
    return list(sup1), list(sup2)


def zoom_weight(weight, min_w_before, min_w_after=0.5):
    return 1.0 - (1.0 - weight) * (1.0 - min_w_after) / (1.0 - min_w_before)


def add_weights(predicate_links, triples1, triples2, min_w_before):
    dic1, dic2 = link2dic(predicate_links)
    default_w = 0.2

    def weighted(triples, dic):
        return {(s, p, o, zoom_weight(dic[p][1], min_w_before)
                 if p in dic else default_w) for s, p, o in triples}

    w1 = weighted(triples1, dic1)
    w2 = weighted(triples2, dic2)
    return list(w1), list(w2), w1, w2


def get_local_name(items):
    # sorted: string-set iteration follows PYTHONHASHSEED; canonical
    # insertion keeps the tie-break order of best_matches per-process
    # stable
    return {i: i.split("/")[-1].replace("_", " ") for i in sorted(items)}


def init_predicate_alignment(name_dict_1, name_dict_2, predicate_init_sim):
    def best_matches(d1, d2):
        match, sims = {}, {}
        for p1, n1 in sorted(d1.items()):
            best, best_sim = "", 0.0
            for p2, n2 in sorted(d2.items()):
                s = _ratio(n1, n2)
                if s > best_sim:
                    best, best_sim = p2, s
            match[p1] = best
            sims[p1] = best_sim
        return match, sims

    m12, s1 = best_matches(name_dict_1, name_dict_2)
    m21, _ = best_matches(name_dict_2, name_dict_1)
    pairs = set()
    latent = {}
    for p1, p2 in m12.items():
        if m21.get(p2) == p1:
            latent[(p1, p2)] = s1[p1]
            if s1[p1] > predicate_init_sim:
                pairs.add((p1, p2, s1[p1]))
    return pairs, latent


def predicate2id_matched_pairs(pairs, id_dict_1, id_dict_2):
    return {(id_dict_1[p1], id_dict_2[p2], w) for p1, p2, w in pairs
            if p1 in id_dict_1 and p2 in id_dict_2}


def find_predicate_alignment_by_embedding(embed, list1, list2):
    """Mutual-best cosine matches among predicate ids (reference :97-127)."""
    embed = embed / np.maximum(np.linalg.norm(embed, axis=1, keepdims=True),
                               1e-12)
    set2, set1 = set(list2), set(list1)
    sim = embed @ embed.T
    matched_1 = {}
    for i in list1:
        for j in np.argsort(-sim[i]):
            if int(j) in set2:
                matched_1[i] = int(j)
                break
    matched_2 = {}
    for j in list2:
        for i in np.argsort(-sim[j]):
            if int(i) in set1:
                matched_2[j] = int(i)
                break
    return {(i, j): float(sim[i, j]) for i, j in matched_1.items()
            if matched_2.get(j) == i}


class PredicateAlignModel:

    def __init__(self, kgs, args):
        self.kgs = kgs
        self.args = args
        self.relation_name_dict1 = get_local_name(set(kgs.kg1.relations_id_dict))
        self.relation_name_dict2 = get_local_name(set(kgs.kg2.relations_id_dict))
        self.attribute_name_dict1 = get_local_name(set(kgs.kg1.attributes_id_dict))
        self.attribute_name_dict2 = get_local_name(set(kgs.kg2.attributes_id_dict))

        self.relation_alignment_set, _ = init_predicate_alignment(
            self.relation_name_dict1, self.relation_name_dict2,
            args.predicate_init_sim)
        self.attribute_alignment_set, _ = init_predicate_alignment(
            self.attribute_name_dict1, self.attribute_name_dict2,
            args.predicate_init_sim)
        self.relation_alignment_set_init = self.relation_alignment_set
        self.attribute_alignment_set_init = self.attribute_alignment_set
        self.update_relation_triples(self.relation_alignment_set)
        self.update_attribute_triples(self.attribute_alignment_set)

    def update_relation_triples(self, alignment_set):
        ids = predicate2id_matched_pairs(alignment_set,
                                         self.kgs.kg1.relations_id_dict,
                                         self.kgs.kg2.relations_id_dict)
        self.relation_id_alignment_set = ids
        (self.sup_relation_alignment_triples1,
         self.sup_relation_alignment_triples2) = generate_sup_predicate_triples(
            ids, self.kgs.kg1.local_relation_triples_list,
            self.kgs.kg2.local_relation_triples_list)
        (self.relation_triples_w_weights1, self.relation_triples_w_weights2,
         self.relation_triples_w_weights_set1,
         self.relation_triples_w_weights_set2) = add_weights(
            ids, self.kgs.kg1.local_relation_triples_list,
            self.kgs.kg2.local_relation_triples_list,
            self.args.predicate_soft_sim)

    def update_attribute_triples(self, alignment_set):
        ids = predicate2id_matched_pairs(alignment_set,
                                         self.kgs.kg1.attributes_id_dict,
                                         self.kgs.kg2.attributes_id_dict)
        self.attribute_id_alignment_set = ids
        (self.sup_attribute_alignment_triples1,
         self.sup_attribute_alignment_triples2) = generate_sup_predicate_triples(
            ids, self.kgs.kg1.local_attribute_triples_list,
            self.kgs.kg2.local_attribute_triples_list)
        (self.attribute_triples_w_weights1, self.attribute_triples_w_weights2,
         self.attribute_triples_w_weights_set1,
         self.attribute_triples_w_weights_set2) = add_weights(
            ids, self.kgs.kg1.local_attribute_triples_list,
            self.kgs.kg2.local_attribute_triples_list,
            self.args.predicate_soft_sim)

    def update_predicate_alignment(self, embed, predicate_type="relation",
                                   w: float = 0.7):
        if predicate_type == "relation":
            list1 = [int(i) for i in self.kgs.kg1.relations_list]
            list2 = [int(i) for i in self.kgs.kg2.relations_list]
            id1, id2 = (self.kgs.kg1.relations_id_dict,
                        self.kgs.kg2.relations_id_dict)
            init_set = self.relation_alignment_set_init
        else:
            list1 = [int(i) for i in self.kgs.kg1.attributes_list]
            list2 = [int(i) for i in self.kgs.kg2.attributes_list]
            id1, id2 = (self.kgs.kg1.attributes_id_dict,
                        self.kgs.kg2.attributes_id_dict)
            init_set = self.attribute_alignment_set_init

        latent = find_predicate_alignment_by_embedding(np.asarray(embed),
                                                       list1, list2)
        out = set()
        for p1, p2, sim_init in init_set:
            pid1, pid2 = id1[p1], id2[p2]
            sim = sim_init
            if (pid1, pid2) in latent:
                sim = w * sim + (1 - w) * latent[(pid1, pid2)]
            if sim > self.args.predicate_soft_sim:
                out.add((p1, p2, sim))
        print("update " + predicate_type + " alignment:", len(out))
        if predicate_type == "relation":
            self.relation_alignment_set = out
            self.update_relation_triples(out)
        else:
            self.attribute_alignment_set = out
            self.update_attribute_triples(out)
