"""Entity-name word vectors (reference approaches/rdgcn.py:415-464).

RDGCN/MultiKE/KDCoE initialize from entity-name word embeddings
(wiki-news-300d-1M.vec).  This module reproduces that pipeline — local
names from designated name attributes with URI-tail fallback, first-4-token
lookup-and-pad, summed vectors — and adds a deterministic *hashed* word
embedding fallback for environments without the .vec file: each word maps
to a fixed pseudo-random Gaussian vector keyed by its hash, so identical
names still produce identical vectors (the signal the benchmark datasets
actually carry), without the semantic neighborhood structure of the
pretrained vectors.
"""

from __future__ import annotations

import hashlib
import os
import string
from typing import Dict, List, Optional, Tuple

import numpy as np

_PUNCT_TABLE = str.maketrans({c: "" for c in string.punctuation})


def get_local_name_triples(kgs, training_data: str = "",
                           name_attribute_list=None) -> List[Tuple[int, int, str]]:
    """(entity_id, -1, local name) per entity; names come from designated
    name attributes when present, else the URI tail (reference
    rdgcn.py:368-413)."""
    if name_attribute_list is None:
        if "D_Y" in training_data:
            name_attribute_list = {"skos:prefLabel",
                                   "http://dbpedia.org/ontology/birthName"}
        elif "D_W" in training_data:
            name_attribute_list = {"http://www.wikidata.org/entity/P373",
                                   "http://www.wikidata.org/entity/P1476"}
        else:
            name_attribute_list = set()

    id_ent = {}
    for e, eid in (kgs.kg1.entities_id_dict or {}).items():
        id_ent[eid] = e
    for e, eid in (kgs.kg2.entities_id_dict or {}).items():
        id_ent[eid] = e

    name_ids = set()
    for d in (kgs.kg1.attributes_id_dict or {}), (kgs.kg2.attributes_id_dict or {}):
        for a, aid in d.items():
            if a in name_attribute_list:
                name_ids.add(aid)

    local_name: Dict[int, str] = {}
    for h, a, v in (kgs.kg1.local_attribute_triples_set
                    | kgs.kg2.local_attribute_triples_set):
        if a in name_ids:
            v = str(v).strip('"')
            if v.endswith('"@eng'):
                v = v.rstrip('"@eng')
            local_name[h] = v
    for e in kgs.kg1.entities_set | kgs.kg2.entities_set:
        if e not in local_name:
            local_name[e] = id_ent.get(e, str(e)).split("/")[-1].replace("_", " ")
    return [(e, -1, n) for e, n in local_name.items()]


def _tokenize(name: str, max_tokens: int = 4) -> List[str]:
    toks = name.translate(_PUNCT_TABLE).split(" ")
    return [t for t in toks if t][:max_tokens]


def _hash_vector(word: str, dim: int) -> np.ndarray:
    seed = int.from_bytes(hashlib.sha1(word.lower().encode("utf8")).digest()[:4],
                          "little")
    rng = np.random.RandomState(seed)
    return rng.normal(0.0, 0.3, dim).astype(np.float32)


def load_word_vectors(path: Optional[str], dim: int = 300):
    """word -> vector dict from a .vec file, or None if unavailable."""
    if not path or not os.path.exists(path):
        return None
    vecs = {}
    with open(path, "r", encoding="utf8", errors="ignore") as f:
        first = f.readline()
        if len(first.split()) <= 2:       # header line
            pass
        else:
            parts = first.rstrip().split(" ")
            vecs[parts[0]] = np.asarray(parts[1:dim + 1], np.float32)
        for line in f:
            parts = line.rstrip().split(" ")
            if len(parts) >= dim + 1:
                vecs[parts[0]] = np.asarray(parts[1:dim + 1], np.float32)
    return vecs


def name_vectors(kgs, word_embed_path: Optional[str] = None, dim: int = 300,
                 training_data: str = "", max_tokens: int = 4) -> np.ndarray:
    """[max_entities_id, dim] summed first-4-token name vectors."""
    triples = get_local_name_triples(kgs, training_data)
    word_vecs = load_word_vectors(word_embed_path, dim)
    if word_vecs is None:
        print("name_vectors: word-embedding file unavailable; using "
              "deterministic hashed word vectors")
    out = np.zeros((kgs.max_entities_id, dim), np.float32)
    cache: Dict[str, np.ndarray] = {}
    for e, _, name in triples:
        acc = np.zeros(dim, np.float32)
        for tok in _tokenize(name, max_tokens):
            if tok not in cache:
                if word_vecs is not None:
                    v = word_vecs.get(tok)
                    cache[tok] = (v if v is not None
                                  else np.zeros(dim, np.float32))
                else:
                    cache[tok] = _hash_vector(tok, dim)
            acc += cache[tok]
        out[e] = acc
    return out
