"""Synthetic OpenEA-style KG pair generator.

The image ships no real OpenEA datasets, so tests and benchmarks run on
synthetic pairs that match the benchmark's shape statistics (README.md:202
of the reference: 15K/100K entities per KG, 721_5fold splits = 20% train /
10% valid / 70% test of the aligned pairs) and its power-law-ish degree
skew.  The generator builds one "base" KG and derives the second KG by
renaming + edge dropout + extra noise edges, so alignment is learnable but
not trivial.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

from openea_tpu.data.kg import KG, KGs


def synthesize_kg_pair(
    num_entities: int = 1000,
    num_relations: int = 20,
    num_triples: int = 4000,
    aligned_frac: float = 1.0,
    edge_keep_prob: float = 0.85,
    noise_edge_frac: float = 0.15,
    train_frac: float = 0.2,
    valid_frac: float = 0.1,
    mode: str = "mapping",
    num_attributes: int = 0,
    attrs_per_entity: int = 3,
    seed: int = 0,
) -> KGs:
    """Build a KGs pair with URI-level files semantics, fully in memory.

    With ``num_attributes > 0``, each entity also gets attribute triples
    drawn from a popularity-skewed attribute pool; aligned entities draw
    the same attributes (so attribute-based views are learnable)."""
    rel1, rel2, links = _synthesize_raw(
        num_entities, num_relations, num_triples, aligned_frac,
        edge_keep_prob, noise_edge_frac, seed)
    attr1, attr2 = _synthesize_attrs(num_entities, num_attributes,
                                     attrs_per_entity, seed)
    rng = np.random.RandomState(seed + 1)
    links = [links[i] for i in rng.permutation(len(links))]
    n_train = int(train_frac * len(links))
    n_valid = int(valid_frac * len(links))
    train = links[:n_train]
    valid = links[n_train:n_train + n_valid]
    test = links[n_train + n_valid:]
    kg1 = KG(list(rel1), list(attr1))
    kg2 = KG(list(rel2), list(attr2))
    return KGs(kg1, kg2, train, test, valid_links=valid, mode=mode, ordered=True)


def _synthesize_attrs(num_entities, num_attributes, attrs_per_entity, seed):
    if num_attributes <= 0:
        return [], []
    rng = np.random.RandomState(seed + 7)
    ranks = np.arange(1, num_attributes + 1, dtype=np.float64)
    pop = ranks ** -0.8
    pop /= pop.sum()
    attr1, attr2 = [], []
    for e in range(num_entities):
        attrs = rng.choice(num_attributes, size=attrs_per_entity,
                           replace=False, p=pop)
        for a in attrs.tolist():
            attr1.append((f"http://kg1/e{e}", f"http://kg1/a{a}", f"v{a}_{e}"))
            attr2.append((f"http://kg2/e{e}", f"http://kg2/a{a}", f"v{a}_{e}"))
    return attr1, attr2


def _synthesize_raw(num_entities, num_relations, num_triples, aligned_frac,
                    edge_keep_prob, noise_edge_frac, seed):
    rng = np.random.RandomState(seed)
    # power-law entity popularity via rank (OpenEA ids are frequency-sorted;
    # the skew matters for negative-sampling and SpMM load-balance realism).
    # A bounded exponent keeps the distribution skewed but non-degenerate —
    # a raw zipf(1.6) draw concentrates ~all mass on one entity and collapses
    # the sampled triples into a handful of duplicates.
    ranks = np.arange(1, num_entities + 1, dtype=np.float64)
    pop = ranks ** -0.8
    pop /= pop.sum()

    # oversample to compensate for dropped self-loops / duplicate triples
    n_draw = int(num_triples * 1.5)
    heads = rng.choice(num_entities, size=n_draw, p=pop)
    tails = rng.choice(num_entities, size=n_draw, p=pop)
    rels = rng.randint(0, num_relations, size=n_draw)
    keep = heads != tails
    heads, rels, tails = heads[keep][:num_triples], rels[keep][:num_triples], tails[keep][:num_triples]

    def uri1(e):
        return f"http://kg1/e{e}"

    def uri2(e):
        return f"http://kg2/e{e}"

    rel1 = {(uri1(h), f"http://kg1/r{r}", uri1(t))
            for h, r, t in zip(heads.tolist(), rels.tolist(), tails.tolist())}

    # KG2: keep a subset of KG1's edges (renamed), plus fresh noise edges
    keep2 = rng.rand(len(heads)) < edge_keep_prob
    rel2 = {(uri2(h), f"http://kg2/r{r}", uri2(t))
            for h, r, t in zip(heads[keep2].tolist(), rels[keep2].tolist(),
                               tails[keep2].tolist())}
    n_noise = int(noise_edge_frac * len(heads))
    nh = rng.choice(num_entities, size=n_noise, p=pop)
    nt = rng.choice(num_entities, size=n_noise, p=pop)
    nr = rng.randint(0, num_relations, size=n_noise)
    rel2 |= {(uri2(h), f"http://kg2/r{r}", uri2(t))
             for h, r, t in zip(nh.tolist(), nr.tolist(), nt.tolist()) if h != t}

    ents1 = {u for h, _, t in rel1 for u in (h, t)}
    ents2 = {u for h, _, t in rel2 for u in (h, t)}
    shared = sorted(int(u.rsplit("e", 1)[1]) for u in ents1
                    if uri2(int(u.rsplit("e", 1)[1])) in ents2)
    n_aligned = int(aligned_frac * len(shared))
    links = [(uri1(e), uri2(e)) for e in shared[:n_aligned]]
    return rel1, rel2, links


def write_kg_pair_folder(folder: str, num_entities: int = 1000,
                         num_relations: int = 20, num_triples: int = 4000,
                         division: str = "721_5fold/1/", seed: int = 0,
                         **kw) -> str:
    """Materialize a synthetic pair as an OpenEA-format dataset folder
    (rel_triples_1/2 + <division>/train|valid|test_links) for CLI tests."""
    rel1, rel2, links = _synthesize_raw(
        num_entities, num_relations, num_triples,
        kw.get("aligned_frac", 1.0), kw.get("edge_keep_prob", 0.85),
        kw.get("noise_edge_frac", 0.15), seed)
    rng = np.random.RandomState(seed + 1)
    links = [links[i] for i in rng.permutation(len(links))]
    n_train = int(kw.get("train_frac", 0.2) * len(links))
    n_valid = int(kw.get("valid_frac", 0.1) * len(links))

    os.makedirs(os.path.join(folder, division), exist_ok=True)

    def wtriples(name, triples):
        with open(os.path.join(folder, name), "w", encoding="utf8") as f:
            for h, r, t in sorted(triples):
                f.write(f"{h}\t{r}\t{t}\n")

    def wlinks(name, pairs):
        with open(os.path.join(folder, division, name), "w", encoding="utf8") as f:
            for a, b in pairs:
                f.write(f"{a}\t{b}\n")

    wtriples("rel_triples_1", rel1)
    wtriples("rel_triples_2", rel2)
    open(os.path.join(folder, "attr_triples_1"), "w").close()
    open(os.path.join(folder, "attr_triples_2"), "w").close()
    wlinks("train_links", links[:n_train])
    wlinks("valid_links", links[n_train:n_train + n_valid])
    wlinks("test_links", links[n_train + n_valid:])
    return folder
