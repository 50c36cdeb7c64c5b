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
    hard: bool = False,
    train_noise: float = 0.0,
) -> KGs:
    """Build a KGs pair with URI-level files semantics, fully in memory.

    With ``num_attributes > 0``, each entity also gets attribute triples
    drawn from a popularity-skewed attribute pool; aligned entities draw
    the same attributes (so attribute-based views are learnable).

    ``hard=True`` selects the honest difficulty tier: perturbed multi-token
    entity names (name/word-vector models can't saturate at init), noisy
    attribute values, degree-correlated edge dropout and edge rewiring in
    KG2 (structure models see systematic, not i.i.d., mismatch).
    ``train_noise`` corrupts that fraction of the TRAIN seed links
    (kg2 sides shuffled among themselves); valid/test links stay clean so
    metrics remain meaningful.  Defaults reproduce the easy tier exactly.
    """
    rel1, rel2, links = _synthesize_raw(
        num_entities, num_relations, num_triples, aligned_frac,
        edge_keep_prob, noise_edge_frac, seed, hard=hard)
    attr1, attr2 = _synthesize_attrs(num_entities, num_attributes,
                                     attrs_per_entity, seed, hard=hard)
    rng = np.random.RandomState(seed + 1)
    links = [links[i] for i in rng.permutation(len(links))]
    n_train = int(train_frac * len(links))
    n_valid = int(valid_frac * len(links))
    train = links[:n_train]
    valid = links[n_train:n_train + n_valid]
    test = links[n_train + n_valid:]
    if train_noise > 0.0 and n_train >= 2:
        train = _corrupt_train_links(train, train_noise, rng)
    kg1 = KG(list(rel1), list(attr1))
    kg2 = KG(list(rel2), list(attr2))
    return KGs(kg1, kg2, train, test, valid_links=valid, mode=mode, ordered=True)


def _corrupt_train_links(train, frac, rng):
    """Cyclically shuffle the kg2 side of a `frac` subset of train links —
    wrong-but-plausible supervision, as produced by noisy seed dictionaries
    in real cross-lingual pipelines."""
    n_bad = max(2, int(frac * len(train)))
    idx = rng.choice(len(train), size=n_bad, replace=False).tolist()
    train = list(train)
    kg2_sides = [train[i][1] for i in idx]
    kg2_sides = kg2_sides[1:] + kg2_sides[:1]      # cyclic mis-assignment
    for pos, wrong in zip(idx, kg2_sides):
        train[pos] = (train[pos][0], wrong)
    return train


def _synthesize_attrs(num_entities, num_attributes, attrs_per_entity, seed,
                      hard=False):
    if num_attributes <= 0:
        return [], []
    rng = np.random.RandomState(seed + 7)
    ranks = np.arange(1, num_attributes + 1, dtype=np.float64)
    pop = ranks ** -0.8
    pop /= pop.sum()
    uri1, uri2 = _entity_namers(num_entities, seed, hard)
    attr1, attr2 = [], []
    for e in range(num_entities):
        attrs = rng.choice(num_attributes, size=attrs_per_entity,
                           replace=False, p=pop)
        for a in attrs.tolist():
            attr1.append((uri1(e), f"http://kg1/a{a}", f"v{a}_{e}"))
            # hard tier: ~30% of kg2 values disagree and ~20% of kg2
            # attribute triples use a different (wrong) attribute id, so
            # value-similarity bootstraps (IMUSE/AttrE) get graded signal
            if hard and rng.rand() < 0.3:
                val = f"v{a}_{e}_{rng.randint(10)}"
            else:
                val = f"v{a}_{e}"
            a2 = rng.randint(num_attributes) if hard and rng.rand() < 0.2 else a
            attr2.append((uri2(e), f"http://kg2/a{a2}", val))
    return attr1, attr2


def _entity_namers(num_entities, seed, hard):
    """URI builders for both KGs.

    Easy tier: identical local names (e{i}) — name-vector models saturate,
    fine for mechanism/speed checks.  Hard tier: each entity gets a 3-token
    name from a shared zipf vocabulary plus a KG-unique suffix token; each
    kg2 token is independently replaced with prob 0.35.  Hashed word
    vectors (data/name_vectors.py) then give *graded* name similarity —
    strong for unperturbed names, absent for fully perturbed ones — like
    real cross-lingual label overlap, instead of an identity shortcut."""
    if not hard:
        return (lambda e: f"http://kg1/e{e}",
                lambda e: f"http://kg2/e{e}")
    rng = np.random.RandomState(seed + 11)
    vocab = max(8, num_entities // 2)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    pop = ranks ** -0.7
    pop /= pop.sum()
    toks1 = rng.choice(vocab, size=(num_entities, 3), p=pop)
    flip = rng.rand(num_entities, 3) < 0.35
    toks2 = np.where(flip, rng.choice(vocab, size=(num_entities, 3), p=pop),
                     toks1)
    names1 = ["_".join(f"w{t}" for t in row) for row in toks1.tolist()]
    names2 = ["_".join(f"w{t}" for t in row) for row in toks2.tolist()]
    return (lambda e: f"http://kg1/{names1[e]}_x{e}",
            lambda e: f"http://kg2/{names2[e]}_y{e}")


def _synthesize_raw(num_entities, num_relations, num_triples, aligned_frac,
                    edge_keep_prob, noise_edge_frac, seed, hard=False):
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

    uri1, uri2 = _entity_namers(num_entities, seed, hard)

    rel1 = {(uri1(h), f"http://kg1/r{r}", uri1(t))
            for h, r, t in zip(heads.tolist(), rels.tolist(), tails.tolist())}

    # KG2: keep a subset of KG1's edges (renamed), plus fresh noise edges.
    # Hard tier: dropout is DEGREE-CORRELATED (popular entities lose up to
    # 2x more of their edges — mismatch concentrates where GNN aggregation
    # has the most support, the adversarial case for structure models) and
    # 10% of kept edges are REWIRED to a random popular tail rather than
    # merely dropped (wrong evidence, not just missing evidence).
    if hard:
        pctl = np.empty(num_entities, np.float64)
        pctl[np.argsort(-pop)] = np.linspace(0.0, 1.0, num_entities)
        edge_pctl = np.minimum(pctl[heads], pctl[tails])
        keep_p = edge_keep_prob * (0.7 + 0.3 * edge_pctl)
        keep2 = rng.rand(len(heads)) < keep_p
        h2, r2, t2 = heads[keep2].copy(), rels[keep2].copy(), tails[keep2].copy()
        rewire = rng.rand(len(h2)) < 0.1
        t2[rewire] = rng.choice(num_entities, size=int(rewire.sum()), p=pop)
        ok = h2 != t2
        h2, r2, t2 = h2[ok], r2[ok], t2[ok]
    else:
        keep2 = rng.rand(len(heads)) < edge_keep_prob
        h2, r2, t2 = heads[keep2], rels[keep2], tails[keep2]
    rel2 = {(uri2(h), f"http://kg2/r{r}", uri2(t))
            for h, r, t in zip(h2.tolist(), r2.tolist(), t2.tolist())}
    n_noise = int(noise_edge_frac * len(heads))
    nh = rng.choice(num_entities, size=n_noise, p=pop)
    nt = rng.choice(num_entities, size=n_noise, p=pop)
    nr = rng.randint(0, num_relations, size=n_noise)
    rel2 |= {(uri2(h), f"http://kg2/r{r}", uri2(t))
             for h, r, t in zip(nh.tolist(), nr.tolist(), nt.tolist()) if h != t}

    in1 = {e for h, _, t in zip(heads.tolist(), rels.tolist(), tails.tolist())
           for e in (h, t)}
    in2 = set(h2.tolist()) | set(t2.tolist()) | \
        {e for e, f in zip(nh.tolist(), nt.tolist()) if e != f} | \
        {f for e, f in zip(nh.tolist(), nt.tolist()) if e != f}
    shared = sorted(in1 & in2)
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
        kw.get("noise_edge_frac", 0.15), seed, hard=kw.get("hard", False))
    rng = np.random.RandomState(seed + 1)
    links = [links[i] for i in rng.permutation(len(links))]
    n_train = int(kw.get("train_frac", 0.2) * len(links))
    n_valid = int(kw.get("valid_frac", 0.1) * len(links))
    if kw.get("train_noise", 0.0) > 0.0 and n_train >= 2:
        links[:n_train] = _corrupt_train_links(links[:n_train],
                                               kw["train_noise"], rng)

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
