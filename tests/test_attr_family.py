"""JAPE / Attr2Vec / AttrE / IMUSE."""

import numpy as np
import pytest

from openea_tpu.data.synthetic import synthesize_kg_pair
from tests.test_models_e2e import run_model, test_hits1


def attr_kgs(mode, seed=7):
    return synthesize_kg_pair(num_entities=200, num_relations=8,
                              num_triples=2000, mode=mode,
                              edge_keep_prob=1.0, noise_edge_frac=0.0,
                              train_frac=0.3, num_attributes=30,
                              attrs_per_entity=4, seed=seed)


def test_ngram_weights_match_prefix_means():
    from openea_tpu.models.attre import ngram_weights
    L = 5
    w = ngram_weights(L)
    rng = np.random.RandomState(0)
    v = rng.randn(L, 3)
    naive = sum(v[:n].mean(axis=0) for n in range(1, L + 1))
    assert np.allclose(v.T @ w, naive.T, atol=1e-5)


def test_formatting_attr_triples():
    from openea_tpu.models.attre import formatting_attr_triples
    kgs = attr_kgs("sharing")
    t1, t2, chars, vocab = formatting_attr_triples(kgs, 5)
    assert len(t1) > 0 and len(t2) > 0
    assert chars.shape[1] == 5
    assert vocab > 1
    assert chars.max() < vocab


def test_jape_e2e_learns():
    model, kgs = run_model(
        "JAPE", "sharing", epochs=60, kgs=attr_kgs("sharing"),
        learning_rate=0.05, init="normal", neg_sampling="uniform",
        optimizer="Adagrad", eval_metric="inner", loss_norm="L2",
        ent_l2_norm=True, rel_l2_norm=True, neg_triple_num=1,
        neg_alpha=0.1, top_attr_threshold=0.9, attr_sim_mat_threshold=0.95,
        attr_sim_mat_beta=0.001, sub_mat_size=50, attr_max_epoch=20,
        start_valid=1000, eval_freq=1000)
    hits1, mrr = test_hits1(model)
    assert hits1 > 30.0


def test_attre_e2e_learns():
    model, kgs = run_model(
        "AttrE", "sharing", epochs=60, kgs=attr_kgs("sharing"),
        learning_rate=0.02, init="normal", loss="margin-based",
        neg_sampling="uniform", optimizer="SGD", eval_metric="inner",
        loss_norm="L2", margin=1.5, ent_l2_norm=True, rel_l2_norm=True,
        attr_l2_norm=True, char_l2_norm=True, neg_triple_num=1,
        literal_len=5, eval_norm=True, start_valid=1000, eval_freq=1000)
    hits1, mrr = test_hits1(model)
    assert hits1 > 20.0


def test_imuse_interactive_model_finds_pairs():
    from openea_tpu.models.imuse import interactive_model
    from openea_tpu.config import Args
    kgs = attr_kgs("sharing")
    args = Args(sim_thresholds_ent=0.6, sim_thresholds_attr=0.6,
                interactive_model_iter_num=1)
    pairs = interactive_model(kgs, args)
    # synthetic aligned entities share attribute names and values -> the
    # unsupervised bootstrap should find mostly-correct pairs
    assert len(pairs) > 10


def test_imuse_e2e_learns():
    model, kgs = run_model(
        "IMUSE", "sharing", epochs=50, kgs=attr_kgs("sharing"),
        learning_rate=0.02, init="normal", loss="margin-based",
        neg_sampling="uniform", optimizer="SGD", eval_metric="inner",
        loss_norm="L2", margin=1.5, ent_l2_norm=True, rel_l2_norm=True,
        neg_triple_num=1, sim_thresholds_ent=0.6, sim_thresholds_attr=0.6,
        interactive_model_iter_num=1, eval_norm=True,
        start_valid=1000, eval_freq=1000)
    hits1, mrr = test_hits1(model)
    assert hits1 > 20.0


def test_imuse_vectorized_matches_pooled_worker():
    """The native-matrix scoring path returns the same (e1, e2, sim)
    rows as the python worker loop (modulo exact-tie argmax order),
    on a random attribute landscape with repeated values."""
    import numpy as np
    from openea_tpu.models.imuse import (_align_entities_vectorized,
                                         _ea_worker, _first_value_dict)
    rng = np.random.RandomState(5)
    trip1, trip2 = set(), set()
    for e in range(60):
        for a in rng.choice(8, 3, replace=False):
            trip1.add((e, int(a), "v%d_%d" % (a, rng.randint(20))))
    for e in range(70):
        for a in rng.choice(8, 3, replace=False):
            trip2.add((e, int(a), "v%d_%d" % (a, rng.randint(20))))
    ea1, eav1 = _first_value_dict(trip1)
    ea2, eav2 = _first_value_dict(trip2)
    pairs = [(1, 1), (3, 3), (5, 4)]
    th = 0.55
    vec = _align_entities_vectorized(ea1, eav1, ea2, eav2, pairs, th)
    assert vec is not None, "native lev kernel missing"
    by2 = {}
    for e2, attrs in ea2.items():
        for a2 in attrs:
            by2.setdefault(a2, set()).add(e2)
    ref = _ea_worker(list(ea1.items()), ea2, eav1, eav2, by2, pairs, th)
    # same e1 set and same best SIM per e1 (tie targets may differ)
    vec_sim = {e1: round(s, 5) for e1, _, s in vec}
    ref_sim = {e1: round(s, 5) for e1, _, s in ref}
    assert vec_sim == ref_sim
