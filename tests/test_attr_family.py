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
