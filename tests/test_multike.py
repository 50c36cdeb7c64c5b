"""MultiKE: literal encoder, predicate alignment, multi-view training."""

import numpy as np
import pytest

from openea_tpu.data.synthetic import synthesize_kg_pair
from tests.test_models_e2e import run_model, test_hits1


def mk_kgs():
    return synthesize_kg_pair(num_entities=100, num_relations=5,
                              num_triples=600, mode="swapping",
                              edge_keep_prob=1.0, noise_edge_frac=0.0,
                              train_frac=0.3, num_attributes=6,
                              attrs_per_entity=3, seed=21)


def test_clear_attribute_triples():
    from openea_tpu.models.literal_encoder import clear_attribute_triples
    triples = [(i, 0, f'"value {i}"@en') for i in range(12)]
    triples += [(0, 1, "rare")]          # attribute with < 10 triples
    out, nums, strs = clear_attribute_triples(triples)
    assert all(a == 0 for _, a, _ in out)
    assert any(v.startswith("value") for _, _, v in out)


def test_autoencoder_reconstructs():
    from openea_tpu.models.literal_encoder import AutoEncoder
    from openea_tpu.config import Args
    rng = np.random.RandomState(0)
    mats = rng.randn(50, 3, 8).astype(np.float32)
    args = Args(dim=8, literal_len=3, word2vec_dim=8, encoder_active="tanh",
                encoder_normalize=True, batch_size=25)
    ae = AutoEncoder(mats, args, hidden=[16, 8])
    before = float(np.mean(np.square(
        ae.encode_all() @ np.zeros((8, 1)))))  # smoke shape
    ae.train(30, 25)
    enc = ae.encode_all()
    assert enc.shape == (50, 8)
    assert np.all(np.isfinite(enc))


def test_predicate_alignment_bootstrap():
    from openea_tpu.models.predicate_align import init_predicate_alignment
    d1 = {"http://kg1/born_in": "born in", "http://kg1/likes": "likes"}
    d2 = {"http://kg2/born_in": "born in", "http://kg2/hates": "hates"}
    pairs, latent = init_predicate_alignment(d1, d2, 0.8)
    assert ("http://kg1/born_in", "http://kg2/born_in", 1.0) in pairs


@pytest.mark.slow
def test_multike_e2e_learns():
    model, kgs = run_model(
        "MultiKE", "swapping", epochs=10, kgs=mk_kgs(),
        dim=24, init="xavier", learning_rate=0.01, optimizer="SGD",
        neg_triple_num=2, literal_len=3, word2vec_dim=24,
        encoder_active="tanh", encoder_normalize=True, encoder_epoch=10,
        literal_normalize=True, attribute_batch_size=400,
        entity_batch_size=200, ITC_learning_rate=0.004, cv_weight=1,
        orthogonal_weight=2, predicate_init_sim=0.9, predicate_soft_sim=0.8,
        start_predicate_soft_alignment=5, eval_metric="inner",
        eval_norm=True, batch_size=400, start_valid=1000, eval_freq=1000)
    hits1, mrr = test_hits1(model)
    # names are shared across aligned entities -> strong signal
    assert np.isfinite(mrr)
    assert hits1 > 20.0


@pytest.mark.slow
def test_multike_wva_test_path():
    model, kgs = run_model(
        "MultiKE", "swapping", epochs=3, kgs=mk_kgs(),
        dim=16, init="xavier", learning_rate=0.01, optimizer="SGD",
        neg_triple_num=2, literal_len=3, word2vec_dim=16,
        encoder_active="tanh", encoder_normalize=True, encoder_epoch=5,
        literal_normalize=True, attribute_batch_size=400,
        entity_batch_size=200, ITC_learning_rate=0.004, cv_weight=1,
        orthogonal_weight=2, predicate_init_sim=0.9, predicate_soft_sim=0.8,
        start_predicate_soft_alignment=99, eval_metric="inner",
        eval_norm=True, batch_size=400, test_method="wva",
        start_valid=1000, eval_freq=1000)
    model.test(save=False)
