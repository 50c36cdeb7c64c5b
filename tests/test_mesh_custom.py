"""Mesh coverage for the custom-objective models (round-4: the last
models with no multi-chip path — IMUSE, Attr2Vec-in-JAPE, KDCoE,
MultiKE, GMNN).  Each trains on the 8-device mesh; the sharded-table
models assert their row shardings, the data-parallel ones assert the
mesh is active and training stays finite, and metric-level agreement vs
single-device is checked where the model is deterministic enough."""

import jax
import numpy as np
import pytest

from tests.test_attr_family import attr_kgs
from tests.test_models_e2e import run_model, test_hits1

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


@pytest.mark.slow
def test_imuse_mesh_training():
    kw = dict(learning_rate=0.02, init="normal", loss="margin-based",
              neg_sampling="uniform", optimizer="SGD", eval_metric="inner",
              loss_norm="L2", margin=1.5, ent_l2_norm=True,
              rel_l2_norm=True, neg_triple_num=1, sim_thresholds_ent=0.6,
              sim_thresholds_attr=0.6, interactive_model_iter_num=1,
              eval_norm=True, start_valid=1000, eval_freq=1000)
    kgs = attr_kgs("sharing")
    m1, _ = run_model("IMUSE", "sharing", epochs=10, kgs=kgs, **kw)
    m2, _ = run_model("IMUSE", "sharing", epochs=10, kgs=kgs,
                      use_mesh=True, **kw)
    assert m2.mesh is not None and m2.mesh.size == 8
    assert m2.params["ent_embeds"].sharding.spec[0] == "model"
    h1, mrr1 = test_hits1(m1)
    h2, mrr2 = test_hits1(m2)
    assert np.isfinite(mrr2)
    assert abs(h1 - h2) <= 3.0


@pytest.mark.slow
def test_jape_attr2vec_mesh_training(capsys):
    """JAPE on the mesh also trains its Attr2Vec sub-model data-parallel
    (the attribute-correlation skip-gram)."""
    kw = dict(learning_rate=0.05, init="normal", neg_sampling="uniform",
              optimizer="Adagrad", eval_metric="inner", loss_norm="L2",
              ent_l2_norm=True, rel_l2_norm=True, neg_triple_num=1,
              neg_alpha=0.1, top_attr_threshold=0.9,
              attr_sim_mat_threshold=0.95, attr_sim_mat_beta=0.001,
              sub_mat_size=50, attr_max_epoch=10,
              start_valid=1000, eval_freq=1000)
    m, _ = run_model("JAPE", "sharing", epochs=10, kgs=attr_kgs("sharing"),
                     use_mesh=True, **kw)
    out = capsys.readouterr().out
    assert out.count("mesh training enabled") >= 2   # JAPE + Attr2Vec
    assert "data-parallel skip-gram" in out
    assert m.mesh is not None
    h, mrr = test_hits1(m)
    assert np.isfinite(mrr) and h > 10.0


@pytest.mark.slow
def test_kdcoe_mesh_training():
    from tests.test_kdcoe import kdcoe_kgs
    kw = dict(dim=32, init="unit", learning_rate=0.02, optimizer="Adagrad",
              eval_metric="inner", loss_norm="L2", margin=1.5, alpha=5,
              new_param=0.1, max_iter=2, sim_th=0.5, desc_sim_th=0.6,
              desc_batch_size=32, default_desc_length=4, wv_dim=16,
              ent_l2_norm=True, rel_l2_norm=True, neg_triple_num=1,
              neg_sampling="uniform", eval_norm=True,
              start_valid=1000, eval_freq=5)
    m, _ = run_model("KDCoE", "mapping", epochs=10, kgs=kdcoe_kgs(),
                     use_mesh=True, **kw)
    assert m.mesh is not None and m.mesh.size == 8
    assert m.params["ent_embeds"].sharding.spec[0] == "model"
    h, mrr = test_hits1(m)
    assert np.isfinite(mrr)
    m.test_desc()


@pytest.mark.slow
def test_multike_mesh_training():
    from tests.test_multike import mk_kgs
    kw = dict(dim=24, init="xavier", learning_rate=0.01, optimizer="SGD",
              neg_triple_num=2, literal_len=3, word2vec_dim=24,
              encoder_active="tanh", encoder_normalize=True,
              encoder_epoch=10, literal_normalize=True,
              attribute_batch_size=400, entity_batch_size=200,
              ITC_learning_rate=0.004, cv_weight=1, orthogonal_weight=2,
              predicate_init_sim=0.9, predicate_soft_sim=0.8,
              start_predicate_soft_alignment=5, eval_metric="inner",
              eval_norm=True, batch_size=400, start_valid=1000,
              eval_freq=1000)
    kgs = mk_kgs()
    m1, _ = run_model("MultiKE", "swapping", epochs=5, kgs=kgs, **kw)
    m2, _ = run_model("MultiKE", "swapping", epochs=5, kgs=kgs,
                      use_mesh=True, **kw)
    assert m2.mesh is not None and m2.mesh.size == 8
    assert m2.params["rv_ent_embeds"].sharding.spec[0] == "model"
    assert m2.params["ent_embeds"].sharding.spec[0] == "model"
    h1, mrr1 = test_hits1(m1)
    h2, mrr2 = test_hits1(m2)
    assert np.isfinite(mrr2)
    assert abs(h1 - h2) <= 5.0


@pytest.mark.slow
def test_gmnn_mesh_training():
    from tests.test_hard_synthetic import hard_kgs
    kgs = hard_kgs("mapping", num_entities=80, num_relations=5,
                   num_triples=500, train_frac=0.4, seed=17,
                   num_attributes=0)
    m, _ = run_model("GMNN", "mapping", epochs=3, kgs=kgs,
                     use_mesh=True, cand_size=10, word_embedding_dim=16,
                     hidden_layer_dim=16, aggregator_dim_first=16,
                     cosine_MP_dim=4, word_size_max=2,
                     sample_size_per_layer=1, dev_batch_size=20,
                     batch_size=40, subgraph_size=8, start_valid=1000,
                     eval_freq=1000, stop_metric="hits1")
    assert m.mesh is not None and m.mesh.size == 8
    h1, mrr = m._rank_eval(m._test_ex, "accurate")
    assert np.isfinite(mrr)
