"""wo_attr ablation: `use_attributes=False` must genuinely remove the
attribute computation for every approach the reference ablates
(/root/reference/src/openea/expriment/approaches_without_attribute/:
gcn_align, jape, attre, imuse, multi_ke, rdgcn — rdgcn covered in
tests/test_rdgcn.py)."""

import numpy as np

from openea_tpu.data.synthetic import synthesize_kg_pair
from tests.test_models_e2e import run_model, test_hits1


def attr_kgs(mode, seed=7):
    return synthesize_kg_pair(num_entities=200, num_relations=8,
                              num_triples=2000, mode=mode,
                              edge_keep_prob=1.0, noise_edge_frac=0.0,
                              train_frac=0.3, num_attributes=30,
                              attrs_per_entity=4, seed=seed)


def test_gcn_align_wo_attr_drops_ae_branch():
    model, _ = run_model(
        "GCN_Align", "mapping", epochs=30, kgs=attr_kgs("mapping"),
        learning_rate=2.0, gamma=3.0, beta=0.9, neg_triple_num=5,
        se_dim=32, ae_dim=32, dim=32, eval_metric="manhattan",
        eval_norm=False, test_method="sa", start_valid=1000, eval_freq=1000,
        use_attributes=False)
    assert model.attr_sp is None
    assert "w_ae" not in model.params
    hits1, _ = test_hits1(model)
    assert np.isfinite(hits1)


def test_jape_wo_attr_skips_attr2vec(capsys):
    model, _ = run_model(
        "JAPE", "sharing", epochs=20, kgs=attr_kgs("sharing"),
        learning_rate=0.05, init="normal", neg_sampling="uniform",
        optimizer="Adagrad", eval_metric="inner", loss_norm="L2",
        ent_l2_norm=True, rel_l2_norm=True, neg_triple_num=1,
        neg_alpha=0.1, top_attr_threshold=0.9, attr_sim_mat_threshold=0.95,
        attr_sim_mat_beta=0.001, sub_mat_size=50, attr_max_epoch=20,
        start_valid=1000, eval_freq=1000, use_attributes=False)
    out = capsys.readouterr().out
    assert "attribute loss" not in out     # Attr2Vec never trained
    assert "sim loss" not in out           # similarity regularizer skipped
    assert model.attr_sim_mat is None
    hits1, _ = test_hits1(model)
    assert np.isfinite(hits1)


def test_attre_wo_attr_trains_relations_only(capsys):
    model, _ = run_model(
        "AttrE", "sharing", epochs=20, kgs=attr_kgs("sharing"),
        learning_rate=0.02, init="normal", loss="margin-based",
        neg_sampling="uniform", optimizer="SGD", eval_metric="inner",
        loss_norm="L2", margin=1.5, ent_l2_norm=True, rel_l2_norm=True,
        attr_l2_norm=True, char_l2_norm=True, neg_triple_num=1,
        literal_len=5, eval_norm=True, start_valid=1000, eval_freq=1000,
        use_attributes=False)
    out = capsys.readouterr().out
    assert "CE, avg. triple loss" not in out   # char-embedding phase skipped
    assert "joint" not in out                  # joint phase skipped
    hits1, _ = test_hits1(model)
    assert np.isfinite(hits1)


def test_imuse_wo_attr_no_interactive_pairs(capsys):
    model, _ = run_model(
        "IMUSE", "sharing", epochs=20, kgs=attr_kgs("sharing"),
        learning_rate=0.02, init="normal", loss="margin-based",
        neg_sampling="uniform", optimizer="SGD", eval_metric="inner",
        loss_norm="L2", margin=1.5, ent_l2_norm=True, rel_l2_norm=True,
        neg_triple_num=1, sim_thresholds_ent=0.6, sim_thresholds_attr=0.6,
        interactive_model_iter_num=1, eval_norm=True,
        start_valid=1000, eval_freq=1000, use_attributes=False)
    out = capsys.readouterr().out
    assert len(model.aligned_ent_pair_set) == 0
    assert "align learning loss" not in out
    hits1, _ = test_hits1(model)
    assert np.isfinite(hits1)


def test_multike_wo_attr_relation_view_only(capsys):
    kgs = synthesize_kg_pair(num_entities=100, num_relations=5,
                             num_triples=600, mode="swapping",
                             edge_keep_prob=1.0, noise_edge_frac=0.0,
                             train_frac=0.3, num_attributes=6,
                             attrs_per_entity=3, seed=21)
    model, _ = run_model(
        "MultiKE", "swapping", epochs=3, kgs=kgs,
        dim=16, init="xavier", learning_rate=0.01, optimizer="SGD",
        neg_triple_num=2, literal_len=3, word2vec_dim=16,
        encoder_active="tanh", encoder_normalize=True, encoder_epoch=5,
        literal_normalize=True, attribute_batch_size=400,
        entity_batch_size=200, ITC_learning_rate=0.004, cv_weight=1,
        orthogonal_weight=2, predicate_init_sim=0.9, predicate_soft_sim=0.8,
        start_predicate_soft_alignment=2, eval_metric="inner",
        eval_norm=True, batch_size=400, start_valid=1000, eval_freq=1000,
        use_attributes=False)
    out = capsys.readouterr().out
    assert "attr view" not in out
    assert "cross-name" not in out
    assert "ckge attr" not in out
    # the final view aliases the relation view (reference
    # approaches_without_attribute/multi_ke.py:481)
    fin = np.asarray(model._t(model.params, "ent_embeds"))
    rv = np.asarray(model._t(model.params, "rv_ent_embeds"))
    assert np.allclose(fin, rv)
    # name vectors were never encoded
    assert not model.entity_local_name
    assert float(np.abs(model.local_name_vectors).sum()) == 0.0
