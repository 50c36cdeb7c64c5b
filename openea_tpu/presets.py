"""Canonical hyperparameter presets for every approach/model, per scale.

These are the published experiment configurations of the OpenEA benchmark
(reference run/args/*_15K.json and *_100K.json — 64 JSON files), kept here
as Python data so (a) a user can run any benchmark config without hunting
for JSON files and (b) the 100K variants are expressed as deltas on 15K
instead of near-duplicate files.  `load_args` still reads raw reference
JSON presets unchanged; this module is the built-in registry.

Use: ``get_preset("bootea", "15K", training_data=..., output=...)``
or the CLI: ``python -m openea_tpu.cli.main_from_args preset:bootea_15K D_W_15K_V1 721_5fold/1/``.
"""

from __future__ import annotations

import copy
from typing import Any, Dict

from openea_tpu.config import Args

# keys shared by nearly all presets
_BASE: Dict[str, Any] = {
    "training_data": "../../datasets/",
    "output": "../../output/results/",
    "dataset_division": "721_5fold/1/",
    "search_module": "greedy",
    "ordered": True,
    "top_k": [1, 5, 10, 50],
    "csls": 10,
    "eval_freq": 10,
    "stop_metric": "hits1",
    "max_epoch": 2000,
    "is_save": True,
    "batch_threads_num": 2,
    "test_threads_num": 4,
}

_TRANS_COMMON = {
    "alignment_module": "sharing", "dim": 100, "init": "normal",
    "loss": "margin-based", "loss_norm": "L2", "margin": 1.5,
    "learning_rate": 0.01, "optimizer": "Adagrad", "batch_size": 5000,
    "neg_sampling": "uniform", "neg_triple_num": 1, "ent_l2_norm": True,
    "rel_l2_norm": True, "eval_metric": "inner", "eval_norm": False,
    "start_valid": 100,
}

PRESETS_15K: Dict[str, Dict[str, Any]] = {
    "mtranse": {
        "embedding_module": "MTransE", "alignment_module": "mapping",
        "dim": 100, "init": "unit", "loss_norm": "L2", "alpha": 5,
        "learning_rate": 0.01, "optimizer": "Adagrad", "batch_size": 5000,
        "ent_l2_norm": True, "rel_l2_norm": True, "eval_metric": "inner",
        "eval_norm": True, "start_valid": 100,
    },
    "aligne": {
        "embedding_module": "AlignE", "alignment_module": "swapping",
        "dim": 100, "init": "normal", "loss": "limited", "loss_norm": "L2",
        "pos_margin": 0.01, "neg_margin": 2.0, "neg_margin_balance": 0.2,
        "learning_rate": 0.01, "optimizer": "Adagrad", "batch_size": 5000,
        "neg_sampling": "truncated", "neg_triple_num": 10,
        "truncated_epsilon": 0.9, "truncated_freq": 10,
        "ent_l2_norm": True, "rel_l2_norm": True, "eval_metric": "inner",
        "eval_norm": False, "start_valid": 100,
    },
    "bootea": {
        "embedding_module": "BootEA", "alignment_module": "swapping",
        "dim": 100, "init": "normal", "loss": "limited", "loss_norm": "L2",
        "pos_margin": 0.01, "neg_margin": 2.0, "neg_margin_balance": 0.2,
        "learning_rate": 0.01, "optimizer": "Adagrad", "batch_size": 5000,
        "neg_sampling": "truncated", "neg_triple_num": 10,
        "truncated_epsilon": 0.9, "truncated_freq": 10,
        "ent_l2_norm": True, "rel_l2_norm": True, "eval_metric": "inner",
        "eval_norm": False, "start_valid": 100,
        "sim_th": 0.7, "k": 10, "sub_epoch": 10, "likelihood_slice": 10,
    },
    "transh": dict(_TRANS_COMMON, embedding_module="TransH"),
    "transr": dict(_TRANS_COMMON, embedding_module="TransR"),
    "transd": dict(_TRANS_COMMON, embedding_module="TransD"),
    # TransE/DistMult have no shipped reference preset; these mirror the
    # TransH family contract + each model's own asserts
    "transe": dict(_TRANS_COMMON, embedding_module="TransE"),
    "distmult": dict(_TRANS_COMMON, embedding_module="DistMult",
                     optimizer="Adagrad", neg_triple_num=10),
    "hole": {
        "embedding_module": "HolE", "alignment_module": "sharing",
        "dim": 100, "init": "xavier", "loss_norm": "L2", "margin": 0.2,
        "learning_rate": 0.01, "optimizer": "Adagrad", "batch_size": 5000,
        "neg_sampling": "uniform", "neg_triple_num": 1, "ent_l2_norm": True,
        "rel_l2_norm": True, "eval_metric": "inner", "eval_norm": False,
        "start_valid": 100,
    },
    "simple": {
        "embedding_module": "SimplE", "alignment_module": "sharing",
        "dim": 100, "init": "xavier", "learning_rate": 0.01,
        "optimizer": "Adagrad", "batch_size": 5000,
        "neg_sampling": "uniform", "neg_triple_num": 1, "ent_l2_norm": True,
        "rel_l2_norm": True, "eval_metric": "inner", "eval_norm": True,
        "start_valid": 10,
    },
    "rotate": {
        "embedding_module": "RotatE", "alignment_module": "sharing",
        "dim": 100, "init": "uniform", "gamma": 12.0, "learning_rate": 0.1,
        "optimizer": "Adam", "batch_size": 5000, "neg_sampling": "uniform",
        "neg_triple_num": 10, "ent_l2_norm": True, "rel_l2_norm": True,
        "eval_metric": "inner", "eval_norm": True, "start_valid": 200,
    },
    "proje": {
        "embedding_module": "ProjE", "alignment_module": "sharing",
        "dim": 100, "init": "xavier", "dnn_neg_nums": 4096,
        "learning_rate": 0.001, "optimizer": "Adam", "batch_size": 500,
        "ent_l2_norm": True, "rel_l2_norm": True, "eval_metric": "inner",
        "eval_norm": True, "start_valid": 100,
    },
    "conve": {
        "embedding_module": "ConvE", "alignment_module": "sharing",
        "dim": 100, "init": "xavier", "dnn_neg_nums": 4096,
        "filter_num": 32, "output_keep_prob": 0.7,
        "learning_rate": 0.001, "optimizer": "Adam", "batch_size": 500,
        "ent_l2_norm": True, "rel_l2_norm": True, "eval_metric": "inner",
        "eval_norm": True, "start_valid": 100,
    },
    "gcnalign": {
        "embedding_module": "GCN_Align", "alignment_module": "mapping",
        "dim": 100, "se_dim": 100, "ae_dim": 100, "hidden1": 100,
        "dropout": 0.0, "gamma": 3.0, "beta": 0.9, "learning_rate": 8,
        "batch_size": 5000, "neg_sampling": "uniform", "neg_triple_num": 5,
        "support_number": 1, "test_method": "sa", "early_stop": False,
        "eval_metric": "manhattan", "eval_norm": False, "start_valid": 100,
        # bf16 feature gathers in the Pallas SpMM (f32 accumulate): ~2x
        # less HBM traffic; metric-neutral on the hard tier
        # (tests/test_hard_synthetic.py bf16 parity tests)
        "spmm_precision": "default",
    },
    "rdgcn": {
        "embedding_module": "RDGCN", "alignment_module": "mapping",
        "dim": 300, "alpha": 0.1, "beta": 0.3, "gamma": 1.0, "dropout": 0.0,
        "learning_rate": 0.002, "batch_size": 5000,
        "neg_sampling": "uniform", "neg_triple_num": 125,
        "eval_metric": "manhattan", "eval_norm": False, "start_valid": 30,
        "spmm_precision": "default",
    },
    "alinet": {
        "embedding_module": "AliNet", "alignment_module": "mapping",
        "init": "xavier", "layer_dims": [500, 400, 300], "dropout": 0.0,
        "neg_margin": 1.5, "neg_margin_balance": 0.1, "learning_rate": 0.001,
        "optimizer": "Adam", "batch_size": 3000, "neg_sampling": "truncated",
        "neg_triple_num": 10, "truncated_epsilon": 0.98, "truncated_freq": 10,
        "min_rel_win": 50, "rel_param": 0.01, "sim_th": 0.0,
        "start_augment": 2, "k": 20, "num_features_nonzero": 0,
        "ent_l2_norm": True, "rel_l2_norm": True, "eval_metric": "inner",
        "eval_norm": False, "start_valid": 10,
        # bf16 attention SpMM (~2e-3 rel err, 2x MXU): presets opt in;
        # the library default is f32-exact 'highest' (models/alinet.py)
        "att_precision": "default",
    },
    "iptranse": {
        "embedding_module": "IPTransE", "alignment_module": "sharing",
        "dim": 100, "init": "normal", "loss_norm": "L2", "margin": 1.5,
        "learning_rate": 0.01, "optimizer": "Adagrad", "batch_size": 5000,
        "neg_sampling": "uniform", "neg_triple_num": 1, "path_parm": 0.1,
        "bp_freq": 100, "sim_th": 0.7, "ent_l2_norm": True,
        "rel_l2_norm": True, "eval_metric": "inner", "eval_norm": False,
        "start_valid": 100,
    },
    "jape": {
        "embedding_module": "JAPE", "alignment_module": "sharing",
        "dim": 100, "init": "normal", "loss_norm": "L2", "neg_alpha": 0.1,
        "learning_rate": 0.01, "optimizer": "Adagrad", "batch_size": 5000,
        "neg_sampling": "uniform", "neg_triple_num": 1,
        "attr_max_epoch": 200, "attr_sim_mat_beta": 0.001,
        "attr_sim_mat_threshold": 0.95, "top_attr_threshold": 0.9,
        "sub_mat_size": 1000, "ent_l2_norm": True, "rel_l2_norm": True,
        "eval_metric": "inner", "eval_norm": False, "start_valid": 100,
    },
    "attre": {
        "embedding_module": "AttrE", "alignment_module": "sharing",
        "dim": 100, "init": "normal", "loss": "margin-based",
        "loss_norm": "L2", "margin": 1.5, "learning_rate": 0.01,
        "optimizer": "SGD", "batch_size": 5000, "neg_sampling": "uniform",
        "neg_triple_num": 1, "literal_len": 5, "attr_l2_norm": True,
        "char_l2_norm": True, "ent_l2_norm": True, "rel_l2_norm": True,
        "eval_metric": "inner", "eval_norm": True, "start_valid": 100,
    },
    "imuse": {
        "embedding_module": "IMUSE", "alignment_module": "sharing",
        "dim": 100, "init": "normal", "loss": "margin-based",
        "loss_norm": "L2", "margin": 1.5, "learning_rate": 0.01,
        "optimizer": "SGD", "batch_size": 5000, "neg_sampling": "uniform",
        "neg_triple_num": 1, "sim_thresholds_attr": 0.6,
        "sim_thresholds_ent": 0.6, "interactive_model_iter_num": 1,
        "ent_l2_norm": True, "rel_l2_norm": True, "eval_metric": "inner",
        "eval_norm": True, "start_valid": 10,
    },
    "sea": {
        "embedding_module": "SEA", "alignment_module": "mapping",
        "dim": 100, "init": "normal", "loss": "margin-based",
        "loss_norm": "L2", "margin": 1.5, "alpha_1": 2.5, "alpha_2": 0.25,
        "learning_rate": 0.01, "optimizer": "Adam", "batch_size": 5000,
        "neg_sampling": "uniform", "neg_triple_num": 1, "ent_l2_norm": True,
        "rel_l2_norm": True, "eval_metric": "inner", "eval_norm": True,
        "start_valid": 10,
    },
    "rsn4ea": {
        "embedding_module": "RSN4EA", "alignment_module": "mapping",
        "dim": 100, "init": "normal", "alpha": 0.7, "beta": 0.7,
        "hidden_size": 100, "num_layers": 2, "max_length": 15,
        "num_samples": 10240, "keep_prob": 0.6, "learning_rate": 0.0005,
        "optimizer": "Adagrad", "batch_size": 512, "max_epoch": 30,
        "eval_freq": 3, "ent_l2_norm": True, "rel_l2_norm": True,
        "eval_metric": "inner", "eval_norm": False, "start_valid": 1,
    },
    "kdcoe": {
        "embedding_module": "KDCoE", "alignment_module": "mapping",
        "dim": 100, "init": "unit", "loss_norm": "L2", "margin": 1.5,
        "alpha": 5, "new_param": 0.1, "max_iter": 5, "sim_th": 0.8,
        "desc_sim_th": 0.95, "desc_batch_size": 512,
        "default_desc_length": 4, "wv_dim": 300,
        "word_embed": "../../datasets/wiki-news-300d-1M.vec",
        "learning_rate": 0.01, "optimizer": "Adagrad", "batch_size": 5000,
        "neg_sampling": "uniform", "neg_triple_num": 1, "ent_l2_norm": True,
        "rel_l2_norm": True, "eval_metric": "inner", "eval_norm": True,
        "start_valid": 100,
    },
    "multike": {
        "embedding_module": "MultiKE", "alignment_module": "swapping",
        "dim": 100, "init": "xavier", "loss": "margin-based",
        "loss_norm": "L2", "margin": 1.5, "learning_rate": 0.001,
        "optimizer": "SGD", "batch_size": 5000, "neg_sampling": "normal",
        "neg_triple_num": 10, "truncated_epsilon": 0.98,
        "truncated_freq": 20, "literal_len": 5, "attr_l2_norm": True,
        "encoder_epoch": 100, "encoder_active": "thah",
        "encoder_normalize": True, "literal_normalize": True,
        "retrain_literal_embeds": True, "word2vec_dim": 300,
        "word2vec_path": "../../datasets/wiki-news-300d-1M.vec",
        "attribute_batch_size": 5000, "entity_batch_size": 5000,
        "relation_learning_rate": 0.005, "ITC_learning_rate": 0.004,
        "cv_name_weight": 1, "cv_weight": 1, "orthogonal_weight": 2,
        "predicate_init_sim": 0.9, "predicate_soft_sim": 0.8,
        "start_predicate_soft_alignment": 10,
        "shared_learning_max_epoch": 200, "ent_l2_norm": True,
        "rel_l2_norm": True, "eval_metric": "inner", "eval_norm": True,
        "start_valid": 10,
    },
    "gmnn": {
        "embedding_module": "GMNN", "alignment_module": "mapping",
        "batch_size": 20, "dev_batch_size": 20, "cand_size": 100,
        "word_embedding_dim": 100, "hidden_layer_dim": 100,
        "aggregator_dim_first": 100, "aggregator_dim_second": 100,
        "cosine_MP_dim": 10, "sample_size_per_layer": 1,
        "word_size_max": 1, "learning_rate": 0.01, "max_epoch": 200,
        "eval_freq": 2, "start_valid": 15, "eval_metric": "manhattan",
        "eval_norm": False, "dropout": 0.0, "subgraph_size": 12,
    },
    "bootea_rotate": {
        "embedding_module": "BootEA_RotatE", "alignment_module": "swapping",
        "dim": 100, "init": "normal", "gamma": 12.0, "learning_rate": 0.01,
        "optimizer": "Adam", "batch_size": 5000, "neg_sampling": "uniform",
        "neg_triple_num": 10, "truncated_epsilon": 0.9, "truncated_freq": 10,
        "sim_th": 0.75, "k": 10, "sub_epoch": 10, "align_times": 1,
        "min_iter": 40, "start_bp": 5000, "ent_l2_norm": True,
        "rel_l2_norm": False, "eval_metric": "inner", "eval_norm": True,
        "start_valid": 10,
    },
    "bootea_transh": {
        "embedding_module": "BootEA_TransH", "alignment_module": "swapping",
        "dim": 100, "init": "normal", "loss": "limited", "loss_norm": "L2",
        "pos_margin": 0.01, "neg_margin": 2.0, "neg_margin_balance": 0.2,
        "learning_rate": 0.01, "optimizer": "Adagrad", "batch_size": 5000,
        "neg_sampling": "truncated", "neg_triple_num": 10,
        "truncated_epsilon": 0.9, "truncated_freq": 10, "sim_th": 0.7,
        "k": 10, "sub_epoch": 10, "likelihood_slice": 10,
        "ent_l2_norm": True, "rel_l2_norm": True, "eval_metric": "inner",
        "eval_norm": False, "start_valid": 100,
    },
}

# 100K deltas (reference *_args_100K.json vs *_args_15K.json)
_DELTAS_100K: Dict[str, Dict[str, Any]] = {
    "__default__": {"batch_size": 20000},
    "aligne": {"batch_size": 20000, "truncated_epsilon": 0.98},
    "alinet": {"batch_size": 20000, "truncated_epsilon": 0.995},
    "bootea": {"batch_size": 20000, "truncated_epsilon": 0.98, "sub_epoch": 20},
    "bootea_transh": {"batch_size": 20000, "truncated_epsilon": 0.98,
                      "sub_epoch": 20},
    "conve": {"batch_size": 5000, "start_valid": 300},
    "proje": {"batch_size": 5000, "start_valid": 300},
    "imuse": {"batch_size": 20000, "start_valid": 100},
    "kdcoe": {"batch_size": 20000, "desc_batch_size": 4048},
    "rdgcn": {"batch_size": 20000, "neg_triple_num": 10,
              "learning_rate": 0.001},
    "rsn4ea": {"batch_size": 2048},
    "simple": {"batch_size": 20000, "start_valid": 50},
}


def preset_names():
    return sorted(PRESETS_15K)


def get_preset_dict(name: str, scale: str = "15K") -> Dict[str, Any]:
    name = name.lower()
    if name not in PRESETS_15K:
        raise KeyError(f"unknown preset {name!r}; known: {preset_names()}")
    values = copy.deepcopy(_BASE)
    values.update(PRESETS_15K[name])
    if scale.upper() == "100K":
        values.update(_DELTAS_100K.get(name, _DELTAS_100K["__default__"]))
    elif scale.upper() != "15K":
        raise ValueError(f"unknown scale {scale!r} (want 15K or 100K)")
    return values


def get_preset(name: str, scale: str = "15K", **overrides: Any) -> Args:
    values = get_preset_dict(name, scale)
    values.update(overrides)
    return Args(values)
