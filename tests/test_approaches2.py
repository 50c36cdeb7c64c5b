"""SEA / IPTransE / BootEA variants: e2e learnability + unit checks."""

import numpy as np
import pytest

from tests.test_models_e2e import make_kgs, run_model, test_hits1


def test_sea_e2e_learns():
    model, kgs = run_model(
        "SEA", "mapping", epochs=80, learning_rate=0.01,
        init="normal", loss="margin-based", neg_sampling="uniform",
        optimizer="Adam", eval_metric="inner", loss_norm="L2",
        ent_l2_norm=True, rel_l2_norm=True, neg_triple_num=1,
        margin=1.5, alpha_1=2.5, alpha_2=0.25, eval_norm=True,
        start_valid=1000, eval_freq=1000)
    hits1, mrr = test_hits1(model)
    assert hits1 > 20.0
    assert "mapping_mat_1" in model.params
    assert "mapping_mat_2" in model.params


def test_iptranse_2step_paths():
    from openea_tpu.models.iptranse import generate_2steps_path
    # h0 -r0-> e1 -r1-> e2 and a direct h0 -r2-> e2 closing triple
    triples = [(0, 0, 1), (1, 1, 2), (0, 2, 2)]
    paths = generate_2steps_path(triples)
    assert (0, 1, 2, 1.0) in paths


def test_iptranse_2step_paths_pandas_parity():
    """The numpy sorted-join reproduces the reference's pandas-merge
    semantics exactly (multiset of (rx, ry, r, weight))."""
    import pandas as pd
    from openea_tpu.models.iptranse import generate_2steps_path
    rng = np.random.RandomState(0)
    triples = list({(int(h), int(r), int(t)) for h, r, t in
                    zip(rng.randint(0, 60, 800), rng.randint(0, 8, 800),
                        rng.randint(0, 60, 800))})
    tr = np.asarray([[x[0], x[2], x[1]] for x in triples])
    tr = pd.DataFrame(tr, columns=["h", "t", "r"])
    sizes = tr.groupby(["h", "r"]).size()
    sizes.name = "size"
    tr = tr.join(sizes, on=["h", "r"])
    raw = tr[["h", "r", "t", "size"]]
    two = pd.merge(raw, raw, left_on="t", right_on="h")
    two["_w"] = two.size_x * two.size_y
    two = two[two["_w"] < 101]
    two = pd.merge(two, raw, left_on=["h_x", "t_y"], right_on=["h", "t"],
                   sort=False)
    ref = sorted((int(a), int(b), int(c), float(d)) for a, b, c, d
                 in two[["r_x", "r_y", "r", "_w"]].values)
    assert sorted(generate_2steps_path(triples)) == ref


def test_iptranse_e2e_learns():
    model, kgs = run_model(
        "IPTransE", "sharing", epochs=60, learning_rate=0.05,
        init="normal", neg_sampling="uniform", optimizer="Adagrad",
        eval_metric="inner", loss_norm="L2", ent_l2_norm=True,
        rel_l2_norm=True, margin=1.5, neg_triple_num=1, path_parm=0.1,
        bp_freq=20, sim_th=0.5, start_valid=1000, eval_freq=1000)
    hits1, mrr = test_hits1(model)
    assert hits1 > 30.0


def test_bootea_transh_e2e_learns():
    model, kgs = run_model(
        "BootEA_TransH", "swapping", epochs=40, learning_rate=0.05,
        init="normal", loss="limited", neg_sampling="truncated",
        optimizer="Adagrad", eval_metric="inner", loss_norm="L2",
        ent_l2_norm=True, rel_l2_norm=True, pos_margin=0.01,
        neg_margin=2.0, neg_margin_balance=0.2, neg_triple_num=4,
        truncated_epsilon=0.9, truncated_freq=10, sub_epoch=10,
        sim_th=0.5, k=5, start_valid=1000, eval_freq=1000)
    hits1, mrr = test_hits1(model)
    assert hits1 > 25.0


def test_bootea_rotate_e2e_learns():
    model, kgs = run_model(
        "BootEA_RotatE", "swapping", epochs=40, learning_rate=0.02,
        init="normal", neg_sampling="uniform", optimizer="Adam",
        eval_metric="inner", gamma=12.0, neg_triple_num=10,
        truncated_epsilon=0.9, truncated_freq=10, sub_epoch=10,
        sim_th=0.5, k=5, min_iter=0, start_bp=20, align_times=1,
        ent_l2_norm=False, rel_l2_norm=False, eval_norm=True,
        start_valid=1000, eval_freq=1000)
    hits1, mrr = test_hits1(model)
    assert np.isfinite(mrr)
    assert hits1 > 20.0
