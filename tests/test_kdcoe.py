"""KDCoE: description pipeline + encoder + co-training loop."""

import numpy as np
import pytest

from openea_tpu.data.synthetic import synthesize_kg_pair
from tests.test_models_e2e import run_model, test_hits1


def kdcoe_kgs():
    return synthesize_kg_pair(num_entities=120, num_relations=6,
                              num_triples=800, mode="mapping",
                              edge_keep_prob=1.0, noise_edge_frac=0.0,
                              train_frac=0.3, num_attributes=10,
                              attrs_per_entity=3, seed=13)


def test_descriptions_input_shapes():
    from openea_tpu.models.kdcoe import descriptions_input
    kgs = kdcoe_kgs()
    word_em, e_desc = descriptions_input(kgs, None, 16, 4)
    assert e_desc.shape == (kgs.max_entities_id, 4)
    assert word_em.shape[1] == 16
    assert e_desc.max() < word_em.shape[0]


def test_gru_apply_shapes_and_gating():
    import jax
    import jax.numpy as jnp
    from openea_tpu.models.kdcoe import _gru_apply, _gru_params
    p = _gru_params(jax.random.PRNGKey(0), 8, 8)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 5, 8).astype(np.float32))
    out = _gru_apply(p, x)
    assert out.shape == (3, 5, 8)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_kdcoe_e2e_runs_and_proposes():
    model, kgs = run_model(
        "KDCoE", "mapping", epochs=10, kgs=kdcoe_kgs(),
        dim=32, init="unit", learning_rate=0.02, optimizer="Adagrad",
        eval_metric="inner", loss_norm="L2", margin=1.5, alpha=5,
        new_param=0.1, max_iter=2, sim_th=0.5, desc_sim_th=0.6,
        desc_batch_size=32, default_desc_length=4, wv_dim=16,
        ent_l2_norm=True, rel_l2_norm=True, neg_triple_num=1,
        neg_sampling="uniform", eval_norm=True,
        start_valid=1000, eval_freq=5)
    hits1, mrr = test_hits1(model)
    assert np.isfinite(mrr)
    model.test_desc()


def test_kdcoe_wo_desc_runs():
    model, kgs = run_model(
        "KDCoE_wo_desc", "mapping", epochs=10, kgs=kdcoe_kgs(),
        dim=32, init="unit", learning_rate=0.02, optimizer="Adagrad",
        eval_metric="inner", loss_norm="L2", margin=1.5, alpha=5,
        new_param=0.1, max_iter=2, sim_th=0.5,
        ent_l2_norm=True, rel_l2_norm=True, neg_triple_num=1,
        neg_sampling="uniform", eval_norm=True,
        start_valid=1000, eval_freq=5)
    hits1, mrr = test_hits1(model)
    assert np.isfinite(mrr)
