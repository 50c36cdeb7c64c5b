"""GMNN graph matching network."""

import numpy as np
import pytest

from openea_tpu.data.synthetic import synthesize_kg_pair
from tests.test_models_e2e import run_model


def gmnn_kgs():
    return synthesize_kg_pair(num_entities=80, num_relations=5,
                              num_triples=500, mode="mapping",
                              edge_keep_prob=1.0, noise_edge_frac=0.0,
                              train_frac=0.4, seed=17)


def test_gmnn_candidates_contain_gold():
    from openea_tpu.registry import get_model
    from openea_tpu.config import Args
    kgs = gmnn_kgs()
    model = get_model("GMNN")()
    model.set_args(Args(cand_size=10, word_embedding_dim=16,
                        hidden_layer_dim=16, aggregator_dim_first=16,
                        cosine_MP_dim=4, word_size_max=1, dev_batch_size=20,
                        sample_size_per_layer=1, seed=0))
    model.set_kgs(kgs)
    model.init()
    cands = model.generate_candidates(kgs.test_links)
    # names are identical across aligned entities -> gold in candidates
    hit = np.mean([b in set(row.tolist())
                   for (a, b), row in zip(kgs.test_links, cands)])
    assert hit > 0.9


def test_gmnn_e2e_learns():
    model, kgs = run_model(
        "GMNN", "mapping", epochs=20, kgs=gmnn_kgs(),
        cand_size=10, word_embedding_dim=16, hidden_layer_dim=16,
        aggregator_dim_first=16, cosine_MP_dim=4, word_size_max=1,
        sample_size_per_layer=1, dev_batch_size=20, batch_size=40,
        subgraph_size=8, start_valid=1000, eval_freq=1000, stop_metric="hits1")
    hits1, mrr = model._rank_eval(model._test_ex, "accurate")
    # identical names make gold candidates highly rankable
    assert np.isfinite(mrr)
    assert hits1 > 30.0
