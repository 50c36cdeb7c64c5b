"""DBP2.0 dangling-entity pipeline: MyKGs + MTransEV2 margin detection."""

import numpy as np
import pytest

from openea_tpu.config import Args
from openea_tpu.data.kg import KG
from openea_tpu.data.synthetic import _synthesize_raw
from openea_tpu.dbp2.kgs import MyKGs
from openea_tpu.dbp2.mtranse_v2 import MTransEV2, eval_margin


def make_dbp2_kgs(seed=31):
    rel1, rel2, links = _synthesize_raw(
        num_entities=150, num_relations=6, num_triples=900,
        aligned_frac=0.6, edge_keep_prob=1.0, noise_edge_frac=0.1, seed=seed)
    rng = np.random.RandomState(seed)
    links = [links[i] for i in rng.permutation(len(links))]
    n = len(links)
    train, valid, test = links[:n // 3], links[n // 3:n // 2], links[n // 2:]

    ents1 = {u for h, _, t in rel1 for u in (h, t)}
    ents2 = {u for h, _, t in rel2 for u in (h, t)}
    linked1 = {a for a, _ in links}
    linked2 = {b for _, b in links}
    unl1 = sorted(ents1 - linked1)
    unl2 = sorted(ents2 - linked2)
    k1, k2 = len(unl1) // 3, len(unl2) // 3
    kgs = MyKGs(KG(list(rel1), []), KG(list(rel2), []), train, test,
                unl1[:k1], unl1[k1:2 * k1], unl1[2 * k1:],
                unl2[:k2], unl2[k2:2 * k2], unl2[2 * k2:],
                valid_links=valid, mode="mapping", ordered=True)
    return kgs


def test_mykgs_labels():
    kgs = make_dbp2_kgs()
    assert len(kgs.train_unlinked_entities1) > 0
    assert all(y == 1.0 for _, y in kgs.test_unlinked_entities1)
    assert all(y == 0.0 for _, y in kgs.test_linked_entities1)


def test_eval_margin_classifier():
    ents = [0, 1, 2, 3]
    dis = [0.9, 0.1, 0.8, 0.2]
    labels = [1.0, 0.0, 1.0, 0.0]
    matched, label1 = eval_margin(ents, dis, labels, margin=0.5)
    assert matched == [1, 3]
    assert label1 == 2


def test_mtransev2_e2e():
    kgs = make_dbp2_kgs()
    args = Args(
        embedding_module="MTransEV2", alignment_module="mapping",
        detection_mode="margin", dim=32, init="xavier",
        loss_norm="L2", ent_l2_norm=True, rel_l2_norm=True,
        embed_margin=1.5, mapping_margin=1.0, mapping_neg_num=4,
        soft_nn=10, distance_margin=0.9, learning_rate=0.01,
        optimizer="Adam", batch_size=400, max_epoch=30,
        neg_sampling="uniform", neg_triple_num=1,
        truncated_epsilon=0.95, truncated_freq=10,
        eval_metric="inner", eval_norm=True, top_k=[1, 5, 10],
        start_valid=1000, eval_freq=1000, stop_metric="mrr", seed=3)
    model = MTransEV2()
    model.set_args(args)
    model.set_kgs(kgs)
    model.init()
    model.run()
    model.test(save=False)
    # relaxed valid returns a finite metric
    mrr = model.valid("mrr")
    assert np.isfinite(mrr)
    assert mrr > 0.02


@pytest.mark.slow
def test_mtransev2_mesh_training_matches_single_device():
    """MTransEV2 trains on the 8-device mesh: triple epochs through the
    base sharded path, marginal-mapping and distance-margin epochs
    through mesh-aware jits with their own sharded optimizer states
    (reference dbp2.0/mtranse.py:25-38 pins a single GPU)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    kw = dict(embedding_module="MTransEV2", alignment_module="mapping",
              detection_mode="margin", dim=32, init="xavier",
              loss_norm="L2", ent_l2_norm=True, rel_l2_norm=True,
              embed_margin=1.5, mapping_margin=1.0, mapping_neg_num=4,
              soft_nn=10, distance_margin=0.9, learning_rate=0.01,
              optimizer="Adam", batch_size=400, max_epoch=8,
              neg_sampling="uniform", neg_triple_num=1,
              truncated_epsilon=0.95, truncated_freq=10,
              eval_metric="inner", eval_norm=True, top_k=[1, 5, 10],
              start_valid=1000, eval_freq=1000, stop_metric="mrr", seed=3)

    def train(use_mesh):
        kgs = make_dbp2_kgs()
        m = MTransEV2()
        m.set_args(Args(dict(kw, use_mesh=use_mesh)))
        m.set_kgs(kgs)
        m.init()
        m.run()
        return m

    m1 = train(False)
    m2 = train(True)
    assert m2.mesh is not None and m2.mesh.size == 8
    assert m2.params["ent_embeds"].sharding.spec[0] == "model"
    e1 = np.asarray(m1.params["ent_embeds"])
    e2 = np.asarray(m2.params["ent_embeds"])[:e1.shape[0]]
    assert np.isfinite(e2).all()
    assert float(np.abs(e2 - e1).mean()) < 2e-3
    mrr1, mrr2 = m1.valid("mrr"), m2.valid("mrr")
    assert np.isfinite(mrr2)
    assert abs(mrr1 - mrr2) < 0.03
    # the dangling two-step eval also runs on sharded params
    f1 = m2.two_step_evaluation_margin(
        m2.kgs.valid_linked_entities1, m2.kgs.valid_unlinked_entities1)
    assert np.isfinite(f1)
