"""Attr2Vec: skip-gram over attribute co-occurrence (reference
approaches/attr2vec.py).

Attributes that co-occur on an entity (with seed-aligned counterpart
attributes merged in) form skip-gram pairs; an NCE loss over the
attribute vocabulary learns attribute embeddings; entity embeddings are
the mean of their selected attributes' embeddings, row-normalized
(reference :58-76).

TPU design: the epoch is a jitted scan over a device permutation of the
pair list with the shared log-uniform NCE sampler (ops/nce.py); the
entity-from-attribute aggregation is one segment-mean on device instead
of the reference's per-entity python loop.
"""

from __future__ import annotations

import itertools
import time
from typing import Set

import jax
import jax.numpy as jnp
import numpy as np
import optax

from openea_tpu.ops.initializers import l2_normalize, xavier_init
from openea_tpu.ops.nce import nce_loss
from openea_tpu.ops.optim import get_optimizer
from openea_tpu.utils import generate_out_folder, merge_dic


def get_kg_popular_attributes(kg, threshold: float) -> Set[int]:
    count = {}
    for _, attr, _ in kg.attribute_triples_list:
        count[attr] = count.get(attr, 0) + 1
    used = int(len(count) * threshold)
    ordered = sorted(count, key=count.get, reverse=True)
    return set(ordered[:used])


def get_kgs_popular_attributes(kgs, threshold: float):
    s1 = get_kg_popular_attributes(kgs.kg1, threshold)
    s2 = get_kg_popular_attributes(kgs.kg2, threshold)
    return s1, s2, s1 | s2


def generate_training_data(kgs, threshold: float = 1.0):
    """Attribute co-occurrence pairs; seed-aligned entities pool their
    attributes (reference attr2vec.py:39-56)."""
    _, _, selected = get_kgs_popular_attributes(kgs, threshold)
    ead = merge_dic(kgs.kg1.entity_attributes_dict,
                    kgs.kg2.entity_attributes_dict)
    links = dict(zip(kgs.train_entities1, kgs.train_entities2))
    links.update(dict(zip(kgs.train_entities2, kgs.train_entities1)))
    pairs = []
    for ent, attrs in ead.items():
        if ent in links:
            attrs = attrs | ead.get(links[ent], set())
        attrs = attrs & selected
        for a, b in itertools.combinations(attrs, 2):
            if a != b:
                pairs.append((a, b))
    print("training data of attribute correlations", len(pairs))
    return pairs


class Attr2Vec:
    """Same 7-call protocol shape as the models (set_args/set_kgs/init/run)."""

    def __init__(self):
        self.kgs = None
        self.args = None
        self.out_folder = None
        self.params = None
        self.selected_attributes: Set[int] = set()
        self.num_sampled_negs = -1

    def set_args(self, args):
        self.args = args
        self.out_folder = generate_out_folder(
            args.output, args.training_data, args.dataset_division,
            self.__class__.__name__)

    def set_kgs(self, kgs):
        self.kgs = kgs
        _, _, self.selected_attributes = get_kgs_popular_attributes(
            kgs, self.args.top_attr_threshold)
        self.num_sampled_negs = max(1, len(self.selected_attributes) // 5)

    def init(self):
        key = jax.random.PRNGKey(self.args.seed)
        k1, k2 = jax.random.split(key)
        n_attr = max(1, self.kgs.max_attributes_id)
        self.n_attr = n_attr
        self.params = {
            "embeds": l2_normalize(xavier_init(k1, (n_attr, self.args.dim))),
            "nce_weights": l2_normalize(xavier_init(k2, (n_attr, self.args.dim))),
            "nce_biases": jnp.zeros((n_attr,), jnp.float32),
        }
        self.opt = get_optimizer("Adagrad", self.args.learning_rate)
        self.opt_state = self.opt.init(self.params)
        self.key = key
        # multi-chip: data-parallel skip-gram — the attribute tables are
        # small, so params replicate and each scanned NCE batch shards
        # over 'data' (grad psum over ICI); reference runs this
        # single-GPU (approaches/attr2vec.py:106-124)
        self.mesh = None
        if self.args.get("use_mesh") and len(jax.devices()) > 1:
            from jax.sharding import Mesh
            devs = jax.devices()
            n = int(self.args.get("mesh_devices") or 0) or len(devs)
            self.mesh = Mesh(np.asarray(devs[:n]), ("data",))
            print("mesh training enabled: {} devices, mesh {} "
                  "(data-parallel skip-gram)".format(
                      self.mesh.size, dict(self.mesh.shape)))

    def _make_epoch_fn(self, steps: int, bsz: int):
        opt = self.opt
        n_attr = self.n_attr
        num_neg = self.num_sampled_negs
        mesh = self.mesh

        def epoch(params, opt_state, key, pairs):
            kperm, kscan = jax.random.split(key)
            n = pairs.shape[0]
            perm = jax.random.permutation(kperm, n)
            idx = jnp.concatenate([perm, perm])[:steps * bsz].reshape(steps, bsz)
            keys = jax.random.split(kscan, steps)

            def step(carry, xs):
                params, opt_state = carry
                bidx, sk = xs
                batch = pairs[bidx]
                if mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P
                    batch = jax.lax.with_sharding_constraint(
                        batch, NamedSharding(mesh, P("data", None)))

                def loss_fn(p):
                    inputs = l2_normalize(p["embeds"])[batch[:, 0]]
                    return nce_loss(sk, inputs, batch[:, 1],
                                    l2_normalize(p["nce_weights"]),
                                    p["nce_biases"], num_neg, n_attr) / bsz

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), (idx, keys))
            return params, opt_state, jnp.sum(losses)

        return jax.jit(epoch, donate_argnums=(0, 1))

    def run(self):
        pairs = generate_training_data(self.kgs, threshold=0.9)
        if not pairs:
            print("Attr2Vec: no attribute co-occurrence pairs; skipping")
            return
        bsz = min(self.args.batch_size, len(pairs))
        steps = max(1, len(pairs) // bsz)
        fn = self._make_epoch_fn(steps, bsz)
        dev_pairs = jnp.asarray(np.asarray(pairs, np.int32))
        for i in range(1, self.args.attr_max_epoch + 1):
            start = time.time()
            self.key, k = jax.random.split(self.key)
            self.params, self.opt_state, loss = fn(
                self.params, self.opt_state, k, dev_pairs)
            if i % 50 == 0 or i == 1:
                print("epoch {}, attribute loss: {:.4f}, cost time: {:.4f}s"
                      .format(i, float(loss), time.time() - start))

    # ------------------------------------------------------------------ #
    # entity embeddings from attributes
    # ------------------------------------------------------------------ #

    def ent_embeds_from_attributes(self) -> np.ndarray:
        """[n_ents, dim] mean of selected-attribute embeddings per entity,
        row-normalized; one device segment-mean."""
        ead = merge_dic(self.kgs.kg1.entity_attributes_dict,
                        self.kgs.kg2.entity_attributes_dict)
        n = self.kgs.max_entities_id
        rows, cols = [], []
        for e, attrs in ead.items():
            for a in attrs & self.selected_attributes:
                rows.append(e)
                cols.append(a)
        if not rows:
            return np.zeros((n, self.args.dim), np.float32)
        rows = jnp.asarray(np.asarray(rows, np.int32))
        cols = jnp.asarray(np.asarray(cols, np.int32))

        @jax.jit
        def agg(raw_embeds, rows, cols):
            embeds = l2_normalize(raw_embeds)
            total = jax.ops.segment_sum(embeds[cols], rows, num_segments=n)
            cnt = jax.ops.segment_sum(jnp.ones_like(rows, jnp.float32), rows,
                                      num_segments=n)
            mean = total / jnp.maximum(cnt, 1.0)[:, None]
            # normalize rows; all-zero rows stay zero (like sklearn normalize)
            return l2_normalize(mean)

        return np.asarray(agg(self.params["embeds"], rows, cols))

    def eval_sim_mat(self) -> np.ndarray:
        mat = self.ent_embeds_from_attributes()
        e1 = mat[self.kgs.valid_entities1 + self.kgs.test_entities1]
        e2 = mat[self.kgs.valid_entities2 + self.kgs.test_entities2]
        return e1 @ e2.T
