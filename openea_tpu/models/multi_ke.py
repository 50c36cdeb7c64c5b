"""MultiKE: multi-view knowledge graph embedding for EA
(reference approaches/multi_ke.py + literal_encoder.py + predicate_alignmnet.py).

Views over a shared entity id space (swapping mode):
* name view    — constant entity-name literal vectors (autoencoder-encoded);
* relation view— TransE with logistic loss + cross-view positive losses
                 tying it to the shared space and the name view;
* attribute view— CNN over [attr; value] literal stacks scored against the
                 entity (conv(2x4)x2 -> dense -> -||h - out||^2);
* shared space — per-epoch cross-view alignment pulls (cv_weight, ITC lr)
                 and (optional) orthogonal per-view space mappings.

Cross-KG identity inference: seed-swapped sup triples (entities) and
predicate-alignment-swapped triples (relations/attributes, similarity-
weighted); predicate alignment refreshes from embeddings every 10 epochs
(predicate_align.py).  Final embeddings = shared table; weighted-view
averaging (WVA) is available at test time (reference :23-126).

Each objective runs as its own jitted scan with its own optimizer, mirroring
the reference's per-loss optimizers.
"""

from __future__ import annotations

import math
import time
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from openea_tpu.data import read as rd
from openea_tpu.data.name_vectors import get_local_name_triples, load_word_vectors
from openea_tpu.eval.evaluation import early_stop, valid as eval_valid
from openea_tpu.models.base import BasicModel
from openea_tpu.models.literal_encoder import LiteralEncoder, clear_attribute_triples
from openea_tpu.models.predicate_align import PredicateAlignModel
from openea_tpu.ops.initializers import l2_normalize, xavier_init
from openea_tpu.ops.optim import get_optimizer


def _gnorm(x):
    return x * jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x), 1e-12))


class MultiKE(BasicModel):

    def check_args(self):
        assert self.args.alignment_module == "swapping"

    # ------------------------------------------------------------------ #
    # literal preprocessing
    # ------------------------------------------------------------------ #

    def _prepare_literals(self):
        a = self.args
        if not a.get("use_attributes", True):
            # wo_attr ablation: no literal encoding, no name/value vectors
            # (reference approaches_without_attribute/multi_ke.py:322-326
            # comments out all literal/name/attribute vector generation)
            d = int(a.dim)
            self.entity_local_name = {}
            self.literal_list = []
            self.local_name_vectors = np.zeros(
                (self.kgs.max_entities_id, d), np.float32)
            self.value_vectors = np.zeros((1, d), np.float32)
            return
        name_triples = get_local_name_triples(self.kgs, str(a.training_data))
        self.entity_local_name = {e: n for e, _, n in name_triples}

        tr1, _, _ = clear_attribute_triples(
            self.kgs.kg1.local_attribute_triples_list)
        tr2, _, _ = clear_attribute_triples(
            self.kgs.kg2.local_attribute_triples_list)
        values = [v for _, _, v in tr1 + tr2]
        literal_list = list(set(values + list(self.entity_local_name.values())))
        self.literal_list = literal_list
        word2vec = load_word_vectors(a.get("word2vec_path"), int(a.word2vec_dim))
        encoder = LiteralEncoder(literal_list, word2vec, a, int(a.word2vec_dim))
        lit_vecs = encoder.encoded_literal_vector.astype(np.float32)
        lit_id = {l: i for i, l in enumerate(literal_list)}

        # name vectors per entity
        E = self.kgs.max_entities_id
        name_mat = np.zeros((E, lit_vecs.shape[1]), np.float32)
        for e in range(E):
            n = self.entity_local_name.get(e)
            if n is not None and n in lit_id:
                name_mat[e] = lit_vecs[lit_id[n]]
        if a.literal_normalize:
            norms = np.linalg.norm(name_mat, axis=1, keepdims=True)
            name_mat = name_mat / np.maximum(norms, 1e-12)
        self.local_name_vectors = name_mat

        # re-key attribute values to literal ids and rebuild sup triples
        values_used = sorted({v for _, _, v in tr1 + tr2 if v in lit_id})
        vid = {v: i for i, v in enumerate(values_used)}
        id_tr1 = {(h, at, vid[v]) for h, at, v in tr1 if v in vid}
        id_tr2 = {(h, at, vid[v]) for h, at, v in tr2 if v in vid}
        self.kgs.kg1.set_attributes(id_tr1)
        self.kgs.kg2.set_attributes(id_tr2)
        sup1, sup2 = rd.generate_sup_attribute_triples(
            self.kgs.train_links, self.kgs.kg1.av_dict, self.kgs.kg2.av_dict)
        self.kgs.kg1.add_sup_attribute_triples(sup1)
        self.kgs.kg2.add_sup_attribute_triples(sup2)
        value_mat = lit_vecs[[lit_id[v] for v in values_used]] if values_used \
            else np.zeros((1, lit_vecs.shape[1]), np.float32)
        if a.literal_normalize:
            norms = np.linalg.norm(value_mat, axis=1, keepdims=True)
            value_mat = value_mat / np.maximum(norms, 1e-12)
        self.value_vectors = value_mat

    # ------------------------------------------------------------------ #
    # init
    # ------------------------------------------------------------------ #

    def init(self):
        self.check_args()
        a = self.args
        self.key = jax.random.PRNGKey(a.seed)
        self._prepare_literals()
        self.predicate_align_model = PredicateAlignModel(self.kgs, a)

        E = self.kgs.max_entities_id
        R = self.kgs.max_relations_id
        A = max(1, self.kgs.max_attributes_id)
        d = int(a.dim)
        self.key, *ks = jax.random.split(self.key, 12)
        self.params = {
            "rv_ent_embeds": xavier_init(ks[0], (E, d)),
            "rel_embeds": xavier_init(ks[1], (R, d)),
            "av_ent_embeds": xavier_init(ks[2], (E, d)),
            "attr_embeds": xavier_init(ks[3], (A, d)),     # not normalized
            "ent_embeds": xavier_init(ks[4], (E, d)),
            "nv_mapping": jax.nn.initializers.orthogonal()(ks[5], (d, d)),
            "rv_mapping": jax.nn.initializers.orthogonal()(ks[6], (d, d)),
            "av_mapping": jax.nn.initializers.orthogonal()(ks[7], (d, d)),
            # attribute CNN (frozen-statistics BN over the dim axis)
            "bn_gamma": jnp.ones((d,)), "bn_beta": jnp.zeros((d,)),
            "conv1_k": xavier_init(ks[8], (2 * 4 * 1, 2)).reshape(2, 4, 1, 2),
            "conv1_b": jnp.zeros((2,)),
            "conv2_k": xavier_init(ks[9], (2 * 4 * 2, 2)).reshape(2, 4, 2, 2),
            "conv2_b": jnp.zeros((2,)),
            "dense_w": xavier_init(ks[10], (2 * d * 2, d)),
            "dense_b": jnp.zeros((d,)),
        }
        # host numpy: closure constants of the jitted view losses (numpy
        # embeds at lowering without a device round trip over the tunnel)
        self._name_embeds = np.asarray(self.local_name_vectors, np.float32)
        self._literal_embeds = np.asarray(self.value_vectors, np.float32)
        self._norm_keys = {"rv_ent_embeds", "rel_embeds", "av_ent_embeds",
                           "ent_embeds"}
        self._opts: Dict[str, Tuple] = {}
        for name, lr in (("rel", a.learning_rate), ("attr", a.learning_rate),
                         ("ckge_rel", a.learning_rate),
                         ("ckge_attr", a.learning_rate),
                         ("ckgp_rel", a.learning_rate),
                         ("ckga_attr", a.learning_rate),
                         ("cross_name", a.ITC_learning_rate),
                         ("shared_comb", a.learning_rate)):
            opt = get_optimizer(a.optimizer, lr)
            self._opts[name] = (opt, opt.init(self.params))
        self._fns = {}
        self._ents1 = np.asarray(self.kgs.kg1.entities, np.int32)
        self._ents2 = np.asarray(self.kgs.kg2.entities, np.int32)
        # per-entity KG membership for in-loss negative sampling (the
        # reference corrupts within the positive's own KG)
        memb = np.zeros(max(1, self.kgs.max_entities_id), np.int8)
        memb[np.asarray(self.kgs.kg2.entities)] = 1
        self._memb = memb
        self._osh = {}
        if a.get("use_mesh") and len(jax.devices()) > 1:
            self._setup_mesh_multike()

    # multi-chip: the four entity/relation/attribute tables row-shard
    # over 'model' (they are the only state that grows with KG size); the
    # view mappings / CNN weights replicate; each of the 8 per-view
    # optimizer states is sharded to mirror its parameters.  The view
    # epochs all flow through _run_epoch, which jits with these
    # shardings.  Reference runs single-GPU (approaches/multi_ke.py).
    def _setup_mesh_multike(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from openea_tpu.parallel.mesh import make_mesh, replicated
        from openea_tpu.parallel.train_step import _opt_state_shardings
        n = int(self.args.get("mesh_devices") or 0) or None
        self.mesh = make_mesh(n)
        tp = dict(self.mesh.shape).get("model", 1)
        sharded_tables = ("rv_ent_embeds", "av_ent_embeds", "ent_embeds",
                          "rel_embeds", "attr_embeds")
        self._pshard = {}
        for name, v in self.params.items():
            if name in sharded_tables:
                pad = (-v.shape[0]) % tp
                if pad:
                    self.params[name] = jnp.concatenate(
                        [v, jnp.zeros((pad,) + v.shape[1:], v.dtype)])
                self._pshard[name] = NamedSharding(self.mesh,
                                                   P("model", None))
            else:
                self._pshard[name] = NamedSharding(self.mesh, P())
        self._repl = replicated(self.mesh)
        self.params = jax.device_put(self.params, self._pshard)
        for key, (opt, _) in self._opts.items():
            st = opt.init(self.params)
            osh = _opt_state_shardings(self.mesh, st, self.params,
                                       self._pshard)
            self._opts[key] = (opt, jax.device_put(st, osh))
            self._osh[key] = osh
        print("mesh training enabled: {} devices, mesh {} (row-sharded "
              "view tables)".format(self.mesh.size, dict(self.mesh.shape)))

    def _t(self, params, name):
        # wo_attr ablation: the final view IS the relation view (the
        # reference aliases the ent_embeds variable to rv_ent_embeds,
        # approaches_without_attribute/multi_ke.py:481)
        if name == "ent_embeds" and not self.args.get("use_attributes", True):
            name = "rv_ent_embeds"
        tab = params[name]
        return l2_normalize(tab) if name in self._norm_keys else tab

    # ------------------------------------------------------------------ #
    # attribute CNN
    # ------------------------------------------------------------------ #

    def _conv_score(self, p, hs, as_, vs):
        d = int(self.args.dim)
        x = jnp.stack([as_, vs], axis=1)[..., None]          # [B,2,d,1]
        g = p["bn_gamma"].reshape(1, 1, d, 1)
        b = p["bn_beta"].reshape(1, 1, d, 1)
        x = g * x * (1.0 / math.sqrt(1.0 + 1e-3)) + b
        for k, bias in (("conv1", None), ("conv2", None)):
            x = jax.lax.conv_general_dilated(
                x, p[k + "_k"], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jnp.tanh(x + p[k + "_b"].reshape(1, 1, 1, -1))
        x = x * jax.lax.rsqrt(jnp.maximum(
            jnp.sum(x * x, axis=2, keepdims=True), 1e-12))
        flat = x.reshape(x.shape[0], -1)
        dense = jnp.tanh(flat @ p["dense_w"] + p["dense_b"])
        dense = _gnorm(dense)
        return -jnp.sum(jnp.square(hs - dense), axis=1)

    # ------------------------------------------------------------------ #
    # epoch machinery: generic padded-scan runner
    # ------------------------------------------------------------------ #

    def _run_epoch(self, fn_name: str, loss_fn, rows: np.ndarray, bsz: int,
                   needs_key: bool = False, label: str = "",
                   version: int = 0):
        """rows [N, k] -> shuffled padded scan of `loss_fn(params, batch,
        weights, key)`; weights mask the padding.

        ``version``: content version of ``rows`` for the device cache —
        callers bump it when a host-side refresh (predicate alignment)
        rewrites the rows without changing their shape; static rows
        upload once per run instead of ~1 s/call over the tunnel."""
        n = len(rows)
        if n == 0:
            return
        start = time.time()
        bsz = min(bsz, n)
        steps = max(1, math.ceil(n / bsz))
        steps = 1 << (steps - 1).bit_length()
        cache_key = (fn_name, steps, bsz, rows.shape[1])
        opt, opt_state = self._opts[fn_name]
        if cache_key not in self._fns:
            def epoch(params, opt_state, key, data, w):
                kperm, kscan = jax.random.split(key)
                perm = jax.random.permutation(kperm, data.shape[0])
                rows_n = steps * bsz
                idx = jnp.concatenate([perm, perm])[:rows_n].reshape(steps, bsz)
                keys = jax.random.split(kscan, steps)

                def step(carry, xs):
                    params, opt_state = carry
                    bidx, k = xs
                    batch = data[bidx]
                    wb = w[bidx]

                    def lf(p):
                        return loss_fn(p, batch, wb, k)

                    loss, grads = jax.value_and_grad(lf)(params)
                    updates, opt_state = opt.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return (params, opt_state), loss

                (params, opt_state), losses = jax.lax.scan(
                    step, (params, opt_state), (idx, keys))
                return params, opt_state, jnp.sum(losses)

            self._fns[cache_key] = self._jit_custom(
                epoch, 3, self._osh.get(fn_name))
        self.key, k = jax.random.split(self.key)
        rows_dev = self._dev_cached("rows:" + fn_name, version, rows)
        # the weights are always ones (padding is masked by idx tiling) —
        # generate on device, never upload
        w_dev = jnp.ones(n, jnp.float32)
        self.params, opt_state, loss = self._fns[cache_key](
            self.params, opt_state, k, rows_dev, w_dev)
        self._opts[fn_name] = (opt, opt_state)
        print("epoch {}, avg. loss: {:.4f}, time: {:.4f}s"
              .format(label, float(loss) / n, time.time() - start))

    # ------------------------------------------------------------------ #
    # view losses
    # ------------------------------------------------------------------ #

    def _rel_view_loss(self, p, batch, wb, key):
        """batch [B, 3] positive rel triples; negatives sampled in-loss."""
        rv = self._t(p, "rv_ent_embeds")
        rel = self._t(p, "rel_embeds")
        fin = self._t(p, "ent_embeds")
        phs, prs, pts = rv[batch[:, 0]], rel[batch[:, 1]], rv[batch[:, 2]]
        k1, k2, k3 = jax.random.split(key, 3)
        num_neg = max(1, int(self.args.neg_triple_num))
        coin = jax.random.bernoulli(k1, 0.5, (batch.shape[0], 1))
        coin = jnp.broadcast_to(coin, (batch.shape[0], num_neg))
        # corrupt within the positive's own KG (membership-selected);
        # jnp.asarray: numpy closure constants embed from host at trace time
        ents1_c, ents2_c = jnp.asarray(self._ents1), jnp.asarray(self._ents2)
        memb_c = jnp.asarray(self._memb)
        c1 = ents1_c[jax.random.randint(
            k2, (batch.shape[0], num_neg), 0, ents1_c.shape[0])]
        c2 = ents2_c[jax.random.randint(
            k3, (batch.shape[0], num_neg), 0, ents2_c.shape[0])]
        cand = jnp.where(memb_c[batch[:, 0:1]] == 0, c1, c2)

        def e(h, r, t):
            return jnp.sum(jnp.square(h + r - t), axis=1)

        # structured negatives (the r2 base-model trick): only the
        # CORRUPTED entity is gathered — ||c + r - t||^2 = ||c - (t-r)||^2
        # and ||h + r - c||^2 = ||(h+r) - c||^2, so the uncorrupted side
        # rides the positive gathers instead of being re-gathered (and
        # scatter-added in the backward) num_neg times per row
        cand_rows = rv[cand.reshape(-1)].reshape(-1, num_neg, rv.shape[1])
        y = jnp.where(coin[..., None], (pts - prs)[:, None, :],
                      (phs + prs)[:, None, :])
        e_neg = jnp.sum(jnp.square(cand_rows - y), axis=-1)  # [B, num_neg]
        loss = (jnp.sum(jax.nn.softplus(e(phs, prs, pts)) * wb)
                + jnp.sum(jax.nn.softplus(-e_neg) * wb[:, None]))
        f_phs, f_pts = fin[batch[:, 0]], fin[batch[:, 2]]
        loss = loss + jnp.sum(e(f_phs, prs, pts) * wb)
        loss = loss + jnp.sum(e(phs, prs, f_pts) * wb)
        if self.args.get("use_attributes", True):
            # name-view alignment terms (dropped in the wo_attr ablation,
            # reference approaches_without_attribute/multi_ke.py:513-518)
            name_c = jnp.asarray(self._name_embeds)  # host const, trace-safe
            n_phs = name_c[batch[:, 0]]
            n_pts = name_c[batch[:, 2]]
            loss = loss + 0.5 * jnp.sum(jnp.square(f_phs - n_phs) * wb[:, None])
            loss = loss + 0.5 * jnp.sum(jnp.square(f_pts - n_pts) * wb[:, None])
        return loss

    def _attr_view_loss(self, p, batch, wb, key):
        """batch [B, 4]: (h, a, v, w*1000 as int) — weights carried in col 3
        scaled by 1e-3 to stay integral."""
        av = self._t(p, "av_ent_embeds")
        fin = self._t(p, "ent_embeds")
        attr = p["attr_embeds"]
        hs = av[batch[:, 0]]
        as_ = attr[batch[:, 1]]
        vs = jnp.asarray(self._literal_embeds)[batch[:, 2]]
        w = batch[:, 3].astype(jnp.float32) * 1e-3 * wb
        score = self._conv_score(p, hs, as_, vs)
        loss = jnp.sum(jax.nn.softplus(-score) * w)
        f_hs = fin[batch[:, 0]]
        score2 = self._conv_score(p, f_hs, as_, vs)
        loss = loss + jnp.sum(jax.nn.softplus(-score2) * wb)
        n_hs = jnp.asarray(self._name_embeds)[batch[:, 0]]
        loss = loss + 0.5 * jnp.sum(jnp.square(f_hs - n_hs) * wb[:, None])
        return loss

    def _ckge_rel_loss(self, p, batch, wb, key):
        rv = self._t(p, "rv_ent_embeds")
        rel = self._t(p, "rel_embeds")
        e = jnp.sum(jnp.square(rv[batch[:, 0]] + rel[batch[:, 1]]
                               - rv[batch[:, 2]]), axis=1)
        return 2.0 * jnp.sum(e * wb)

    def _ckge_attr_loss(self, p, batch, wb, key):
        av = self._t(p, "av_ent_embeds")
        score = self._conv_score(p, av[batch[:, 0]],
                                 p["attr_embeds"][batch[:, 1]],
                                 jnp.asarray(self._literal_embeds)[batch[:, 2]])
        return 2.0 * jnp.sum(jax.nn.softplus(-score) * wb)

    def _ckgp_rel_loss(self, p, batch, wb, key):
        rv = self._t(p, "rv_ent_embeds")
        rel = self._t(p, "rel_embeds")
        e = jnp.sum(jnp.square(rv[batch[:, 0]] + rel[batch[:, 1]]
                               - rv[batch[:, 2]]), axis=1)
        w = batch[:, 3].astype(jnp.float32) * 1e-3 * wb
        return 2.0 * jnp.sum(jax.nn.softplus(e) * w)

    def _ckga_attr_loss(self, p, batch, wb, key):
        av = self._t(p, "av_ent_embeds")
        score = self._conv_score(p, av[batch[:, 0]],
                                 p["attr_embeds"][batch[:, 1]],
                                 jnp.asarray(self._literal_embeds)[batch[:, 2]])
        w = batch[:, 3].astype(jnp.float32) * 1e-3 * wb
        return jnp.sum(jax.nn.softplus(-score) * w)

    def _cross_name_loss(self, p, batch, wb, key):
        ids = batch[:, 0]
        fin = self._t(p, "ent_embeds")[ids]
        nv = jnp.asarray(self._name_embeds)[ids]
        rv = self._t(p, "rv_ent_embeds")[ids]
        av = self._t(p, "av_ent_embeds")[ids]
        loss = (jnp.sum(jnp.square(fin - nv) * wb[:, None])
                + jnp.sum(jnp.square(fin - rv) * wb[:, None])
                + jnp.sum(jnp.square(fin - av) * wb[:, None]))
        return float(self.args.cv_weight) * loss

    def _shared_comb_loss(self, p, batch, wb, key):
        ids = batch[:, 0]
        fin = self._t(p, "ent_embeds")[ids]
        ow = float(self.args.orthogonal_weight)
        eye = jnp.eye(int(self.args.dim))

        def space_map(view, mapping):
            mapped = _gnorm(view @ mapping)
            map_l = jnp.sum(jnp.square(fin - mapped))
            norm_l = jnp.sum(jnp.square(mapping))
            orth_l = jnp.sum(jnp.square(mapping @ mapping.T - eye))
            return map_l + ow * orth_l + 1e-4 * norm_l

        return (space_map(jnp.asarray(self._name_embeds)[ids], p["nv_mapping"])
                + space_map(self._t(p, "rv_ent_embeds")[ids], p["rv_mapping"])
                + space_map(self._t(p, "av_ent_embeds")[ids], p["av_mapping"]))

    # ------------------------------------------------------------------ #
    # run
    # ------------------------------------------------------------------ #

    @staticmethod
    def _w1000(triples_w):
        """(s, p, o, w) float-weighted triples -> int rows with w*1000."""
        if not triples_w:
            return np.zeros((0, 4), np.int32)
        return np.asarray([(s, p, o, int(round(w * 1000)))
                           for s, p, o, w in triples_w], np.int32)

    def run(self):
        t = time.time()
        a = self.args
        self._pa_ver = 0            # bumps on predicate-alignment refresh
        pa = self.predicate_align_model
        rel_rows = np.asarray(self.kgs.kg1.local_relation_triples_list
                              + self.kgs.kg2.local_relation_triples_list,
                              np.int32)
        ent_rows = np.asarray(
            sorted(self.kgs.kg1.entities_set | self.kgs.kg2.entities_set),
            np.int32)[:, None]
        sup_rel = np.asarray(
            [list(x) for x in (self.kgs.kg1.sup_relation_triples_set
                               | self.kgs.kg2.sup_relation_triples_set)],
            np.int32).reshape(-1, 3)
        # wo_attr ablation: relation view only — no name/attribute views,
        # no cross-name or common-space epochs, no attribute predicate
        # alignment (reference approaches_without_attribute/multi_ke.py:
        # 856-891 comments those phases out of the train loop).  Attribute
        # values are only re-keyed to literal ids when attributes are on,
        # so sup_attr is built under the flag too.
        use_attrs = a.get("use_attributes", True)
        if use_attrs:
            sup_attr = np.asarray(
                [list(x) for x in (self.kgs.kg1.sup_attribute_triples_set
                                   | self.kgs.kg2.sup_attribute_triples_set)],
                np.int32).reshape(-1, 3)
        if use_attrs:
            self._valid_view("nv")
        for i in range(1, a.max_epoch + 1):
            print("epoch {}:".format(i))
            ckgp_rows = self._w1000(pa.sup_relation_alignment_triples1
                                    + pa.sup_relation_alignment_triples2)
            self._run_epoch("rel", self._rel_view_loss, rel_rows,
                            int(a.batch_size), label=f"{i} rel view")
            if use_attrs:
                self._run_epoch("cross_name", self._cross_name_loss, ent_rows,
                                int(a.entity_batch_size),
                                label=f"{i} cross-name")
            self._run_epoch("ckge_rel", self._ckge_rel_loss, sup_rel,
                            int(a.batch_size), label=f"{i} ckge rel")
            if i > a.start_predicate_soft_alignment:
                self._run_epoch("ckgp_rel", self._ckgp_rel_loss, ckgp_rows,
                                int(a.batch_size), label=f"{i} ckgp rel",
                                version=self._pa_ver)
            if use_attrs:
                attr_rows = self._w1000(pa.attribute_triples_w_weights1
                                        + pa.attribute_triples_w_weights2)
                ckga_rows = self._w1000(pa.sup_attribute_alignment_triples1
                                        + pa.sup_attribute_alignment_triples2)
                self._run_epoch("attr", self._attr_view_loss, attr_rows,
                                int(a.attribute_batch_size),
                                label=f"{i} attr view",
                                version=self._pa_ver)
                self._run_epoch("cross_name", self._cross_name_loss, ent_rows,
                                int(a.entity_batch_size),
                                label=f"{i} cross-name")
                self._run_epoch("ckge_attr", self._ckge_attr_loss, sup_attr,
                                int(a.attribute_batch_size),
                                label=f"{i} ckge attr")
                if i > a.start_predicate_soft_alignment:
                    self._run_epoch("ckga_attr", self._ckga_attr_loss,
                                    ckga_rows, int(a.attribute_batch_size),
                                    label=f"{i} ckga attr",
                                    version=self._pa_ver)

            if i >= a.start_valid and i % a.eval_freq == 0:
                self._valid_view("rv")
                if use_attrs:
                    self._valid_view("av")
                flag = self.valid(a.stop_metric)
                self.flag1, self.flag2, self.early_stop = early_stop(
                    self.flag1, self.flag2, flag)
                if self.early_stop or i == a.max_epoch:
                    break
            if i >= a.start_predicate_soft_alignment and i % 10 == 0:
                self._pa_ver += 1
                pa.update_predicate_alignment(
                    np.asarray(self._t(self.params, "rel_embeds")))
                if use_attrs:
                    pa.update_predicate_alignment(
                        np.asarray(self.params["attr_embeds"]),
                        predicate_type="attribute")
        print("Training ends. Total time = {:.3f} s.".format(time.time() - t))

    # ------------------------------------------------------------------ #
    # eval: shared space by default, WVA optional
    # ------------------------------------------------------------------ #

    def _view_table(self, choice: str):
        if choice == "nv":
            return self._name_embeds
        if choice == "rv":
            return self._t(self.params, "rv_ent_embeds")
        if choice == "av":
            return self._t(self.params, "av_ent_embeds")
        return self._t(self.params, "ent_embeds")

    def _valid_view(self, choice: str):
        tab = self._view_table(choice)
        e1 = tab[jnp.asarray(self.kgs.valid_entities1, jnp.int32)]
        e2 = tab[jnp.asarray(self.kgs.valid_entities2
                             + self.kgs.test_entities2, jnp.int32)]
        print(choice, "valid results:")
        return eval_valid(e1, e2, None, self.args.top_k,
                          metric=self.args.eval_metric, normalize=True,
                          csls_k=0, accurate=False)

    def _ent_embeds_for_eval(self):
        return self._t(self.params, "ent_embeds")

    def _rel_embeds_for_eval(self):
        return self._t(self.params, "rel_embeds")

    def _wva_embeds(self, ents1: List[int], ents2: List[int]):
        def weights(e1, e2, e3):
            def one(a, b, c):
                other = l2_normalize((a + b + c) / 3.0)
                return float(jnp.mean(jnp.sum(l2_normalize(a) * other, axis=1)))
            return one(e1, e2, e3), one(e2, e1, e3), one(e3, e1, e2)

        out = []
        ws = []
        for ents in (ents1, ents2):
            ids = jnp.asarray(ents, jnp.int32)
            nv = self._name_embeds[ids]
            rv = self._t(self.params, "rv_ent_embeds")[ids]
            av = self._t(self.params, "av_ent_embeds")[ids]
            ws.append(weights(nv, rv, av))
            out.append((nv, rv, av))
        w1, w2, w3 = (ws[0][i] + ws[1][i] for i in range(3))
        tot = w1 + w2 + w3
        w1, w2, w3 = w1 / tot, w2 / tot, w3 / tot
        print("weights", w1, w2, w3)
        e1 = w1 * out[0][0] + w2 * out[0][1] + w3 * out[0][2]
        e2 = w1 * out[1][0] + w2 * out[1][1] + w3 * out[1][2]
        return e1, e2

    def test(self, save: bool = True):
        if self.args.get("test_method") == "wva":
            e1, e2 = self._wva_embeds(self.kgs.test_entities1,
                                      self.kgs.test_entities2)
            print("wvag test results:")
            eval_valid(e1, e2, None, self.args.top_k,
                       metric=self.args.eval_metric, normalize=True,
                       csls_k=0, accurate=True)
            return
        super().test(save=save)
