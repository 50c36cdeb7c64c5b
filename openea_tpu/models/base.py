"""BasicModel — the training template every approach extends.

Re-design of the reference's models/basic_model.py:26-413 for TPU:

* one jit-compiled `lax.scan` per epoch (vs per-step session.run with
  feed_dict over a multiprocessing batch queue, reference :211-236);
* negative sampling with `jax.random` on device (vs host producer
  processes, reference train/batch.py:25-120);
* truncated-neighbor caches as blocked device top-k that stay in HBM
  (vs host numpy matmul + argpartition, reference batch.py:122-165);
* evaluation via blocked exact-rank kernels (vs numpy + mp.Pool).

The public 7-call protocol is unchanged: set_args / set_kgs / init / run /
valid / test / save (+ retest / predict), so reference experiment drivers
map 1:1.
"""

from __future__ import annotations

import math
import os
import time
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from openea_tpu.data import read as rd
from openea_tpu.eval.evaluation import valid as eval_valid, test as eval_test, early_stop
from openea_tpu.ops import losses as L
from openea_tpu.ops.initializers import init_embeddings, l2_normalize, orthogonal_init
from openea_tpu.ops.matching import stable_alignment
from openea_tpu.ops.neighbors import build_neighbor_table
from openea_tpu.ops.optim import get_optimizer
from openea_tpu.ops.sampling import (NeighborTable, corrupt_batch,
                                     corrupt_batch_structured,
                                     proportional_batch_sizes)
from openea_tpu.ops.similarity import sim as sim_matrix
from openea_tpu.utils import generate_out_folder

Params = Dict[str, jax.Array]


class BasicModel:
    """Template: TransE-style scorer + optional d×d mapping module."""

    def __init__(self):
        self.args = None
        self.kgs = None
        self.out_folder = None
        self.params: Params = {}
        self.opt = None
        self.opt_state = None
        self.mapping_opt = None
        self.mapping_opt_state = None
        self.key = None
        self.flag1 = -1
        self.flag2 = -1
        self.early_stop = False
        self._epoch_fn_cache = {}
        # multi-chip: set by init() when args.use_mesh and >1 device
        self.mesh = None
        self._pshard = None
        self._oshard = None
        self._moshard = None
        self._repl = None

    # ------------------------------------------------------------------ #
    # protocol
    # ------------------------------------------------------------------ #

    def set_args(self, args):
        self.args = args
        self.out_folder = generate_out_folder(
            args.output, args.training_data, args.dataset_division,
            self.__class__.__name__)

    def set_kgs(self, kgs):
        self.kgs = kgs

    def init(self):
        self.check_args()
        self.key = jax.random.PRNGKey(self.args.seed)
        self.key, k = jax.random.split(self.key)
        self._define_variables(k)
        self._define_optimizers()
        self._prepare_training_arrays()
        if self.args.get("use_mesh") and len(jax.devices()) > 1:
            self._setup_mesh()

    # ------------------------------------------------------------------ #
    # multi-chip: entity/relation tables row-sharded over 'model', data
    # replicated (triple arrays are tiny next to the tables), epochs jitted
    # with explicit in/out shardings so XLA's SPMD partitioner turns table
    # gathers into local gathers + psum over ICI and keeps the scatter-add
    # gradients shard-local (SURVEY.md §2.6; the reference pins a single
    # GPU, run/run_15K.sh:96 — this axis is new capability)
    # ------------------------------------------------------------------ #

    def _setup_mesh(self):
        from openea_tpu.parallel.mesh import (
            make_mesh, param_shardings, replicated)
        from openea_tpu.parallel.train_step import _opt_state_shardings
        n = int(self.args.get("mesh_devices") or 0) or None
        self.mesh = make_mesh(n)
        self._pshard = param_shardings(self.mesh, self.params)
        self._repl = replicated(self.mesh)
        # row-sharded tables must divide evenly over the 'model' axis: pad
        # with zero rows (never looked up — ids stay < the real count) and
        # re-init the optimizer accumulators for the padded shapes
        tp = dict(self.mesh.shape).get("model", 1)
        from jax.sharding import PartitionSpec as _P
        padded = False
        for name, sh in self._pshard.items():
            if sh.spec and sh.spec[0] == "model":
                x = self.params[name]
                p = (-x.shape[0]) % tp
                if p:
                    self.params[name] = jnp.concatenate(
                        [x, jnp.zeros((p,) + x.shape[1:], x.dtype)])
                    padded = True
        if padded:
            self.opt_state = self.opt.init(self.params)
            if self.mapping_opt_state is not None:
                self.mapping_opt_state = self.mapping_opt.init(self.params)
        self.params = jax.device_put(self.params, self._pshard)
        self._oshard = _opt_state_shardings(
            self.mesh, self.opt_state, self.params, self._pshard)
        self.opt_state = jax.device_put(self.opt_state, self._oshard)
        if self.mapping_opt_state is not None:
            self._moshard = _opt_state_shardings(
                self.mesh, self.mapping_opt_state, self.params, self._pshard)
            self.mapping_opt_state = jax.device_put(
                self.mapping_opt_state, self._moshard)
        print("mesh training enabled: {} devices, mesh {}"
              .format(self.mesh.size, dict(self.mesh.shape)))

    def _jit_epoch(self, fn, n_extra: int, donate=(0, 1),
                   with_map_state: bool = False):
        """jit an epoch-style fn (params, opt_state[, map_state], key,
        *data) with mesh shardings when mesh training is on."""
        is_mapping = donate == "mapping"  # (params, mapping_opt_state, ...)
        if is_mapping:
            donate = (0, 1)
        if self.mesh is None:
            return jax.jit(fn, donate_argnums=donate)
        r = self._repl
        osh = self._oshard
        if is_mapping:
            osh = self._moshard if self._moshard is not None else r
        ins = [self._pshard, osh]
        outs = [self._pshard, osh]
        if with_map_state:
            ms = self._moshard if self._moshard is not None else r
            ins.append(ms)
            outs.append(ms)
        ins += [r] * (1 + n_extra)          # key + data args (replicated)
        outs += [r, r] if with_map_state else [r]   # loss output(s)
        return jax.jit(fn, in_shardings=tuple(ins),
                       out_shardings=tuple(outs), donate_argnums=donate)

    # custom-objective mesh helpers: models with their own optimizers /
    # epoch fns (MTransEV2, IMUSE, Attr2Vec, KDCoE, MultiKE, GMNN) shard
    # their states and jits through these instead of re-deriving the
    # base-path sharding logic
    def _shard_opt_state(self, opt_state):
        """(device_put state, shardings) for a custom optimizer state over
        self.params; (state, None) when mesh training is off."""
        if self.mesh is None:
            return opt_state, None
        from openea_tpu.parallel.train_step import _opt_state_shardings
        osh = _opt_state_shardings(self.mesh, opt_state, self.params,
                                   self._pshard)
        return jax.device_put(opt_state, osh), osh

    def _dev_cached(self, tag: str, version, arr) -> jax.Array:
        """Device-resident cache for per-epoch input arrays.

        Host->device uploads over the axon tunnel run at ~10 MB/s — a
        re-uploaded 8 MB batch-rows array costs ~1 s PER EPOCH CALL
        (measured r5: MultiKE's rel view was 1.27 s/epoch of which
        ~1.0 s was re-uploading the same static rows).  Keyed on (tag,
        version, shape): bump `version` whenever the host array's
        CONTENT changes (e.g. after a predicate-alignment refresh) —
        shape changes re-upload automatically."""
        if not hasattr(self, "_dev_arr_cache"):
            self._dev_arr_cache = {}
        arr = np.asarray(arr)
        key = (version, arr.shape, str(arr.dtype))
        hit = self._dev_arr_cache.get(tag)
        if hit is None or hit[0] != key:
            self._dev_arr_cache[tag] = (key, jnp.asarray(arr))
        return self._dev_arr_cache[tag][1]

    def _jit_custom(self, fn, n_extra: int, osh, n_out_extra: int = 1):
        """jit (params, opt_state, *data) -> (params, opt_state,
        *outputs) with mesh shardings when mesh training is on."""
        if self.mesh is None:
            return jax.jit(fn, donate_argnums=(0, 1))
        r = self._repl
        return jax.jit(fn,
                       in_shardings=(self._pshard, osh) + (r,) * n_extra,
                       out_shardings=(self._pshard, osh) + (r,) * n_out_extra,
                       donate_argnums=(0, 1))

    def check_args(self):
        """Per-model hyperparameter contract (reference-style asserts)."""

    # ------------------------------------------------------------------ #
    # variables / optimizers
    # ------------------------------------------------------------------ #

    def _uses_mapping(self) -> bool:
        return self.args.alignment_module == "mapping"

    def _define_variables(self, key: jax.Array):
        ke, kr, km = jax.random.split(key, 3)
        n_ent = self.kgs.max_entities_id
        n_rel = self.kgs.max_relations_id
        self.params = {
            "ent_embeds": init_embeddings(ke, (n_ent, self.args.dim),
                                          self.args.init, self.args.ent_l2_norm),
            "rel_embeds": init_embeddings(kr, (n_rel, self.args.dim),
                                          self.args.init, self.args.rel_l2_norm),
        }
        if self._uses_mapping():
            self.params["mapping_mat"] = orthogonal_init(
                km, (self.args.dim, self.args.dim))

    def _define_optimizers(self):
        # two independent optimizers = two accumulator sets, matching the
        # reference's separate triple/mapping TF optimizer instances
        self.opt = get_optimizer(self.args.optimizer, self.args.learning_rate)
        self.opt_state = self.opt.init(self.params)
        if self._uses_mapping():
            self.mapping_opt = get_optimizer(self.args.optimizer,
                                             self.args.learning_rate)
            self.mapping_opt_state = self.mapping_opt.init(self.params)

    # ------------------------------------------------------------------ #
    # model-specific losses (override points)
    # ------------------------------------------------------------------ #

    def _lookup(self, params: Params, triples: jax.Array):
        """Gather + l2-norm reparameterization.

        In the reference, ``ent_l2_norm`` does NOT just normalize the init:
        ``init_embeddings`` returns ``tf.nn.l2_normalize(variable)``
        (initializers.py:22-50), i.e. every lookup — in losses AND eval —
        sees row-normalized embeddings with gradients flowing through the
        normalization.  We reproduce that by normalizing the gathered rows
        (cheaper than normalizing the table)."""
        h = params["ent_embeds"][triples[:, 0]]
        r = params["rel_embeds"][triples[:, 1]]
        t = params["ent_embeds"][triples[:, 2]]
        if self.args.ent_l2_norm:
            h = l2_normalize(h)
            t = l2_normalize(t)
        if self.args.rel_l2_norm:
            r = l2_normalize(r)
        return h, r, t

    def _triple_loss(self, params: Params, pos: jax.Array, neg: jax.Array,
                     pos_w: jax.Array, neg_w: jax.Array,
                     key: Optional[jax.Array] = None) -> jax.Array:
        """Per-step loss; `key` is a fresh per-step PRNG key for models that
        need in-loss randomness (dropout, sampled softmax).

        Entity/relation rows for pos+neg are fetched with ONE gather per
        table so the backward pass issues one scatter-add per table per
        step instead of six (the scatter over the full [N, d] table is the
        dominant HBM traffic of a TransE step at 100K scale)."""
        bp, bn = pos.shape[0], neg.shape[0]
        ent_idx = jnp.concatenate([pos[:, 0], pos[:, 2], neg[:, 0], neg[:, 2]])
        rel_idx = jnp.concatenate([pos[:, 1], neg[:, 1]])
        ent_rows = params["ent_embeds"][ent_idx]
        rel_rows = params["rel_embeds"][rel_idx]
        if self.args.ent_l2_norm:
            ent_rows = l2_normalize(ent_rows)
        if self.args.rel_l2_norm:
            rel_rows = l2_normalize(rel_rows)
        phs, pts = ent_rows[:bp], ent_rows[bp:2 * bp]
        nhs, nts = ent_rows[2 * bp:2 * bp + bn], ent_rows[2 * bp + bn:]
        prs, nrs = rel_rows[:bp], rel_rows[bp:]
        return L.get_loss_func(phs, prs, pts, nhs, nrs, nts, self.args,
                               pos_w=pos_w, neg_w=neg_w)

    def _mapping_loss(self, params: Params, links: jax.Array,
                      w: jax.Array) -> jax.Array:
        # one concatenated gather -> one backward scatter-add (not two
        # dense table buffers + add_any)
        b = links.shape[0]
        er = params["ent_embeds"][jnp.concatenate([links[:, 0], links[:, 1]])]
        if self.args.ent_l2_norm:
            er = l2_normalize(er)
        return self.args.alpha * L.mapping_loss(er[:b], er[b:],
                                                params["mapping_mat"], w=w)

    # ------------------------------------------------------------------ #
    # training arrays (host, once)
    # ------------------------------------------------------------------ #

    def _prepare_training_arrays(self):
        kg1, kg2 = self.kgs.kg1, self.kgs.kg2
        t1, t2 = kg1.triples, kg2.triples
        n1, n2 = len(t1), len(t2)
        bs = self.args.batch_size
        self._steps = int(math.ceil((n1 + n2) / bs))
        self._bs1, self._bs2 = proportional_batch_sizes(n1, n2, bs)
        self._n_real = n1 + n2

        def pad_to(x, rows):
            pad = rows - len(x)
            if pad > 0:
                x = np.concatenate([x, np.zeros((pad, 3), np.int32)], axis=0)
            return x[:rows]

        rows1 = self._steps * self._bs1
        rows2 = self._steps * self._bs2
        self._t1 = jnp.asarray(pad_to(t1, rows1))
        self._t2 = jnp.asarray(pad_to(t2, rows2))
        w1 = (np.arange(rows1) < n1).astype(np.float32)
        w2 = (np.arange(rows2) < n2).astype(np.float32)
        # masks are permuted together with the triples, so they are carried
        # as arrays (shuffle moves real rows anywhere)
        self._w1 = jnp.asarray(w1)
        self._w2 = jnp.asarray(w2)
        # Keep closure constants as HOST numpy arrays: a device-resident
        # array closed over by a traced fn is fetched back to host during
        # MLIR lowering (mlir.ir_constant -> Array._value), and on the
        # remote-tunnel TPU backend that synchronous device->host read can
        # cost minutes.  numpy constants embed instantly.
        self._ents1 = np.asarray(kg1.entities, np.int32)
        self._ents2 = np.asarray(kg2.entities, np.int32)
        self._links = np.asarray(self.kgs.train_links_array, np.int32)
        self._neigh1: Optional[NeighborTable] = None
        self._neigh2: Optional[NeighborTable] = None

    # ------------------------------------------------------------------ #
    # jitted epoch
    # ------------------------------------------------------------------ #

    def _make_epoch_fn(self, use_tables: bool):
        steps, bs1, bs2 = self._steps, self._bs1, self._bs2
        num_neg = max(1, int(self.args.neg_triple_num))
        ents1, ents2 = self._ents1, self._ents2
        opt = self.opt
        lr = float(self.args.learning_rate)
        ent_norm, rel_norm = self.args.ent_l2_norm, self.args.rel_l2_norm
        template_loss = type(self)._triple_loss is BasicModel._triple_loss
        sparse = self._sparse_updates_ok() and template_loss
        # structured negatives: rebuild the uncorrupted side as
        # jnp.repeat of the positive rows (backward = static reshape-sum)
        # so the entity scatter-add receives 2B+BK rows instead of
        # 2B+2BK and loses its K-way-duplicated rows — same draws, same
        # negatives, same loss (corrupt_batch_structured)
        structured = (template_loss and not sparse
                      and bool(self.args.get("structured_neg", True)))

        def structured_step(params, opt_state, pos, cor, coin, pos_w, neg_w):
            b = pos.shape[0]

            def loss_fn(p):
                er = p["ent_embeds"][
                    jnp.concatenate([pos[:, 0], pos[:, 2], cor])]
                rr = p["rel_embeds"][pos[:, 1]]
                if ent_norm:
                    er = l2_normalize(er)
                if rel_norm:
                    rr = l2_normalize(rr)
                ph, pt, cr = er[:b], er[b:2 * b], er[2 * b:]
                rep = lambda x: jnp.repeat(x, num_neg, axis=0)
                nh = jnp.where(coin[:, None], cr, rep(ph))
                nt = jnp.where(coin[:, None], rep(pt), cr)
                return L.get_loss_func(ph, rr, pt, nh, rep(rr), nt,
                                       self.args, pos_w=pos_w, neg_w=neg_w)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        def sparse_step(params, opt_state, pos, neg, pos_w, neg_w):
            """Row-gradient step + touched-row Adagrad — same math as the
            dense optax step (see ops/optim.sparse_adagrad_apply)."""
            from openea_tpu.ops.optim import (sparse_adagrad_apply,
                                              rss_state, replace_rss)
            bp, bn = pos.shape[0], neg.shape[0]
            ent_idx = jnp.concatenate([pos[:, 0], pos[:, 2],
                                       neg[:, 0], neg[:, 2]])
            rel_idx = jnp.concatenate([pos[:, 1], neg[:, 1]])
            ent_rows0 = params["ent_embeds"][ent_idx]
            rel_rows0 = params["rel_embeds"][rel_idx]

            def loss_fn(er, rr):
                if ent_norm:
                    er = l2_normalize(er)
                if rel_norm:
                    rr = l2_normalize(rr)
                phs, pts = er[:bp], er[bp:2 * bp]
                nhs, nts = er[2 * bp:2 * bp + bn], er[2 * bp + bn:]
                prs, nrs = rr[:bp], rr[bp:]
                return L.get_loss_func(phs, prs, pts, nhs, nrs, nts,
                                       self.args, pos_w=pos_w, neg_w=neg_w)

            loss, (ge, gr) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                ent_rows0, rel_rows0)
            sos = rss_state(opt_state)
            ent, acc_e = sparse_adagrad_apply(params["ent_embeds"],
                                              sos["ent_embeds"], ent_idx,
                                              ge, lr)
            rel, acc_r = sparse_adagrad_apply(params["rel_embeds"],
                                              sos["rel_embeds"], rel_idx,
                                              gr, lr)
            params = {**params, "ent_embeds": ent, "rel_embeds": rel}
            opt_state = replace_rss(opt_state, {**sos, "ent_embeds": acc_e,
                                                "rel_embeds": acc_r})
            return params, opt_state, loss

        def epoch(params, opt_state, key, t1, w1, t2, w2, neigh1, neigh2):
            # numpy closure constants -> jnp INSIDE the trace: embeds them
            # from host memory (no tunnel round trip at lowering time)
            ents1_c = jnp.asarray(ents1)
            ents2_c = jnp.asarray(ents2)
            k1, k2, kscan = jax.random.split(key, 3)
            p1 = jax.random.permutation(k1, t1.shape[0])
            p2 = jax.random.permutation(k2, t2.shape[0])
            t1s, w1s = t1[p1].reshape(steps, bs1, 3), w1[p1].reshape(steps, bs1)
            t2s, w2s = t2[p2].reshape(steps, bs2, 3), w2[p2].reshape(steps, bs2)
            step_keys = jax.random.split(kscan, steps)

            if structured:
                # sample EVERY step's negatives before the scan: the
                # per-step neighbor-table picks are 100K-element random
                # gathers that run latency-bound inside the loop (~1.2 ms
                # each, 4/step at 100K scale); one vmapped gather over all
                # steps runs at throughput.  Same keys, same draws.
                sks = jax.vmap(lambda k: jax.random.split(k, 3))(step_keys)
                cor1s, coin1s = jax.vmap(
                    lambda k, p: corrupt_batch_structured(
                        k, p, num_neg, ents1_c, neigh1))(sks[:, 0], t1s)
                cor2s, coin2s = jax.vmap(
                    lambda k, p: corrupt_batch_structured(
                        k, p, num_neg, ents2_c, neigh2))(sks[:, 1], t2s)

                def step_structured(carry, xs):
                    params, opt_state = carry
                    pos1, w1b, pos2, w2b, cor1, coin1, cor2, coin2 = xs
                    pos = jnp.concatenate([pos1, pos2], axis=0)
                    pos_w = jnp.concatenate([w1b, w2b], axis=0)
                    neg_w = jnp.concatenate([jnp.repeat(w1b, num_neg),
                                             jnp.repeat(w2b, num_neg)], axis=0)
                    params, opt_state, loss = structured_step(
                        params, opt_state, pos,
                        jnp.concatenate([cor1, cor2]),
                        jnp.concatenate([coin1, coin2]), pos_w, neg_w)
                    return (params, opt_state), loss

                (params, opt_state), losses = jax.lax.scan(
                    step_structured, (params, opt_state),
                    (t1s, w1s, t2s, w2s, cor1s, coin1s, cor2s, coin2s))
                return params, opt_state, jnp.sum(losses)

            def step(carry, xs):
                params, opt_state = carry
                pos1, w1b, pos2, w2b, sk = xs
                sk1, sk2, sk3 = jax.random.split(sk, 3)
                pos = jnp.concatenate([pos1, pos2], axis=0)
                pos_w = jnp.concatenate([w1b, w2b], axis=0)
                neg_w = jnp.concatenate(
                    [jnp.repeat(w1b, num_neg), jnp.repeat(w2b, num_neg)], axis=0)

                neg1 = corrupt_batch(sk1, pos1, num_neg, ents1_c, neigh1)
                neg2 = corrupt_batch(sk2, pos2, num_neg, ents2_c, neigh2)
                neg = jnp.concatenate([neg1, neg2], axis=0)

                if sparse:
                    params, opt_state, loss = sparse_step(
                        params, opt_state, pos, neg, pos_w, neg_w)
                    return (params, opt_state), loss

                def loss_fn(p):
                    return self._triple_loss(p, pos, neg, pos_w, neg_w, key=sk3)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), (t1s, w1s, t2s, w2s, step_keys))
            return params, opt_state, jnp.sum(losses)

        return epoch

    def _epoch_fn(self, use_tables: bool):
        if use_tables not in self._epoch_fn_cache:
            self._epoch_fn_cache[use_tables] = self._jit_epoch(
                self._make_epoch_fn(use_tables), n_extra=6)
        return self._epoch_fn_cache[use_tables]

    def _sparse_updates_ok(self) -> bool:
        """Touched-row Adagrad (ops/optim.sparse_adagrad_apply): identical
        math to the dense step at O(batch*d) traffic — but measured SLOWER
        on the chip at benchmark scales (27 vs 12 ms/epoch at 15K): the
        per-step sort behind jnp.unique and the small scatters are
        latency-bound, while the dense full-table update is pure streaming
        the TPU excels at.  OFF by default; `sparse_updates=True` opts in
        (the tradeoff flips only when table_rows >> touched_rows by a much
        larger factor than these workloads produce)."""
        return (self.mesh is None and self.args.optimizer == "Adagrad"
                and bool(self.args.get("sparse_updates", False)))

    def _make_mapping_epoch_fn(self):
        steps = self._steps
        links = self._links
        n_links = links.shape[0]
        per_step = max(1, n_links // steps)
        opt = self.mapping_opt
        lr = float(self.args.learning_rate)
        sparse = (self._sparse_updates_ok()
                  and type(self)._mapping_loss is BasicModel._mapping_loss)
        alpha = self.args.get("alpha", 1)
        ent_norm = self.args.ent_l2_norm

        def sparse_step(params, opt_state, batch):
            from openea_tpu.ops.optim import (sparse_adagrad_apply,
                                              rss_state, replace_rss)
            b = batch.shape[0]
            ent_idx = jnp.concatenate([batch[:, 0], batch[:, 1]])
            ent_rows = params["ent_embeds"][ent_idx]

            def loss_fn(er, mat):
                e1, e2 = er[:b], er[b:]
                if ent_norm:
                    e1, e2 = l2_normalize(e1), l2_normalize(e2)
                return alpha * L.mapping_loss(e1, e2, mat, w=None)

            loss, (ge, gm) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                ent_rows, params["mapping_mat"])
            sos = rss_state(opt_state)
            ent, acc_e = sparse_adagrad_apply(params["ent_embeds"],
                                              sos["ent_embeds"], ent_idx,
                                              ge, lr)
            # mapping matrix is [d, d]-small: plain dense Adagrad row
            acc_m = sos["mapping_mat"] + gm * gm
            mat = params["mapping_mat"] - lr * gm * jax.lax.rsqrt(acc_m + 1e-7)
            params = {**params, "ent_embeds": ent, "mapping_mat": mat}
            opt_state = replace_rss(opt_state, {**sos, "ent_embeds": acc_e,
                                                "mapping_mat": acc_m})
            return params, opt_state, loss

        def epoch(params, opt_state, key):
            links_c = jnp.asarray(links)
            kperm, kscan = jax.random.split(key)
            perm = jax.random.permutation(kperm, n_links)
            rows = steps * per_step
            # cycle if steps*per_step > n_links (at most one wrap)
            idx = jnp.concatenate([perm, perm])[:rows].reshape(steps, per_step)

            def step(carry, batch_idx):
                params, opt_state = carry
                batch = links_c[batch_idx]

                if sparse:
                    params, opt_state, loss = sparse_step(params, opt_state,
                                                          batch)
                    return (params, opt_state), loss

                def loss_fn(p):
                    return self._mapping_loss(p, batch, None)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), idx)
            return params, opt_state, jnp.sum(losses)

        return epoch

    # ------------------------------------------------------------------ #
    # multi-epoch super-stepping: run K epochs (triple + optional mapping)
    # in ONE jitted call, removing the per-epoch host-device round trip.
    # The reference pays a feed_dict transfer per STEP; plain jitted epochs
    # pay one sync per epoch; a super-step pays one per K epochs.
    # ------------------------------------------------------------------ #

    def _make_super_epoch_fn(self, k: int, use_tables: bool):
        triple_raw = self._make_epoch_fn(use_tables)
        with_mapping = self._uses_mapping()
        map_raw = self._make_mapping_epoch_fn() if with_mapping else None

        def multi(params, opt_state, map_state, key, t1, w1, t2, w2, n1, n2):
            def body(carry, ek):
                p, o, m = carry
                k1, k2 = jax.random.split(ek)
                p, o, tl = triple_raw(p, o, k1, t1, w1, t2, w2, n1, n2)
                if map_raw is not None:
                    p, m, ml = map_raw(p, m, k2)
                else:
                    ml = jnp.zeros(())
                return (p, o, m), (tl, ml)

            keys = jax.random.split(key, k)
            (params, opt_state, map_state), (tls, mls) = jax.lax.scan(
                body, (params, opt_state, map_state), keys)
            return params, opt_state, map_state, tls, mls

        return self._jit_epoch(multi, n_extra=6, donate=(0, 1, 2),
                               with_map_state=True)

    def _can_fuse_valid(self) -> bool:
        """Fused on-device quick-valid is available when the model keeps
        the template eval hooks (GNN models override them with full
        forward passes) and training is single-device.  On the axon
        tunnel a separate valid() costs a full host round trip (~70 ms),
        about the same as 10 epochs of device compute at 15K scale —
        fusing it into the super-step halves the per-window wall time."""
        cls = type(self)
        return (self.mesh is None
                and cls._ent_embeds_for_eval is BasicModel._ent_embeds_for_eval
                and cls._mapping_for_eval is BasicModel._mapping_for_eval
                and self.args.eval_metric in ("inner", "cosine", "euclidean",
                                              "manhattan", "cityblock")
                and self.args.get("compute_dtype") in (None, "float32"))

    def _make_window_fn(self, k: int, use_tables: bool):
        """Shared builder for the fused paths: k epochs + the on-device
        quick-valid ranking (hits rounded to 3 decimals on device so the
        early-stop flag representation is identical across every fused
        form).  Returns one_window(params, opt_state, map_state, wk,
        data) -> (params, opt_state, map_state, tls, mls, hits, mr, mrr)."""
        triple_raw = self._make_epoch_fn(use_tables)
        with_mapping = self._uses_mapping()
        map_raw = self._make_mapping_epoch_fn() if with_mapping else None
        kgs, args = self.kgs, self.args
        if len(kgs.valid_links) > 0:
            idx1 = jnp.asarray(kgs.valid_entities1, jnp.int32)
            idx2 = jnp.asarray(kgs.valid_entities2 + kgs.test_entities2,
                               jnp.int32)
        else:
            idx1 = jnp.asarray(kgs.test_entities1, jnp.int32)
            idx2 = jnp.asarray(kgs.test_entities2, jnp.int32)
        top_k = tuple(args.top_k)
        metric = args.eval_metric
        eval_norm = bool(args.eval_norm)
        ent_norm = bool(args.ent_l2_norm)
        from openea_tpu.ops.ranking import rank_and_argmax

        def round3(x):
            return jnp.round(x * 1000.0) / 1000.0

        def one_window(params, opt_state, map_state, wk, data):
            t1, w1, t2, w2, n1, n2 = data

            def body(carry, ek):
                p, o, m = carry
                k1, k2 = jax.random.split(ek)
                p, o, tl = triple_raw(p, o, k1, t1, w1, t2, w2, n1, n2)
                if map_raw is not None:
                    p, m, ml = map_raw(p, m, k2)
                else:
                    ml = jnp.zeros(())
                return (p, o, m), (tl, ml)

            keys = jax.random.split(wk, k)
            (params, opt_state, map_state), (tls, mls) = jax.lax.scan(
                body, (params, opt_state, map_state), keys)
            ent = params["ent_embeds"]
            if ent_norm:
                ent = l2_normalize(ent)
            e1 = ent[idx1]
            e2 = ent[idx2]
            m = params.get("mapping_mat")
            if m is not None:
                e1 = e1 @ m
            gold = jnp.arange(idx1.shape[0], dtype=jnp.int32)
            ranks, _ = rank_and_argmax(e1, e2, gold, metric=metric,
                                       normalize=eval_norm, csls_k=0)
            n = ranks.shape[0]
            hits = round3(jnp.stack([jnp.sum(ranks < kk) for kk in top_k])
                          .astype(jnp.float32) / n * 100.0)
            mr = jnp.mean((ranks + 1).astype(jnp.float32))
            mrr = jnp.mean(1.0 / (ranks + 1).astype(jnp.float32))
            return params, opt_state, map_state, tls, mls, hits, mr, mrr

        return one_window

    def _make_super_valid_fn(self, k: int, use_tables: bool):
        """Super-step + fused quick-valid: K epochs, then the quick
        ranking eval (reference finding/evaluation.py:6 'valid'), all in
        ONE jitted call returning (params, opts, losses, hits@top_k, mr,
        mrr) — one device dispatch and one host fetch per eval window."""
        one_window = self._make_window_fn(k, use_tables)

        def multi(params, opt_state, map_state, key, t1, w1, t2, w2, n1, n2):
            return one_window(params, opt_state, map_state, key,
                              (t1, w1, t2, w2, n1, n2))

        return jax.jit(multi, donate_argnums=(0, 1, 2))

    _MULTIWIN = 8   # eval windows fused per device call (one compile)

    def _make_multiwin_fn(self, k: int, W: int, use_tables: bool):
        """W eval windows (k epochs + quick valid each) in ONE device
        call with ON-DEVICE early stopping: after a window's eval decides
        'stop', lax.cond freezes params/opt/flags so later windows are
        skipped — exactly the host loop's semantics (the declined params
        are kept, reference basic_model.py:252-290), at 1/W of the host
        round trips.  The PRNG key advances one split per window, so
        results are bit-identical to W separate fused calls."""
        one_window = self._make_window_fn(k, use_tables)
        top_k = tuple(self.args.top_k)
        use_hits = self.args.stop_metric == "hits1"

        def multi(params, opt_state, map_state, key, f1, f2, active_from,
                  t1, w1, t2, w2, n1, n2):
            data = (t1, w1, t2, w2, n1, n2)

            def win(carry, w_idx):
                p, o, m, ky, f1c, f2c, stopped = carry
                ky, wk = jax.random.split(ky)

                def run(_):
                    return one_window(p, o, m, wk, data)

                def skip(_):
                    z = jnp.zeros((k,))
                    zh = jnp.zeros((len(top_k),))
                    return (p, o, m, z, z, zh, jnp.zeros(()), jnp.zeros(()))

                p2, o2, m2, tls, mls, hits, mr, mrr = jax.lax.cond(
                    stopped, skip, run, None)
                # windows before `active_from` train but do not valid:
                # their flags pass through untouched and they can't stop —
                # exactly the host loop's epoch < start_valid behaviour
                # (reference basic_model.py:265 'if epoch >= start_valid')
                active = w_idx >= active_from
                flag = hits[0] if use_hits else mrr
                stop_now = (~stopped) & active & (flag <= f2c) & (f2c <= f1c)
                frozen = stopped | ~active
                f1n = jnp.where(frozen, f1c, f2c)
                f2n = jnp.where(frozen, f2c, flag)
                return ((p2, o2, m2, ky, f1n, f2n, stopped | stop_now),
                        (tls, mls, hits, mr, mrr, stopped, stop_now))

            carry0 = (params, opt_state, map_state, key,
                      f1, f2, jnp.zeros((), jnp.bool_))
            (params, opt_state, map_state, key, f1, f2, _), outs = \
                jax.lax.scan(win, carry0, jnp.arange(W, dtype=jnp.int32))
            return (params, opt_state, map_state, key, f1, f2) + outs

        return jax.jit(multi, donate_argnums=(0, 1, 2))

    def launch_training_multiwin(self, first_epoch: int, k: int) -> int:
        """Run up to _MULTIWIN fused (k epochs + valid) windows in one
        device call; prints the reference log lines for every window that
        actually executed.  Returns the number of epochs run; sets
        self.early_stop / flags exactly like the host loop."""
        W = self._MULTIWIN
        start = time.time()
        use_tables = self._neigh1 is not None
        cache_key = ("multiwin", k, W, use_tables)
        if cache_key not in self._epoch_fn_cache:
            self._epoch_fn_cache[cache_key] = self._make_multiwin_fn(
                k, W, use_tables)
        map_state = (self.mapping_opt_state if self._uses_mapping()
                     else jnp.zeros(()))
        # first window whose end epoch reaches start_valid; earlier
        # windows train without updating flags (host-loop parity)
        need = self.args.start_valid - (first_epoch - 1)
        active_from = max(0, -(-need // k) - 1)
        (self.params, self.opt_state, map_state, self.key, f1, f2,
         tls, mls, hits, mr, mrr, was_stopped, stop_now) = \
            self._epoch_fn_cache[cache_key](
                self.params, self.opt_state, map_state, self.key,
                jnp.float32(self.flag1), jnp.float32(self.flag2),
                jnp.int32(active_from),
                self._t1, self._w1, self._t2, self._w2,
                self._neigh1, self._neigh2)
        if self._uses_mapping():
            self.mapping_opt_state = map_state
        tls = np.asarray(tls)       # blocks until the device call finishes
        mls = np.asarray(mls)
        t_fetch = time.time()
        hits = np.asarray(hits)
        was_stopped = np.asarray(was_stopped)
        stop_now = np.asarray(stop_now)
        executed = int((~was_stopped).sum())
        # the residual transfers after the loss fetch are the eval
        # windows' host-side cost: attribute them to the 'quick results'
        # lines (like launch_training_k_epo_valid) so statistics.parse_log
        # per-phase sums stay faithful instead of printing 0.000 s
        dt_eval = (time.time() - t_fetch) / max(1, executed)
        dt = (t_fetch - start) / max(1, executed * k)
        n_links = max(1, self._links.shape[0])
        for w in range(executed):
            for i in range(k):
                ep = first_epoch + w * k + i
                print("epoch {}, avg. triple loss: {:.4f}, cost time: "
                      "{:.4f}s".format(ep, tls[w, i] / self._n_real, dt))
                if self._uses_mapping():
                    print("epoch {}, avg. mapping loss: {:.4f}, cost time: "
                          "{:.4f}s".format(ep, mls[w, i] / n_links, dt))
            if w < active_from:
                continue            # pre-start_valid window: no valid line
            print("quick results: hits@{} = {}%, time = {:.3f} s ".format(
                list(self.args.top_k), hits[w], dt_eval))
            if stop_now[w]:
                print("\n == should early stop == \n")
        self.flag1 = float(np.asarray(f1))
        self.flag2 = float(np.asarray(f2))
        self.early_stop = bool(stop_now.any())
        return executed * k

    def launch_training_k_epo_valid(self, first_epoch: int, k: int) -> float:
        """K epochs + quick valid fused into one call; prints the same
        per-epoch and 'quick results' lines, returns the stop metric."""
        start = time.time()
        use_tables = self._neigh1 is not None
        cache_key = ("superv", k, use_tables)
        if cache_key not in self._epoch_fn_cache:
            self._epoch_fn_cache[cache_key] = self._make_super_valid_fn(
                k, use_tables)
        self.key, kk = jax.random.split(self.key)
        map_state = (self.mapping_opt_state if self._uses_mapping()
                     else jnp.zeros(()))
        (self.params, self.opt_state, map_state, tls, mls, hits, mr, mrr) = \
            self._epoch_fn_cache[cache_key](
                self.params, self.opt_state, map_state, kk, self._t1,
                self._w1, self._t2, self._w2, self._neigh1, self._neigh2)
        if self._uses_mapping():
            self.mapping_opt_state = map_state
        tls = np.asarray(tls)
        mls = np.asarray(mls)
        dt = (time.time() - start) / k
        n_links = max(1, self._links.shape[0])
        for i in range(k):
            print("epoch {}, avg. triple loss: {:.4f}, cost time: {:.4f}s"
                  .format(first_epoch + i, tls[i] / self._n_real, dt))
            if self._uses_mapping():
                print("epoch {}, avg. mapping loss: {:.4f}, cost time: "
                      "{:.4f}s".format(first_epoch + i, mls[i] / n_links, dt))
        t_e = time.time()
        hits = np.asarray(hits)       # round3'd on device (f32)
        hits_r = np.array([round(float(h), 3) for h in hits])
        mrr = float(mrr)
        # eval ran inside the fused call; the residual fetch is its cost
        print("quick results: hits@{} = {}%, time = {:.3f} s ".format(
            list(self.args.top_k), hits_r, time.time() - t_e))
        # flag from the RAW device f32 so its representation is identical
        # to the multiwin path's carried flags (early_stop uses <= equality)
        return float(hits[0]) if self.args.stop_metric == "hits1" else mrr

    def launch_training_k_epo(self, first_epoch: int, k: int):
        start = time.time()
        use_tables = self._neigh1 is not None
        cache_key = ("super", k, use_tables)
        if cache_key not in self._epoch_fn_cache:
            self._epoch_fn_cache[cache_key] = self._make_super_epoch_fn(
                k, use_tables)
        self.key, kk = jax.random.split(self.key)
        map_state = (self.mapping_opt_state if self._uses_mapping()
                     else jnp.zeros(()))
        (self.params, self.opt_state, map_state, tls, mls) = \
            self._epoch_fn_cache[cache_key](
                self.params, self.opt_state, map_state, kk, self._t1,
                self._w1, self._t2, self._w2, self._neigh1, self._neigh2)
        if self._uses_mapping():
            self.mapping_opt_state = map_state
        tls = np.asarray(tls)
        mls = np.asarray(mls)
        dt = (time.time() - start) / k
        n_links = max(1, self._links.shape[0])
        for i in range(k):
            print("epoch {}, avg. triple loss: {:.4f}, cost time: {:.4f}s"
                  .format(first_epoch + i, tls[i] / self._n_real, dt))
            if self._uses_mapping():
                print("epoch {}, avg. mapping loss: {:.4f}, cost time: "
                      "{:.4f}s".format(first_epoch + i, mls[i] / n_links, dt))

    # ------------------------------------------------------------------ #
    # epoch drivers
    # ------------------------------------------------------------------ #

    def launch_triple_training_1epo(self, epoch: int):
        start = time.time()
        use_tables = self._neigh1 is not None
        fn = self._epoch_fn(use_tables)
        self.key, k = jax.random.split(self.key)
        self.params, self.opt_state, loss_sum = fn(
            self.params, self.opt_state, k, self._t1, self._w1, self._t2,
            self._w2, self._neigh1, self._neigh2)
        avg = float(loss_sum) / self._n_real
        print("epoch {}, avg. triple loss: {:.4f}, cost time: {:.4f}s"
              .format(epoch, avg, time.time() - start))

    def launch_mapping_training_1epo(self, epoch: int):
        start = time.time()
        if not hasattr(self, "_mapping_epoch_fn_c"):
            self._mapping_epoch_fn_c = self._jit_epoch(
                self._make_mapping_epoch_fn(), n_extra=0, donate="mapping")
        self.key, k = jax.random.split(self.key)
        self.params, self.mapping_opt_state, loss_sum = self._mapping_epoch_fn_c(
            self.params, self.mapping_opt_state, k)
        n = max(1, self._links.shape[0])
        print("epoch {}, avg. mapping loss: {:.4f}, cost time: {:.4f}s"
              .format(epoch, float(loss_sum) / n, time.time() - start))

    def launch_training_1epo(self, epoch: int):
        self.launch_triple_training_1epo(epoch)
        if self._uses_mapping():
            self.launch_mapping_training_1epo(epoch)

    def _regenerate_neighbors(self):
        t1 = time.time()
        eps = self.args.truncated_epsilon
        assert 0.0 < eps < 1.0
        ent = self._ent_embeds_for_eval()
        k1 = int((1 - eps) * self.kgs.kg1.entities_num)
        k2 = int((1 - eps) * self.kgs.kg2.entities_num)
        max_id = self.kgs.max_entities_id
        emesh = self._eval_mesh() if self.mesh is not None else None
        self._neigh1 = build_neighbor_table(ent[self._ents1], self._ents1,
                                            max(1, k1), max_id, mesh=emesh)
        self._neigh2 = build_neighbor_table(ent[self._ents2], self._ents2,
                                            max(1, k2), max_id, mesh=emesh)
        n = self.kgs.kg1.entities_num + self.kgs.kg2.entities_num
        print("\ngenerating neighbors of {} entities costs {:.3f} s."
              .format(n, time.time() - t1))

    # ------------------------------------------------------------------ #
    # checkpoint / resume (absent upstream: the reference saves only final
    # embeddings and cannot resume, SURVEY.md §5)
    # ------------------------------------------------------------------ #

    def _checkpoint_state(self, epoch: int):
        return {"params": self.params, "opt_state": self.opt_state,
                "key": self.key, "epoch": jnp.asarray(epoch),
                "flags": jnp.asarray([self.flag1, self.flag2])}

    def save_checkpoint(self, epoch: int, path: Optional[str] = None):
        from openea_tpu.checkpoint import save_state
        path = path or os.path.join(self.out_folder, "checkpoint")
        save_state(path, self._checkpoint_state(epoch))

    def restore_checkpoint(self, path: Optional[str] = None) -> int:
        """Returns the epoch to resume from (0 = no checkpoint found)."""
        from openea_tpu.checkpoint import load_state
        path = path or os.path.join(self.out_folder, "checkpoint")
        state = load_state(path, self._checkpoint_state(0))
        if state is None:
            return 0
        self.params = jax.tree.map(jnp.asarray, state["params"])
        self.opt_state = jax.tree.map(jnp.asarray, state["opt_state"])
        if self.mesh is not None:
            self.params = jax.device_put(self.params, self._pshard)
            self.opt_state = jax.device_put(self.opt_state, self._oshard)
        self.key = jnp.asarray(state["key"])
        self.flag1, self.flag2 = (float(x) for x in state["flags"])
        epoch = int(state["epoch"])
        print(f"resumed from checkpoint at epoch {epoch}")
        return epoch

    def precompile(self):
        """AOT-compile the training functions without executing them
        (jit.lower().compile()), so a subsequent run() measures steady-state
        compute.  First-compile on the axon backend costs minutes and
        varies with server load; callers that report timings should
        precompile outside the timed region."""
        t = time.time()
        use_tables = self._neigh1 is not None
        epc = max(1, int(self.args.get("epochs_per_call", 1) or 1))
        map_state = (self.mapping_opt_state if self._uses_mapping()
                     else jnp.zeros(()))
        if epc > 1:
            multiwin_mode = (self._can_fuse_valid()
                             and epc == self.args.eval_freq
                             and self.args.neg_sampling != "truncated"
                             and not self.args.get("checkpoint_freq")
                             and self.args.max_epoch >= epc * self._MULTIWIN)
            if multiwin_mode:
                # the run loop routes epochs (pre-valid ones eval-masked)
                # through this one executable; the super/superv forms are
                # only needed for the tail when max_epoch is not a
                # multiple of epc * _MULTIWIN (the run loop falls back to
                # them for the last < _MULTIWIN windows) — compiling them
                # unconditionally would triple axon compile time for
                # programs most presets never dispatch
                keym = ("multiwin", epc, self._MULTIWIN, use_tables)
                if keym not in self._epoch_fn_cache:
                    self._epoch_fn_cache[keym] = self._make_multiwin_fn(
                        epc, self._MULTIWIN, use_tables)
                self._epoch_fn_cache[keym].lower(
                    self.params, self.opt_state, map_state, self.key,
                    jnp.float32(-1), jnp.float32(-1), jnp.int32(0),
                    self._t1, self._w1, self._t2, self._w2,
                    self._neigh1, self._neigh2).compile()
                if self.args.max_epoch % (epc * self._MULTIWIN) == 0:
                    print("precompile done in {:.1f} s".format(
                        time.time() - t))
                    return
                # else fall through and compile the tail executables too
            key = ("super", epc, use_tables)
            if key not in self._epoch_fn_cache:
                self._epoch_fn_cache[key] = self._make_super_epoch_fn(
                    epc, use_tables)
            self._epoch_fn_cache[key].lower(
                self.params, self.opt_state, map_state, self.key, self._t1,
                self._w1, self._t2, self._w2, self._neigh1,
                self._neigh2).compile()
            if self._can_fuse_valid():
                keyv = ("superv", epc, use_tables)
                if keyv not in self._epoch_fn_cache:
                    self._epoch_fn_cache[keyv] = self._make_super_valid_fn(
                        epc, use_tables)
                self._epoch_fn_cache[keyv].lower(
                    self.params, self.opt_state, map_state, self.key,
                    self._t1, self._w1, self._t2, self._w2, self._neigh1,
                    self._neigh2).compile()
        else:
            self._epoch_fn(use_tables).lower(
                self.params, self.opt_state, self.key, self._t1, self._w1,
                self._t2, self._w2, self._neigh1, self._neigh2).compile()
        print("precompile done in {:.1f} s".format(time.time() - t))

    def run(self):
        t = time.time()
        # optional device tracing (the reference's only tracing is
        # time.time() prints, SURVEY.md §5; pass profile_dir for a real
        # jax.profiler trace of the training loop)
        profile_dir = self.args.get("profile_dir")
        if profile_dir:
            jax.profiler.start_trace(profile_dir)
        try:
            self._run_loop(t)
        finally:
            if profile_dir:
                jax.profiler.stop_trace()

    def _run_loop(self, t):
        start_epoch = 0
        ckpt_freq = int(self.args.get("checkpoint_freq", 0) or 0)
        if self.args.get("resume"):
            start_epoch = self.restore_checkpoint(self.args.get("checkpoint_path"))
        epc = max(1, int(self.args.get("epochs_per_call", 1) or 1))
        if self.args.get("timed_epochs"):
            # measured-timing mode (VERDICT r3 #8): force 1-epoch device
            # calls so every per-epoch cost-time line is an individually
            # measured wall-clock delta — run_time.py-style sums over the
            # log are then measurements, not within-call averages.  Costs
            # one host round trip per epoch (~60-70 ms on the axon
            # tunnel), so keep it off for production runs.
            if epc > 1:
                print("timed_epochs: forcing epochs_per_call 1 (each "
                      "cost-time line is an individual measurement)")
            epc = 1
        elif epc > 1:
            # timing-semantics disclosure (VERDICT r2 #8): fused epochs
            # print the within-call average as each epoch's cost time, so
            # per-epoch lines are sum-faithful but not individually
            # measured.  parse_log ignores this line.
            print("epochs_per_call = {}: epochs run fused in one device "
                  "call; per-epoch cost-time lines report the within-call "
                  "average (set epochs_per_call = 1 for individually "
                  "measured epochs)".format(epc))
        epoch = start_epoch
        while epoch < self.args.max_epoch:
            # run up to `epc` epochs in one jitted call, stopping at the
            # next eval / neighbor-regen / checkpoint boundary
            k = min(epc, self.args.max_epoch - epoch)
            for freq in (self.args.eval_freq,
                         self.args.truncated_freq
                         if self.args.neg_sampling == "truncated" else 0,
                         ckpt_freq):
                if freq:
                    to_boundary = freq - (epoch % freq)
                    k = min(k, to_boundary)
            will_valid = (epoch + k >= self.args.start_valid
                          and (epoch + k) % self.args.eval_freq == 0)
            can_fuse = k > 1 and will_valid and self._can_fuse_valid()
            if (k > 1 and k == self.args.eval_freq
                    and self._can_fuse_valid()
                    and self.args.neg_sampling != "truncated"
                    and not ckpt_freq
                    and self.args.max_epoch - epoch >= k * self._MULTIWIN):
                # batch several eval windows into one device call with
                # on-device early stopping (axon round trips dominate
                # past this point).  Pre-start_valid windows run through
                # the SAME executable with eval masked off (active_from),
                # so the whole training needs exactly one compile.
                epoch += self.launch_training_multiwin(epoch + 1, k)
                if self.early_stop or epoch >= self.args.max_epoch:
                    break
            elif can_fuse:
                flag = self.launch_training_k_epo_valid(epoch + 1, k)
                epoch += k
                self.flag1, self.flag2, self.early_stop = early_stop(
                    self.flag1, self.flag2, flag)
                if self.early_stop or epoch >= self.args.max_epoch:
                    break
            else:
                if k > 1:
                    self.launch_training_k_epo(epoch + 1, k)
                else:
                    self.launch_training_1epo(epoch + 1)
                epoch += k
                if will_valid:
                    flag = self.valid(self.args.stop_metric)
                    self.flag1, self.flag2, self.early_stop = early_stop(
                        self.flag1, self.flag2, flag)
                    if self.early_stop or epoch >= self.args.max_epoch:
                        break
            if (self.args.neg_sampling == "truncated"
                    and epoch % self.args.truncated_freq == 0):
                self._regenerate_neighbors()
            if ckpt_freq and epoch % ckpt_freq == 0:
                self.save_checkpoint(epoch, self.args.get("checkpoint_path"))
        print("Training ends. Total time = {:.3f} s.".format(time.time() - t))

    # ------------------------------------------------------------------ #
    # evaluation / persistence
    # ------------------------------------------------------------------ #

    def _ent_embeds_for_eval(self) -> jax.Array:
        """Hook: embeddings used at eval time (GNN models override).
        Applies the same l2-norm reparameterization as training lookups
        (reference eval reads the normalized tensor)."""
        ent = self.params["ent_embeds"]
        return l2_normalize(ent) if self.args.ent_l2_norm else ent

    def _rel_embeds_for_eval(self):
        rel = self.params.get("rel_embeds")
        if rel is None:
            return None
        return l2_normalize(rel) if self.args.rel_l2_norm else rel

    def _mapping_for_eval(self):
        return self.params.get("mapping_mat")

    def _eval_valid_embeddings(self):
        ent = self._ent_embeds_for_eval()
        if len(self.kgs.valid_links) > 0:
            e1 = ent[jnp.asarray(self.kgs.valid_entities1, jnp.int32)]
            e2 = ent[jnp.asarray(self.kgs.valid_entities2 +
                                 self.kgs.test_entities2, jnp.int32)]
        else:
            e1 = ent[jnp.asarray(self.kgs.test_entities1, jnp.int32)]
            e2 = ent[jnp.asarray(self.kgs.test_entities2, jnp.int32)]
        return e1, e2, self._mapping_for_eval()

    def _eval_test_embeddings(self):
        ent = self._ent_embeds_for_eval()
        e1 = ent[jnp.asarray(self.kgs.test_entities1, jnp.int32)]
        e2 = ent[jnp.asarray(self.kgs.test_entities2, jnp.int32)]
        return e1, e2, self._mapping_for_eval()

    def _eval_mesh(self):
        """1-D mesh over the training mesh's devices for row-sharded eval
        (None when mesh training is off -> single-device eval path)."""
        if self.mesh is None:
            return None
        from openea_tpu.parallel.eval_sharded import eval_mesh
        return eval_mesh(list(self.mesh.devices.flatten()))

    def valid(self, stop_metric: str):
        e1, e2, mapping = self._eval_valid_embeddings()
        hits1, mrr = eval_valid(e1, e2, mapping, self.args.top_k,
                                metric=self.args.eval_metric,
                                normalize=self.args.eval_norm,
                                csls_k=0, accurate=False,
                                compute_dtype=self.args.get("compute_dtype"),
                                mesh=self._eval_mesh())
        return hits1 if stop_metric == "hits1" else mrr

    def test(self, save: bool = True):
        from openea_tpu.eval.evaluation import test_both
        e1, e2, mapping = self._eval_test_embeddings()
        mesh = self._eval_mesh()
        rest_12, _, _ = test_both(e1, e2, mapping, self.args.top_k,
                                  metric=self.args.eval_metric,
                                  normalize=self.args.eval_norm,
                                  csls_k=self.args.csls, mesh=mesh)
        if save:
            pairs = [(self.kgs.test_entities1[i], self.kgs.test_entities2[j])
                     for i, j in rest_12]
            rd.save_results(self.out_folder, pairs)

    def retest(self):
        """Reload saved .npy embeddings from the newest sibling run and
        re-evaluate (reference basic_model.py:140-182)."""
        parent = os.path.dirname(self.out_folder.rstrip("/"))
        runs = sorted(os.listdir(parent))
        folder = os.path.join(parent, runs[-1])
        embeds = np.load(os.path.join(folder, "ent_embeds.npy"))
        e1 = embeds[self.kgs.test_entities1]
        e2 = embeds[self.kgs.test_entities2]
        mapping = None
        mpath = os.path.join(folder, "mapping_mat.npy")
        if os.path.exists(mpath):
            mapping = np.load(mpath)
        print("conventional test:")
        eval_test(e1, e2, mapping, self.args.top_k, metric=self.args.eval_metric,
                  normalize=self.args.eval_norm, csls_k=0, accurate=True)
        print("conventional reversed test:")
        if mapping is not None:
            e1m = np.asarray(jnp.asarray(e1) @ jnp.asarray(mapping))
            eval_test(e2, e1m, None, self.args.top_k, metric=self.args.eval_metric,
                      normalize=self.args.eval_norm, csls_k=0, accurate=True)
            e1 = e1m
        else:
            eval_test(e2, e1, None, self.args.top_k, metric=self.args.eval_metric,
                      normalize=self.args.eval_norm, csls_k=0, accurate=True)
        print("stable test:")
        stable_alignment(e1, e2, self.args.eval_metric, self.args.eval_norm,
                         csls_k=0)
        print("stable test with csls:")
        stable_alignment(e1, e2, self.args.eval_metric, self.args.eval_norm,
                         csls_k=self.args.csls)

    def save(self):
        ent = np.asarray(self._ent_embeds_for_eval())
        rel = self._rel_embeds_for_eval()
        rel = np.asarray(rel) if rel is not None else None
        mapping = self.params.get("mapping_mat")
        mapping = np.asarray(mapping) if mapping is not None else None
        rd.save_embeddings(self.out_folder, self.kgs, ent, rel, None,
                           mapping_mat=mapping)
        print("Embeddings saved!")

    # ------------------------------------------------------------------ #
    # prediction API (reference basic_model.py:292-413)
    # ------------------------------------------------------------------ #

    def predict(self, top_k: int = 1, min_sim_value: Optional[float] = None,
                output_file_name: Optional[str] = None):
        ent = self._ent_embeds_for_eval()
        # built from kgs (models with custom init don't prepare _ents1/2)
        ents1 = jnp.asarray(self.kgs.kg1.entities)
        ents2 = jnp.asarray(self.kgs.kg2.entities)
        e1 = ent[ents1]
        e2 = ent[ents2]
        mapping = self._mapping_for_eval()
        if mapping is not None:
            e1 = e1 @ mapping
        s = sim_matrix(e1, e2, metric=self.args.eval_metric,
                       normalize=self.args.eval_norm, csls_k=0)
        matched = set()
        s_np = np.asarray(s)
        if top_k:
            # vectorized union of row-wise and column-wise top-k pairs; the
            # previous per-row Python loop cost minutes at 100K scale
            kr = min(top_k, s.shape[1])
            kc = min(top_k, s.shape[0])
            _, idx_r = jax.lax.top_k(s, kr)
            _, idx_c = jax.lax.top_k(s.T, kc)
            idx_r, idx_c = np.asarray(idx_r), np.asarray(idx_c)
            ri = np.repeat(np.arange(s_np.shape[0]), kr)
            rj = idx_r.reshape(-1)
            ci = idx_c.reshape(-1)
            cj = np.repeat(np.arange(s_np.shape[1]), kc)
            ii = np.concatenate([ri, ci])
            jj = np.concatenate([rj, cj])
            if min_sim_value:
                keep = s_np[ii, jj] > min_sim_value
                ii, jj = ii[keep], jj[keep]
            matched = set(zip(ii.tolist(), jj.tolist()))
        elif min_sim_value:
            rows, cols = np.nonzero(s_np > min_sim_value)
            matched = set(zip(rows.tolist(), cols.tolist()))
        else:
            raise ValueError("either top_k or min_sim_value must be set")

        kg1_uri = {v: k for k, v in self.kgs.kg1.entities_id_dict.items()}
        kg2_uri = {v: k for k, v in self.kgs.kg2.entities_id_dict.items()}
        ents1 = np.asarray(ents1)
        ents2 = np.asarray(ents2)
        out = [(kg1_uri[int(ents1[i])], kg2_uri[int(ents2[j])], float(s_np[i, j]))
               for i, j in matched]
        if output_file_name is not None:
            os.makedirs(self.out_folder, exist_ok=True)
            with open(os.path.join(self.out_folder, output_file_name), "w",
                      encoding="utf8") as f:
                for a, b, c in out:
                    f.write(f"{a}\t{b}\t{c}\n")
        return out

    def predict_entities(self, entities_file_path: str,
                         output_file_name: Optional[str] = None):
        pairs1, pairs2 = [], []
        with open(entities_file_path, "r", encoding="utf-8") as f:
            for line in f:
                a, b = line.strip("\n").split("\t")
                pairs1.append(self.kgs.kg1.entities_id_dict[a])
                pairs2.append(self.kgs.kg2.entities_id_dict[b])
        d1 = sorted(set(pairs1))
        d2 = sorted(set(pairs2))
        pos1 = {e: i for i, e in enumerate(d1)}
        pos2 = {e: i for i, e in enumerate(d2)}
        ent = self._ent_embeds_for_eval()
        e1 = ent[jnp.asarray(d1, jnp.int32)]
        e2 = ent[jnp.asarray(d2, jnp.int32)]
        mapping = self._mapping_for_eval()
        if mapping is not None:
            e1 = e1 @ mapping
        s = np.asarray(sim_matrix(e1, e2, metric=self.args.eval_metric,
                                  normalize=self.args.eval_norm, csls_k=0))
        kg1_uri = {v: k for k, v in self.kgs.kg1.entities_id_dict.items()}
        kg2_uri = {v: k for k, v in self.kgs.kg2.entities_id_dict.items()}
        out = [(kg1_uri[a], kg2_uri[b], float(s[pos1[a], pos2[b]]))
               for a, b in zip(pairs1, pairs2)]
        if output_file_name is not None:
            os.makedirs(self.out_folder, exist_ok=True)
            with open(os.path.join(self.out_folder, output_file_name), "w",
                      encoding="utf8") as f:
                for a, b, c in out:
                    f.write(f"{a}\t{b}\t{c}\n")
        return out
