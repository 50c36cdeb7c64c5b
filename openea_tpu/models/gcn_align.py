"""GCN-Align (reference approaches/gcn_align.py, refactor of
github.com/1049451037/GCN-Align).

Two 2-layer GCNs over one relation-functionality-weighted, sym-normalized
adjacency (reference :642-664, :566-573):

* SE (structure): featureless — layer 1's weight matrix IS the node
  feature table; out = A @ relu(A @ W_se).
* AE (attribute): input = entity x top-70%-attribute 0/1 incidence
  (reference load_attr :89-110); out = A @ relu(A @ (attr @ W_ae)).

Both optimize the same manhattan margin align loss over seed links with k
uniform negatives per side, resampled every 10 epochs (reference
:298-320, :751-763); final embeddings concat beta*SE and (1-beta)*AE.

TPU design: the adjacency lives in HBM as a row-sorted COO consumed by a
segment-sum SpMM (ops/graph.py); each epoch is ONE jitted full-batch step
per view (forward SpMM chain + loss + SGD update) instead of two
session.run round-trips; negatives are resampled on device.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from openea_tpu.data import read as rd
from openea_tpu.eval.evaluation import early_stop
from openea_tpu.models.base import BasicModel
from openea_tpu.ops.graph import (SparseAdj, normalized_weighted_adj,
                                  build_sparse, spmm, spmm_fn)
from openea_tpu.ops.initializers import l2_normalize


def load_attr_matrix(ent_num: int, kgs):
    """entity x attribute 0/1 incidence over the most frequent 70% of
    attributes (reference gcn_align.py:89-110); returned as COO arrays."""
    cnt = {}
    ead = dict(kgs.kg1.entity_attributes_dict)
    ead.update(kgs.kg2.entity_attributes_dict)
    for _, attrs in ead.items():
        for a in attrs:
            cnt[a] = cnt.get(a, 0) + 1
    # count ties break on attribute id (not dict insertion order) so the
    # attr->column assignment is identical across processes
    fre = sorted(cnt, key=lambda x: (-cnt[x], x))
    num = int(0.7 * len(cnt))
    attr2id = {a: i for i, a in enumerate(fre[:num])}
    rows, cols = [], []
    for e, attrs in ead.items():
        for a in attrs:
            if a in attr2id:
                rows.append(e)
                cols.append(attr2id[a])
    return (np.asarray(rows, np.int32), np.asarray(cols, np.int32),
            np.ones(len(rows), np.float32), num)


class GCN_Align(BasicModel):

    def __init__(self):
        super().__init__()
        self.vec_se = None
        self.vec_ae = None

    def check_args(self):
        a = self.args
        assert a.alignment_module == "mapping"
        assert a.neg_triple_num > 1
        assert a.learning_rate >= 0.01

    def init(self):
        self.check_args()
        self.key = jax.random.PRNGKey(self.args.seed)
        a = self.args
        e = self.kgs.max_entities_id
        self.e = e
        triples = (self.kgs.kg1.relation_triples_list
                   + self.kgs.kg2.relation_triples_list)
        self.adj = normalized_weighted_adj(e, triples, host=True)

        # wo_attr ablation: SE branch only, no attribute incidence / AE
        # model (reference approaches_without_attribute/gcn_align.py:764-770
        # drops the AE loss from training)
        if self.args.get("use_attributes", True):
            ar, ac, av, a_num = load_attr_matrix(e, self.kgs)
        else:
            ar = ac = av = np.zeros((0,), np.int32)
            a_num = 0
        self.a_num = a_num
        self.attr_sp: Optional[SparseAdj] = (
            build_sparse(ar, ac, av, e, host=True) if a_num > 0 else None)

        self.key, k1, k2 = jax.random.split(self.key, 3)
        se_dim = a.get("se_dim", a.dim)
        ae_dim = a.get("ae_dim", a.dim)
        # SE layer-1 weight doubles as the node feature table:
        # truncated-normal std 1/sqrt(fan_in), rows l2-normalized
        # (reference trunc_normal init, gcn_align.py:52-56)
        w_se = jax.random.truncated_normal(k1, -2.0, 2.0, (e, se_dim)) / np.sqrt(e)
        self.params = {"w_se": l2_normalize(w_se)}
        if self.attr_sp is not None:
            # glorot uniform (reference glorot init :33-37)
            rng = np.sqrt(6.0 / (a_num + ae_dim))
            self.params["w_ae"] = jax.random.uniform(
                k2, (a_num, ae_dim), minval=-rng, maxval=rng)

        self.opt = optax.sgd(a.learning_rate)
        self.opt_state = self.opt.init(self.params)
        self._train_links = np.asarray(self.kgs.train_links_array, np.int32)
        if a.get("use_mesh") and len(jax.devices()) > 1:
            self._setup_mesh_gnn()
        else:
            # TPU: Pallas sorted-segment SpMM (adjacency weights are
            # constants here, so the no-val-grad Pallas path is exact;
            # spmm_precision='default' switches to bf16 feature gathers
            # with f32 accumulate — ~2x less HBM traffic, ~2e-3 rel err)
            prec = self.args.get("spmm_precision", "highest")
            self._spmm_adj = spmm_fn(self.adj, precision=prec)
            self._spmm_attr = (spmm_fn(self.attr_sp, n_cols=a_num,
                                       precision=prec)
                               if self.attr_sp is not None else None)
        self._step_fn = self._make_step_fn()

    # ------------------------------------------------------------------ #
    # multi-chip: full-graph mesh training (BASELINE.md north star).  The
    # adjacency is edge-partitioned into nnz-balanced contiguous row
    # ranges; each layer's SpMM exchanges only boundary-entity rows via
    # one all_to_all (parallel/spmm_sharded.boundary_spmm_padded), the
    # node-feature table w_se lives row-sharded in the shard-major padded
    # layout, and the attribute incidence runs shard-local against the
    # replicated [a_num, ae_dim] weight.  The reference trains this model
    # on one pinned GPU (run/run_15K.sh:96) — this axis is new capability.
    # ------------------------------------------------------------------ #

    def _setup_mesh_gnn(self):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from openea_tpu.parallel.spmm_sharded import (
            plan_boundary_exchange, pad_rows, partition_by_plan)
        devs = jax.devices()
        n = int(self.args.get("mesh_devices") or 0) or len(devs)
        self.mesh = Mesh(np.asarray(devs[:n]), ("x",))
        self._plan = plan_boundary_exchange(self.adj, n)
        shard = NamedSharding(self.mesh, P("x", None))
        # w_se (the node-feature table) moves to the padded layout
        self.params["w_se"] = jax.device_put(
            pad_rows(self._plan, self.params["w_se"]), shard)
        if "w_ae" in self.params:
            self.params["w_ae"] = jax.device_put(
                self.params["w_ae"], NamedSharding(self.mesh, P()))
        self.opt_state = self.opt.init(self.params)
        self._attr_parts = (partition_by_plan(self.attr_sp, self._plan)
                            if self.attr_sp is not None else None)
        # loss gathers address padded slots: remap once on host
        out_map = np.asarray(self._plan.out_map)
        self._train_links = out_map[self._train_links].astype(np.int32)
        self._out_map_dev = jnp.asarray(out_map)
        print("mesh training enabled: {} devices, mesh {} (boundary-"
              "exchange SpMM, r={})".format(self.mesh.size,
                                            dict(self.mesh.shape),
                                            self._plan.r))

    # ------------------------------------------------------------------ #
    # forward
    # ------------------------------------------------------------------ #

    def _forward_se(self, params):
        if self.mesh is not None:
            from openea_tpu.parallel.spmm_sharded import boundary_spmm_padded
            h = jax.nn.relu(
                boundary_spmm_padded(self.mesh, self._plan, params["w_se"]))
            return boundary_spmm_padded(self.mesh, self._plan, h)
        h = jax.nn.relu(self._spmm_adj(params["w_se"]))
        return self._spmm_adj(h)

    def _forward_ae(self, params):
        if self.mesh is not None:
            from openea_tpu.parallel.spmm_sharded import (
                boundary_spmm_padded, local_spmm_padded)
            x = local_spmm_padded(self.mesh, self._plan, self._attr_parts,
                                  params["w_ae"])
            h = jax.nn.relu(boundary_spmm_padded(self.mesh, self._plan, x))
            return boundary_spmm_padded(self.mesh, self._plan, h)
        x = self._spmm_attr(params["w_ae"])
        h = jax.nn.relu(self._spmm_adj(x))
        return self._spmm_adj(h)

    def _unpad(self, out):
        """Padded mesh layout -> global rows (identity off-mesh)."""
        if self.mesh is None:
            return out
        from openea_tpu.parallel.spmm_sharded import unpad_rows
        return unpad_rows(self._plan, out)

    @staticmethod
    def _align_loss(out, links, neg_right, neg2_left, gamma, k):
        """Manhattan margin loss with left- and right-corrupted negatives
        (reference align_loss, gcn_align.py:298-320)."""
        t = links.shape[0]
        left, right = links[:, 0], links[:, 1]
        A = jnp.sum(jnp.abs(out[left] - out[right]), axis=-1)        # [t]
        D = (A + gamma)[:, None]
        B1 = jnp.sum(jnp.abs(out[jnp.repeat(left, k)] - out[neg_right]),
                     axis=-1).reshape(t, k)
        L1 = jax.nn.relu(D - B1)
        B2 = jnp.sum(jnp.abs(out[neg2_left] - out[jnp.repeat(right, k)]),
                     axis=-1).reshape(t, k)
        L2 = jax.nn.relu(D - B2)
        return (jnp.sum(L1) + jnp.sum(L2)) / (2.0 * k * t)

    def _make_step_fn(self, jit: bool = True):
        gamma = float(self.args.gamma)
        k = int(self.args.neg_triple_num)
        links = self._train_links
        has_ae = self.attr_sp is not None
        opt = self.opt

        def step(params, opt_state, neg_right, neg2_left):
            def loss_fn(p):
                loss = self._align_loss(self._forward_se(p), links, neg_right,
                                        neg2_left, gamma, k)
                if has_ae:
                    loss = loss + self._align_loss(self._forward_ae(p), links,
                                                   neg_right, neg2_left, gamma, k)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return jax.jit(step, donate_argnums=(0, 1)) if jit else step

    # ------------------------------------------------------------------ #
    # training
    # ------------------------------------------------------------------ #

    def _make_multi_step(self, n: int):
        """n full-batch epochs in one device call (negatives fixed
        between the 10-epoch resample boundaries)."""
        step = self._make_step_fn(jit=False)

        def multi(params, opt_state, neg_right, neg2_left):
            def body(carry, _):
                p, o = carry
                p, o, loss = step(p, o, neg_right, neg2_left)
                return (p, o), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), None, length=n)
            return params, opt_state, losses

        return jax.jit(multi, donate_argnums=(0, 1))

    def _multi_fn(self, n: int):
        self._multi_cache = getattr(self, "_multi_cache", {})
        if n not in self._multi_cache:
            self._multi_cache[n] = self._make_multi_step(n)
        return self._multi_cache[n]

    def precompile(self):
        import time as _time
        t = _time.time()
        tk = self._train_links.shape[0] * int(self.args.neg_triple_num)
        dummy = jnp.zeros((tk,), jnp.int32)
        n = 10
        if self.args.eval_freq:
            n = min(n, int(self.args.eval_freq))
        self._multi_fn(n).lower(self.params, self.opt_state, dummy,
                                dummy).compile()
        print("precompile done in {:.1f} s".format(_time.time() - t))

    def _sample_negs(self):
        t = self._train_links.shape[0]
        k = int(self.args.neg_triple_num)
        self.key, k1, k2 = jax.random.split(self.key, 3)
        neg_right = jax.random.randint(k1, (t * k,), 0, self.e)
        neg2_left = jax.random.randint(k2, (t * k,), 0, self.e)
        if self.mesh is not None:
            neg_right = self._out_map_dev[neg_right]
            neg2_left = self._out_map_dev[neg2_left]
        return neg_right, neg2_left

    def run(self):
        t0 = time.time()
        a = self.args
        epoch = 0
        neg_right = neg2_left = None
        while epoch < a.max_epoch:
            start = time.time()
            if epoch % 10 == 0:
                neg_right, neg2_left = self._sample_negs()
            # scan to the next resample / eval / max boundary in one call
            n = min(10 - (epoch % 10), a.max_epoch - epoch)
            if a.eval_freq:
                n = min(n, a.eval_freq - (epoch % a.eval_freq))
            self.params, self.opt_state, losses = self._multi_fn(n)(
                self.params, self.opt_state, neg_right, neg2_left)
            losses = np.asarray(losses)
            dt = (time.time() - start) / n
            for j in range(n):
                print("epoch {}, avg. relation triple loss: {:.4f}, cost "
                      "time: {:.4f}s".format(epoch + 1 + j, losses[j], dt))
            epoch += n
            if epoch >= a.start_valid and epoch % a.eval_freq == 0:
                flag = self.valid(a.stop_metric)
                self.flag1, self.flag2, self.early_stop = early_stop(
                    self.flag1, self.flag2, flag)
                if self.early_stop or epoch >= a.max_epoch:
                    break
        self.vec_se = np.asarray(self._unpad(self._forward_se(self.params)))
        if self.attr_sp is not None:
            self.vec_ae = np.asarray(
                self._unpad(self._forward_ae(self.params)))
        print("Training ends. Total time = {:.3f} s.".format(time.time() - t0))

    # ------------------------------------------------------------------ #
    # evaluation: the combined SE/AE output is a full [e, dim] table, so
    # the base valid/test/predict paths work via this one hook
    # ------------------------------------------------------------------ #

    def _combined_embeddings(self):
        se = self._unpad(self._forward_se(self.params))
        if self.args.get("test_method", "sa") == "sa" and self.attr_sp is not None:
            ae = self._unpad(self._forward_ae(self.params))
            beta = float(self.args.beta)
            return jnp.concatenate([se * beta, ae * (1.0 - beta)], axis=1)
        return se

    def _ent_embeds_for_eval(self):
        return self._combined_embeddings()

    def _rel_embeds_for_eval(self):
        return None

    def _mapping_for_eval(self):
        return None

    def save(self):
        rd.save_embeddings(self.out_folder, self.kgs, self.vec_se, None,
                           self.vec_ae, mapping_mat=None)
        print("Embeddings saved!")
