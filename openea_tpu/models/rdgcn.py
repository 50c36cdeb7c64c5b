"""RDGCN: relation-aware dual-graph convolutional network (reference
approaches/rdgcn.py, refactor of the IJCAI'19 code).

Architecture (reference Layer.build, :317-338):
  X0 = trainable entity-name vectors
  dual graph: nodes = relations, dense adjacency = Jaccard of relation
      head/tail sets (:268-277); dual features = [mean head emb ; mean
      tail emb] per relation (:258-266)
  round 1: dual self-attention -> per-relation logits -> sparse primal
      attention over triple edges; X1 = X0 + alpha * H1
  round 2: dual attention (queries from new dual features, values = old
      dual state) -> sparse primal attention; X2 = X0 + beta * H2
  two diag-weighted GCN layers over the sym-normalized adjacency, each
      merged by a sigmoid highway gate
  manhattan margin loss over seed links with cityblock-NEAREST negatives
      recomputed every 10 epochs (:75-87, :482-491).

TPU design:
* dual-graph set intersections become dense incidence matmuls:
  |head_i ∩ head_j| = H H^T with H the [R, E] head incidence — MXU work
  instead of the reference's O(R^2) python set loop (run twice there);
* compute_r's per-relation head/tail means are the same incidence matmuls;
* sparse primal attention = edge-segment softmax over per-triple edges;
* hard negatives = blocked on-device cityblock arg-top-k (the reference's
  host cdist over mp is its hot loop, :75-87);
* the whole forward+loss+Adam update is one jitted step.

Name vectors come from data/name_vectors.py (pretrained .vec if present,
deterministic hashed fallback otherwise).  `use_attributes=False` (the
wo_attr ablation, reference expriment/approaches_without_attribute)
switches X0 to glorot-random init.
"""

from __future__ import annotations

import math
import time
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from openea_tpu.data import read as rd
from openea_tpu.data.name_vectors import name_vectors
from openea_tpu.eval.evaluation import early_stop
from openea_tpu.models.base import BasicModel
from openea_tpu.ops.graph import segment_softmax


def _glorot(key, shape):
    rng = math.sqrt(6.0 / (shape[0] + shape[1]))
    return jax.random.uniform(key, shape, minval=-rng, maxval=rng)


def primal_adjacency(triples, ent_num: int):
    """Sym-normalized unweighted (A+I), with the reference's exact degree
    accounting (get_mat, rdgcn.py:45-59: degrees increment on the head and
    the *relation id* — reproduced verbatim since the published numbers
    come from it)."""
    degree = np.ones(ent_num, np.float64)
    pos = {}
    for h, r, t in triples:
        if h != r:
            degree[h] += 1
            if r < ent_num:
                degree[r] += 1
        if h == t:
            continue
        pos[(h, t)] = 1.0
        pos[(t, h)] = 1.0
    for i in range(ent_num):
        pos[(i, i)] = 1.0
    keys = np.asarray(sorted(pos), np.int64)
    fir, sec = keys[:, 0], keys[:, 1]
    val = 1.0 / np.sqrt(degree[fir]) / np.sqrt(degree[sec])
    # reference emits (row=sec, col=fir); matrix is symmetric
    order = np.argsort(sec, kind="stable")
    return (sec[order].astype(np.int32), fir[order].astype(np.int32),
            val[order].astype(np.float32))


def relation_structures(triples, ent_num: int, rel_num: int):
    """Head/tail incidence [R, E] + per-triple edge arrays (h, t, r).

    The dense incidence matrices are host-side only (consumed by
    `dual_jaccard_adjacency`); on device the per-relation head/tail means
    use the sparse unique-(r, e) pairs from `incidence_pairs` — at 100K
    the dense [R, E] f32 buffers are 320 MB each and were both blowing
    the remote-compile request size and wasting MXU time on 0/1 matmuls."""
    head_inc = np.zeros((rel_num, ent_num), np.float32)
    tail_inc = np.zeros((rel_num, ent_num), np.float32)
    edges = np.asarray([[h, t, r] for h, r, t in triples], np.int64)
    for h, r, t in triples:
        head_inc[r, h] = 1.0
        tail_inc[r, t] = 1.0
    order = np.argsort(edges[:, 0], kind="stable")
    edges = edges[order]
    return head_inc, tail_inc, (edges[:, 0].astype(np.int32),
                                edges[:, 1].astype(np.int32),
                                edges[:, 2].astype(np.int32))


def incidence_pairs(inc: np.ndarray):
    """(rel_ids, ent_ids, counts[R,1]) of the nonzeros of a [R, E]
    incidence matrix, rel-sorted for segment_sum."""
    rel, ent = np.nonzero(inc)
    counts = np.maximum(inc.sum(axis=1, keepdims=True), 1.0)
    return (rel.astype(np.int32), ent.astype(np.int32),
            counts.astype(np.float32))


def dual_jaccard_adjacency(head_inc: np.ndarray, tail_inc: np.ndarray
                           ) -> np.ndarray:
    """dual_A[i,j] = J(head_i, head_j) + J(tail_i, tail_j) via incidence
    matmuls (reference get_dual_input's O(R^2) set loop, rdgcn.py:268-277)."""
    def jaccard(inc):
        inter = inc @ inc.T
        sizes = inc.sum(axis=1)
        union = sizes[:, None] + sizes[None, :] - inter
        return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)

    return (jaccard(head_inc) + jaccard(tail_inc)).astype(np.float32)


class RDGCN(BasicModel):

    def check_args(self):
        a = self.args
        assert a.neg_triple_num > 0
        assert a.alpha > 0.0 and a.beta > 0.0

    def init(self):
        self.check_args()
        a = self.args
        self.key = jax.random.PRNGKey(a.seed)
        E = self.kgs.max_entities_id
        R = self.kgs.max_relations_id
        self.E = E
        triples = (self.kgs.kg1.relation_triples_list
                   + self.kgs.kg2.relation_triples_list)

        # all graph structures stay as HOST numpy: they are closure
        # constants of the jitted step, and numpy embeds into the lowered
        # module from host memory (a device array would trigger a blocking
        # device->host read over the TPU tunnel per lowered function)
        row, col, val = primal_adjacency(triples, E)
        self._m_row = np.asarray(row)
        self._m_col = np.asarray(col)
        self._m_val = np.asarray(val)
        # TPU hot path: Pallas sorted-segment SpMM (primal adjacency
        # weights are constants, so the no-val-grad kernel is exact)
        from openea_tpu.ops.graph import build_sparse, spmm_fn
        self._spmm_fast = spmm_fn(
            build_sparse(self._m_row, self._m_col, self._m_val, E, host=True),
            precision=self.args.get("spmm_precision", "highest"))
        head_inc, tail_inc, (er, ec, ev) = relation_structures(triples, E, R)
        hr, he, hc = incidence_pairs(head_inc)
        tr, te, tc = incidence_pairs(tail_inc)
        self._R = R
        self._hr_rel, self._hr_ent = np.asarray(hr), np.asarray(he)
        self._tr_rel, self._tr_ent = np.asarray(tr), np.asarray(te)
        self._h_cnt, self._t_cnt = np.asarray(hc), np.asarray(tc)
        self._e_row = np.asarray(er)    # per-triple edges, sorted by head
        self._e_col = np.asarray(ec)
        self._e_rel = np.asarray(ev)
        self._dual_A = np.asarray(dual_jaccard_adjacency(head_inc, tail_inc))

        d = int(a.dim)
        if a.get("use_attributes", True):
            x0 = name_vectors(self.kgs, a.get("word_embed"), d,
                              training_data=str(a.training_data))
        else:
            self.key, k0 = jax.random.split(self.key)
            x0 = np.asarray(_glorot(k0, (E, d)))
        self.key, *ks = jax.random.split(self.key, 14)
        p: Dict[str, jax.Array] = {"x0": jnp.asarray(x0, jnp.float32)}
        # dual self-attention (conv1d stack, first conv bias-free)
        p["sa_w"] = _glorot(ks[0], (2 * d, d))
        p["sa_f1_w"] = _glorot(ks[1], (d, 1)); p["sa_f1_b"] = jnp.zeros((1,))
        p["sa_f2_w"] = _glorot(ks[2], (d, 1)); p["sa_f2_b"] = jnp.zeros((1,))
        # dual attention round 2
        p["da_w"] = _glorot(ks[3], (2 * d, d)); p["da_b"] = jnp.zeros((d,))
        p["da_f1_w"] = _glorot(ks[4], (d, 1)); p["da_f1_b"] = jnp.zeros((1,))
        p["da_f2_w"] = _glorot(ks[5], (d, 1)); p["da_f2_b"] = jnp.zeros((1,))
        # sparse primal attention transforms (one per round)
        p["sp1_w"] = _glorot(ks[6], (2 * d, 1)); p["sp1_b"] = jnp.zeros((1,))
        p["sp2_w"] = _glorot(ks[7], (2 * d, 1)); p["sp2_b"] = jnp.zeros((1,))
        # diag GCN layers + highway gates
        p["gcn1_w"] = jnp.ones((1, d))
        p["gcn2_w"] = jnp.ones((1, d))
        p["hw1_k"] = _glorot(ks[8], (d, d)); p["hw1_b"] = jnp.zeros((d,))
        p["hw2_k"] = _glorot(ks[9], (d, d)); p["hw2_b"] = jnp.zeros((d,))
        self.params = p
        self.opt = optax.adam(a.learning_rate)
        self.opt_state = self.opt.init(self.params)
        self._links = np.asarray(self.kgs.train_links_array, np.int32)
        self._step = None
        if a.get("use_mesh") and len(jax.devices()) > 1:
            self._setup_mesh_gnn()

    # ------------------------------------------------------------------ #
    # multi-chip: full-graph mesh training.  One nnz-balanced row
    # partition (from the primal adjacency) is shared by every entity-
    # indexed structure: the primal GCN SpMMs ride the boundary-exchange
    # all_to_all (parallel/spmm_sharded.boundary_spmm_padded), the sparse
    # primal attention uses the softmax variant with the per-triple edge
    # set partitioned by the SAME row ranges and relation ids carried as
    # edge attributes, and compute_r's per-relation head/tail means are
    # shard-local partial segment-sums + one psum.  The dense dual-graph
    # attention ([R, R]) stays replicated.  The reference trains RDGCN on
    # one pinned GPU (rdgcn.py:202-215) — this axis is new capability.
    # ------------------------------------------------------------------ #

    def _setup_mesh_gnn(self):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from openea_tpu.ops.graph import SparseAdj
        from openea_tpu.parallel.spmm_sharded import (
            pad_rows, partition_pairs_by_plan, plan_boundary_exchange)
        devs = jax.devices()
        n = int(self.args.get("mesh_devices") or 0) or len(devs)
        self.mesh = Mesh(np.asarray(devs[:n]), ("x",))
        primal = SparseAdj(self._m_row, self._m_col, self._m_val, self.E)
        self._plan = plan_boundary_exchange(primal, n)
        edges = SparseAdj(self._e_row, self._e_col,
                          np.ones(len(self._e_row), np.float32), self.E)
        self._plan_e = plan_boundary_exchange(
            edges, n, row_starts=self._plan.row_starts,
            edge_attr=self._e_rel)
        self._h_parts = partition_pairs_by_plan(self._plan, self._hr_ent,
                                                self._hr_rel)
        self._t_parts = partition_pairs_by_plan(self._plan, self._tr_ent,
                                                self._tr_rel)
        shard = NamedSharding(self.mesh, P("x", None))
        repl = NamedSharding(self.mesh, P())
        for k in self.params:
            if k == "x0":
                self.params[k] = jax.device_put(
                    pad_rows(self._plan, self.params[k]), shard)
            else:
                self.params[k] = jax.device_put(self.params[k], repl)
        self.opt_state = self.opt.init(self.params)
        self._out_map_np = np.asarray(self._plan.out_map)
        self._links = self._out_map_np[self._links].astype(np.int32)
        print("mesh training enabled: {} devices, mesh {} (boundary-"
              "exchange SpMM + sharded edge softmax, r={}/{})".format(
                  self.mesh.size, dict(self.mesh.shape), self._plan.r,
                  self._plan_e.r))

    def _unpad(self, out):
        if self.mesh is None:
            return out
        from openea_tpu.parallel.spmm_sharded import unpad_rows
        return unpad_rows(self._plan, out)

    # ------------------------------------------------------------------ #
    # forward pieces
    # ------------------------------------------------------------------ #

    def _spmm_m(self, x):
        if self.mesh is not None:
            from openea_tpu.parallel.spmm_sharded import boundary_spmm_padded
            return boundary_spmm_padded(self.mesh, self._plan, x)
        return self._spmm_fast(x)

    def _compute_r(self, x):
        if self.mesh is not None:
            from openea_tpu.parallel.spmm_sharded import sharded_segment_sum
            h_sum = sharded_segment_sum(self.mesh, self._h_parts, x, self._R)
            t_sum = sharded_segment_sum(self.mesh, self._t_parts, x, self._R)
        else:
            h_sum = jax.ops.segment_sum(x[self._hr_ent], self._hr_rel,
                                        num_segments=self._R,
                                        indices_are_sorted=True)
            t_sum = jax.ops.segment_sum(x[self._tr_ent], self._tr_rel,
                                        num_segments=self._R,
                                        indices_are_sorted=True)
        L = h_sum / self._h_cnt
        Rm = t_sum / self._t_cnt
        return jnp.concatenate([L, Rm], axis=-1)

    @staticmethod
    def _dense_att(p, pre, query_feats, values, adj):
        """GAT-style attention over the dense dual graph."""
        in_fts = query_feats @ p[pre + "_w"]
        if pre + "_b" in p:
            in_fts = in_fts + p[pre + "_b"]
        f1 = in_fts @ p[pre + "_f1_w"] + p[pre + "_f1_b"]
        f2 = in_fts @ p[pre + "_f2_w"] + p[pre + "_f2_b"]
        logits = (f1 + f2.T) * adj
        bias = -1e9 * (1.0 - (adj > 0).astype(jnp.float32))
        coefs = jax.nn.softmax(jax.nn.leaky_relu(logits, 0.2) + bias, axis=1)
        return jax.nn.relu(coefs @ values)

    def _sparse_att(self, p, pre, x, dual_state):
        rel_logit = (dual_state @ p[pre + "_w"] + p[pre + "_b"]).reshape(-1)
        if self.mesh is not None:
            from openea_tpu.parallel.spmm_sharded import (
                boundary_softmax_spmm_padded)

            def logit_fn(dst, src, v, attr, rl):
                return jax.nn.leaky_relu(rl[attr], 0.2)

            out = boundary_softmax_spmm_padded(self.mesh, self._plan_e, x,
                                               logit_fn,
                                               rep_args=(rel_logit,))
            return jax.nn.relu(out)
        evals = jax.nn.leaky_relu(rel_logit[self._e_rel], 0.2)
        soft = segment_softmax(evals, self._e_row, self.E)
        out = jax.ops.segment_sum(soft[:, None] * x[self._e_col], self._e_row,
                                  num_segments=self.E, indices_are_sorted=True)
        return jax.nn.relu(out)

    def _highway(self, p, pre, layer1, layer2):
        gate = jax.nn.sigmoid(layer1 @ p[pre + "_k"] + p[pre + "_b"])
        return gate * layer2 + (1.0 - gate) * layer1

    def _forward(self, p):
        a = self.args
        x0 = p["x0"]
        dual_x1 = self._compute_r(x0)
        dual_h1 = self._dense_att(p, "sa", dual_x1, dual_x1, self._dual_A)
        h1 = self._sparse_att(p, "sp1", x0, dual_h1)
        x1 = x0 + a.alpha * h1

        dual_x2 = self._compute_r(x1)
        dual_h2 = self._dense_att(p, "da", dual_x2, dual_h1, self._dual_A)
        h2 = self._sparse_att(p, "sp2", x1, dual_h2)
        x2 = x0 + a.beta * h2

        g1 = jax.nn.relu(self._spmm_m(x2 * p["gcn1_w"]))
        g1 = self._highway(p, "hw1", x2, g1)
        g2 = jax.nn.relu(self._spmm_m(g1 * p["gcn2_w"]))
        return self._highway(p, "hw2", g1, g2)

    # ------------------------------------------------------------------ #
    # loss / negatives
    # ------------------------------------------------------------------ #

    def _make_step(self, jit: bool = True):
        a = self.args
        k = int(a.neg_triple_num)
        links = self._links
        t = links.shape[0]
        gamma = float(a.gamma)
        opt = self.opt

        def step(params, opt_state, neg_right, neg2_left):
            def loss_fn(p):
                out = self._forward(p)
                left, right = links[:, 0], links[:, 1]
                A = jnp.sum(jnp.abs(out[left] - out[right]), axis=-1)
                D = (A + gamma)[:, None]
                B1 = jnp.sum(jnp.abs(out[jnp.repeat(left, k)] - out[neg_right]),
                             axis=-1).reshape(t, k)
                B2 = jnp.sum(jnp.abs(out[neg2_left] - out[jnp.repeat(right, k)]),
                             axis=-1).reshape(t, k)
                L1 = jax.nn.relu(D - B1)
                L2 = jax.nn.relu(D - B2)
                return (jnp.sum(L1) + jnp.sum(L2)) / (2.0 * k * t)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return jax.jit(step, donate_argnums=(0, 1)) if jit else step

    def _make_multi_step(self, n: int):
        """n full-graph epochs in ONE device call (negatives are fixed
        between remine boundaries, so the scan body is identical; the
        per-epoch dispatch + loss sync cost a tunnel round trip each)."""
        step = self._make_step(jit=False)

        def multi(params, opt_state, neg_right, neg2_left):
            def body(carry, _):
                p, o = carry
                p, o, loss = step(p, o, neg_right, neg2_left)
                return (p, o), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), None, length=n)
            return params, opt_state, losses

        return jax.jit(multi, donate_argnums=(0, 1))

    def _nearest_negatives(self, out, anchor_ids, k: int):
        """cityblock-nearest entity ids per anchor (reference get_neg),
        via the streaming blocked top-k (bounded memory at 15K+)."""
        from openea_tpu.ops.neighbors import cityblock_topk
        idx = cityblock_topk(out[anchor_ids], out, k)
        return np.asarray(idx).reshape(-1)

    # ------------------------------------------------------------------ #
    # run / eval
    # ------------------------------------------------------------------ #

    def precompile(self):
        t = time.time()
        tk = self._links.shape[0] * int(self.args.neg_triple_num)
        dummy = jnp.zeros((tk,), jnp.int32)
        n = 10
        if self.args.eval_freq:
            n = min(n, int(self.args.eval_freq))
        self._multi_cache = getattr(self, "_multi_cache", {})
        if n not in self._multi_cache:
            self._multi_cache[n] = self._make_multi_step(n)
        self._multi_cache[n].lower(self.params, self.opt_state, dummy,
                                   dummy).compile()
        print("precompile done in {:.1f} s".format(time.time() - t))

    def run(self):
        t0 = time.time()
        a = self.args
        k = int(a.neg_triple_num)
        links = np.asarray(self.kgs.train_links_array)
        self._multi_cache = getattr(self, "_multi_cache", {})
        epoch = 0
        while epoch < a.max_epoch:
            start = time.time()
            if epoch % 10 == 0:
                out = self._unpad(self._forward(self.params))
                nr = self._nearest_negatives(out, links[:, 0], k)
                nl = self._nearest_negatives(out, links[:, 1], k)
                if self.mesh is not None:
                    nr = self._out_map_np[nr]
                    nl = self._out_map_np[nl]
                neg_right = jnp.asarray(nr)
                neg2_left = jnp.asarray(nl)
            # run to the next negative-remine / eval / max boundary in one
            # jitted scan (fixed negatives between boundaries)
            n = min(10 - (epoch % 10), a.max_epoch - epoch)
            if a.eval_freq:
                n = min(n, a.eval_freq - (epoch % a.eval_freq))
            if n not in self._multi_cache:
                self._multi_cache[n] = self._make_multi_step(n)
            self.params, self.opt_state, losses = self._multi_cache[n](
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
        print("Training ends. Total time = {:.3f} s.".format(time.time() - t0))

    def _ent_embeds_for_eval(self):
        return self._unpad(self._forward(self.params))

    def _rel_embeds_for_eval(self):
        return None

    def _mapping_for_eval(self):
        return None

    def save(self):
        out = np.asarray(self._unpad(self._forward(self.params)))
        rd.save_embeddings(self.out_folder, self.kgs, out, None, None)
        print("Embeddings saved!")
