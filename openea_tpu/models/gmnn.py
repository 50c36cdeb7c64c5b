"""GMNN: cross-lingual KG matching network (reference approaches/gmnn.py,
a refactor of Graph-Matching-NN; ~2.6K LoC of TF1).

Pipeline (reference :1770-2600):
1. candidate generation — per source entity, the `cand_size` most similar
   KG2 entities by summed name word vectors (:1885-1961);
2. per-entity 1-hop forward subgraphs with word-token node features
   (:1834-1883, :2015-2052);
3. matching network (:1216-1545): word-embedding/LSTM node encoding ->
   gated mean-aggregator GCN over fw/bw neighbors -> cross-graph node
   matching (masked cosine relevancy max/mean + max-attentive
   multi-perspective cosine) -> second GCN over match representations ->
   max+mean graph pooling -> MLP -> binary matched/unmatched softmax;
4. test-time reranking of each source's candidate list by match
   probability -> Hits@k / MR / MRR (:2419-2520).

TPU re-design: the reference materializes per-batch python dict graphs
and feeds ~10 placeholders per step; here every entity's subgraph is
pre-padded ONCE into dense [E, N] node / [E, N, S] neighbor tensors, so
a (source, candidate) pair is just two integer ids and the whole step
(gather subgraphs -> encode -> match -> update) jits as one scan.
Candidate search is a blocked device top-k instead of an 8-process pool.
"""

from __future__ import annotations

import math
import time
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from openea_tpu.data.name_vectors import _hash_vector, _tokenize, load_word_vectors
from openea_tpu.eval.evaluation import early_stop
from openea_tpu.models.base import BasicModel
from openea_tpu.ops import bootstrapping as bs
from openea_tpu.ops.initializers import l2_normalize


def _glorot(key, shape):
    rng = math.sqrt(6.0 / (shape[0] + shape[1]))
    return jax.random.uniform(key, shape, minval=-rng, maxval=rng)


def entity_local_names(kgs) -> Dict[int, str]:
    out = {}
    for d in (kgs.kg1.entities_id_dict, kgs.kg2.entities_id_dict):
        for uri, eid in (d or {}).items():
            name = uri.split("/")[-1].lower().replace("(", "").replace(")", "")
            out[int(eid)] = name.replace("_", " ")
    return out


class GMNN(BasicModel):

    def check_args(self):
        a = self.args
        assert a.cand_size > 1

    # ------------------------------------------------------------------ #
    # preprocessing
    # ------------------------------------------------------------------ #

    def init(self):
        self.check_args()
        a = self.args
        self.key = jax.random.PRNGKey(a.seed)
        E = self.kgs.max_entities_id
        self.E = E
        self.names = entity_local_names(self.kgs)

        # word vocabulary + token matrix [E, W] (id 0 = PAD)
        W = max(1, int(a.get("word_size_max", 1)) * 4)
        self.W = W
        vocab: Dict[str, int] = {}
        tok_mat = np.zeros((E + 1, W), np.int32)      # row E = PAD node
        tok_len = np.zeros((E + 1,), np.int32)
        for e in range(E):
            toks = _tokenize(self.names.get(e, ""), W)
            for j, tk in enumerate(toks):
                if tk not in vocab:
                    vocab[tk] = len(vocab) + 1
                tok_mat[e, j] = vocab[tk]
            tok_len[e] = max(1, len(toks))
        self.vocab = vocab
        # host numpy: closure constants of jitted fns embed from host
        # memory at lowering (device arrays cost a tunnel round trip)
        self._tok_mat = tok_mat
        self._tok_len = tok_len

        # pretrained word vectors (hashed fallback)
        wd = int(a.word_embedding_dim)
        vecs = load_word_vectors(a.get("embedding_path"), wd)
        word_em = np.zeros((len(vocab) + 1, wd), np.float32)
        for wtok, wid in vocab.items():
            if vecs is not None and wtok in vecs:
                word_em[wid] = vecs[wtok][:wd]
            elif vecs is None:
                word_em[wid] = _hash_vector(wtok, wd)

        # padded 1-hop subgraphs: nodes [E+1, N] (self first, PAD = E),
        # fw/bw neighbor positions within the subgraph [E+1, N, S] (PAD = N)
        fw: Dict[int, List[int]] = {}
        bw: Dict[int, List[int]] = {}
        for h, r, t in (self.kgs.kg1.relation_triples_list
                        + self.kgs.kg2.relation_triples_list):
            fw.setdefault(h, []).append(t)
            bw.setdefault(t, []).append(h)
        N = int(a.get("subgraph_size", 12))
        S = max(1, int(a.get("sample_size_per_layer", 1)) * 4)
        self.N, self.S = N, S
        rng = np.random.RandomState(a.seed)
        nodes = np.full((E + 1, N), E, np.int64)
        fw_pos = np.full((E + 1, N, S), N, np.int64)
        bw_pos = np.full((E + 1, N, S), N, np.int64)
        for e in range(E):
            neigh = fw.get(e, [])
            if len(neigh) > N - 1:
                neigh = list(rng.choice(neigh, N - 1, replace=False))
            sub = [e] + [n for n in dict.fromkeys(neigh)][:N - 1]
            pos = {n: i for i, n in enumerate(sub)}
            nodes[e, :len(sub)] = sub
            for i, n in enumerate(sub):
                fws = [pos[t] for t in fw.get(n, []) if t in pos][:S]
                bws = [pos[h] for h in bw.get(n, []) if h in pos][:S]
                fw_pos[e, i, :len(fws)] = fws
                bw_pos[e, i, :len(bws)] = bws
        self._sub_nodes = nodes
        self._sub_fw = fw_pos
        self._sub_bw = bw_pos

        # parameters
        d = int(a.hidden_layer_dim)
        ad = int(a.aggregator_dim_first)
        mp = int(a.cosine_MP_dim)
        self.mp = mp
        self.key, *ks = jax.random.split(self.key, 16)
        p = {
            "word_em": jnp.asarray(word_em),
            "lstm_w": _glorot(ks[0], (wd + d, 4 * d)),
            "lstm_b": jnp.zeros((4 * d,)),
            # gated mean aggregator (fw/bw share per reference first_gcn)
            "agg_self_w": _glorot(ks[1], (d, ad)),
            "agg_neigh_w": _glorot(ks[2], (d, ad)),
            "agg_b": jnp.zeros((ad,)),
            "agg_gate_w": _glorot(ks[3], (2 * ad, 2 * ad)),
            "agg_gate_b": jnp.zeros((2 * ad,)),
            "mp_cosine": _glorot(ks[4], (mp, ad)),
            # second aggregation over match reps
            "agg2_self_w": _glorot(ks[5], (3 + mp, ad)),
            "agg2_neigh_w": _glorot(ks[6], (3 + mp, ad)),
            "agg2_b": jnp.zeros((ad,)),
            "w0": _glorot(ks[7], (4 * ad, 2 * ad)),
            "b0": jnp.zeros((2 * ad,)),
            "w1": _glorot(ks[8], (2 * ad, 2)),
            "b1": jnp.zeros((2,)),
        }
        self.params = p
        self.d = d
        self.ad = ad
        # OPT-IN lazy Adam for word_em (touched rows only, global-step
        # bias correction — tf.train.AdamOptimizer._apply_sparse
        # semantics, gmnn.py:1536-1540): removes ~25% of the 100K step
        # cost (the dense update streams the full 35.6 MB table 6x per
        # step x 90.5K steps/epoch — run/probe_gmnn.py).  Default OFF:
        # on the hard synthetic tier the lazy trajectory converges
        # measurably slower (H@1 19.7 -> 9.2 at 30 epochs), because
        # dense Adam's between-touch momentum keeps moving rare rows.
        # The other params keep dense Adam either way; the reference's
        # global-norm clip (1.0) spans ALL grads before either update.
        self._lazy_we = bool(a.get("lazy_word_adam", False))
        if self._lazy_we:
            self.opt = optax.adam(1e-3)
            rest = {k: v for k, v in p.items() if k != "word_em"}
            self.opt_state = (self.opt.init(rest),
                              jnp.zeros_like(p["word_em"]),
                              jnp.zeros_like(p["word_em"]),
                              jnp.zeros((), jnp.int32))
        else:
            self.opt = optax.chain(optax.clip_by_global_norm(1.0),
                                   optax.adam(1e-3))
            self.opt_state = self.opt.init(self.params)
        self._step_c = None
        self._prob_c = None

        # name vectors for candidate generation
        nv = np.zeros((E, wd), np.float32)
        for e in range(E):
            nv[e] = word_em[tok_mat[e, :]].sum(axis=0)
        self._name_vecs = nv

        # multi-chip: data-parallel matching batches — the params (word
        # table + matcher weights) are small and replicate; each scanned
        # (e1, e2, label) batch shards over 'data' with grads psum'd over
        # ICI (reference gmnn.py trains single-GPU)
        if a.get("use_mesh") and len(jax.devices()) > 1:
            from jax.sharding import Mesh
            devs = jax.devices()
            n_dev = int(a.get("mesh_devices") or 0) or len(devs)
            self.mesh = Mesh(np.asarray(devs[:n_dev]), ("data",))
            print("mesh training enabled: {} devices, mesh {} "
                  "(data-parallel matching batches)".format(
                      self.mesh.size, dict(self.mesh.shape)))

    # ------------------------------------------------------------------ #
    # candidate generation
    # ------------------------------------------------------------------ #

    def generate_candidates(self, links) -> np.ndarray:
        """[n_links, cand_size] KG2 candidate ids per source entity."""
        cand_size = int(self.args.cand_size)
        ents2 = np.asarray(self.kgs.kg2.entities_list, np.int64)
        e1 = jnp.asarray(self._name_vecs[[a for a, _ in links]])
        e2 = jnp.asarray(self._name_vecs[ents2])
        k = min(cand_size, len(ents2))
        _, idx = bs.ref_topk(l2_normalize(e1), l2_normalize(e2), k,
                             block=self.args.eval_block_size)
        return ents2[idx]

    def build_examples(self, links, cands: np.ndarray) -> np.ndarray:
        """Rows (e1, e2, label); gold first then candidates (reference
        gen_data, :1963-1992)."""
        rows = []
        for (a, b), cand_row in zip(links, cands):
            rows.append((a, b, 1))
            for c in cand_row[:int(self.args.cand_size) - 1]:
                rows.append((a, int(c), 1 if int(c) == b else 0))
        return np.asarray(rows, np.int64)

    # ------------------------------------------------------------------ #
    # network
    # ------------------------------------------------------------------ #

    def _node_reps(self, p, ent_ids):
        """ent_ids [B, N] -> node reps [B, N, d] via LSTM over name tokens."""
        toks = jnp.asarray(self._tok_mat)[ent_ids]  # [B, N, W]
        lens = jnp.asarray(self._tok_len)[ent_ids]  # [B, N]
        x = p["word_em"][toks]                      # [B, N, W, wd]
        B, N, W, wd = x.shape
        x = x.reshape(B * N, W, wd)
        d = self.d

        def cell(carry, xt):
            c, h = carry
            z = jnp.concatenate([xt, h], axis=-1) @ p["lstm_w"] + p["lstm_b"]
            i, j, f, o = jnp.split(z, 4, axis=-1)
            c = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(j)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (c, h), h

        init = (jnp.zeros((B * N, d)), jnp.zeros((B * N, d)))
        _, hs = jax.lax.scan(cell, init, jnp.swapaxes(x, 0, 1))
        hs = jnp.swapaxes(hs, 0, 1)                 # [B*N, W, d]
        last = jnp.take_along_axis(
            hs, (lens.reshape(-1, 1, 1) - 1).astype(jnp.int32), axis=1)
        return last.reshape(B, N, d)

    def _gated_agg(self, p, pre, reps, neigh_pos):
        """Gated mean aggregation (reference GatedMeanAggregator
        :690-755) within padded subgraphs; neigh_pos [B, N, S] indexes
        into reps' node axis (N = PAD)."""
        B, N, _ = reps.shape
        padded = jnp.concatenate(
            [reps, jnp.zeros((B, 1, reps.shape[2]))], axis=1)
        gathered = jnp.take_along_axis(
            padded[:, None, :, :].repeat(N, axis=1),
            neigh_pos[..., None].astype(jnp.int32), axis=2)   # [B,N,S,d]
        cnt = jnp.sum((neigh_pos < N), axis=2, keepdims=True).astype(jnp.float32)
        mean = jnp.sum(gathered, axis=2) / jnp.maximum(cnt, 1.0)
        from_self = reps @ p[pre + "_self_w"]
        from_neigh = mean @ p[pre + "_neigh_w"]
        out = from_self + from_neigh + p[pre + "_b"]
        if pre + "_gate_w" in p:
            gate = jnp.concatenate([from_self, from_neigh], axis=-1)
            gate = jax.nn.relu(gate @ p[pre + "_gate_w"] + p[pre + "_gate_b"])
            g1, g2 = jnp.split(gate, 2, axis=-1)
            return 0.5 * (g1 + g2) * jax.nn.relu(out)
        return jax.nn.relu(out)

    def _encode(self, p, ents):
        nodes = jnp.asarray(self._sub_nodes)[ents]  # [B, N]
        mask = (nodes < self.E).astype(jnp.float32)
        reps = self._node_reps(p, nodes)
        fw = self._gated_agg(p, "agg", reps, jnp.asarray(self._sub_fw)[ents])
        bw = self._gated_agg(p, "agg", reps, jnp.asarray(self._sub_bw)[ents])
        out = 0.5 * (fw + bw)
        return out * mask[..., None], mask

    def _match(self, p, rep1, mask1, rep2, mask2):
        """Graph-2-aware node representations for graph 1 (reference
        match_graph_1_with_graph_2, :249-303): cosine relevancy max/mean +
        max-attentive multi-perspective cosine."""
        n1 = l2_normalize(rep1)
        n2 = l2_normalize(rep2)
        rel = jnp.einsum("bnd,bmd->bnm", n1, n2)
        rel = rel * mask1[:, :, None] * mask2[:, None, :]
        r_max = jnp.max(rel, axis=2, keepdims=True)
        r_mean = jnp.mean(rel, axis=2, keepdims=True)
        # max-attentive graph-2 node per graph-1 node
        att_idx = jnp.argmax(rel, axis=2)
        max_att = jnp.take_along_axis(rep2, att_idx[..., None], axis=1)
        cos = jnp.sum(rep1 * max_att, axis=-1, keepdims=True)
        mpc = jnp.einsum("bnd,kd,bnd->bnk", rep1, p["mp_cosine"], max_att)
        out = jnp.concatenate([r_max, r_mean, cos, mpc], axis=2)
        return out * mask1[..., None]

    def _logits(self, p, e1, e2):
        rep1, m1 = self._encode(p, e1)
        rep2, m2 = self._encode(p, e2)
        g2_aware = self._match(p, rep1, m1, rep2, m2)
        g1_aware = self._match(p, rep2, m2, rep1, m1)
        h1 = self._gated_agg(p, "agg2", g2_aware, jnp.asarray(self._sub_fw)[e1])
        h2 = self._gated_agg(p, "agg2", g1_aware, jnp.asarray(self._sub_fw)[e2])
        h1 = h1 * m1[..., None]
        h2 = h2 * m2[..., None]

        def pool(h, m):
            mx = jnp.max(h, axis=1)
            mn = jnp.sum(h, axis=1) / jnp.maximum(
                jnp.sum(m, axis=1, keepdims=True), 1.0)
            return mx, mn

        mx1, mn1 = pool(h1, m1)
        mx2, mn2 = pool(h2, m2)
        agg = jnp.concatenate([mx1, mn1, mx2, mn2], axis=1)
        out = jnp.tanh(agg @ p["w0"] + p["b0"])
        return out @ p["w1"] + p["b1"]

    # ------------------------------------------------------------------ #
    # training / evaluation
    # ------------------------------------------------------------------ #

    def _step_core(self, params, opt_state, e1, e2, labels):
        opt = self.opt
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            shard = NamedSharding(self.mesh, P("data"))
            e1 = jax.lax.with_sharding_constraint(e1, shard)
            e2 = jax.lax.with_sharding_constraint(e2, shard)
            labels = jax.lax.with_sharding_constraint(labels, shard)

        def loss_fn(p):
            logits = self._logits(p, e1, e2)
            onehot = jax.nn.one_hot(labels, 2)
            ce = optax.softmax_cross_entropy(logits, onehot)
            return jnp.mean(ce)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        if not self._lazy_we:
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        rest_state, m_we, v_we, cnt = opt_state
        # reference clip_by_global_norm(1.0) across ALL grads
        gn = optax.global_norm(grads)
        scale = 1.0 / jnp.maximum(gn, 1.0)
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        g_we = grads.pop("word_em")
        rest_p = {k: v for k, v in params.items() if k != "word_em"}
        updates, rest_state = opt.update(grads, rest_state, rest_p)
        rest_p = optax.apply_updates(rest_p, updates)

        # lazy Adam on the touched word rows only.  Touched rows = the
        # token ids of both subgraphs' node names; duplicates are fine
        # without dedup because every occurrence of a row computes the
        # IDENTICAL new value (same gathered m/v/g), so .set writes
        # agree.
        tok_mat = jnp.asarray(self._tok_mat)
        nodes = jnp.asarray(self._sub_nodes)
        rows = jnp.concatenate([tok_mat[nodes[e1]].reshape(-1),
                                tok_mat[nodes[e2]].reshape(-1)])
        b1, b2, lr, eps = 0.9, 0.999, 1e-3, 1e-8
        cnt = cnt + 1
        t = cnt.astype(jnp.float32)
        g_rows = g_we[rows]
        m_rows = b1 * m_we[rows] + (1.0 - b1) * g_rows
        v_rows = b2 * v_we[rows] + (1.0 - b2) * jnp.square(g_rows)
        lr_t = lr * jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        new_rows = params["word_em"][rows] - lr_t * m_rows / (
            jnp.sqrt(v_rows) + eps)
        word_em = params["word_em"].at[rows].set(new_rows)
        m_we = m_we.at[rows].set(m_rows)
        v_we = v_we.at[rows].set(v_rows)
        rest_p["word_em"] = word_em
        return rest_p, (rest_state, m_we, v_we, cnt), loss

    def _make_step(self):
        return jax.jit(self._step_core, donate_argnums=(0, 1))

    def _make_epoch_fn(self):
        """One jitted lax.scan over ALL of an epoch's batches.  At the
        reference's batch_size=20 a 15K epoch is ~17,500 steps
        (train links x cand_size examples); per-call dispatch made the
        host loop the bottleneck (117 s/epoch round 2)."""

        def epoch(params, opt_state, ex):
            def body(carry, b):
                p, o = carry
                p, o, loss = self._step_core(p, o, b[:, 0], b[:, 1],
                                             b[:, 2])
                return (p, o), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), ex)
            return params, opt_state, jnp.sum(losses)

        return jax.jit(epoch, donate_argnums=(0, 1))

    def _match_probs(self, examples: np.ndarray, bsz: int) -> np.ndarray:
        if self._prob_c is None:
            self._prob_c = jax.jit(
                lambda p, e1, e2: jax.nn.softmax(self._logits(p, e1, e2))[:, 1])
        # The reference's dev_batch_size (=20) sizes GPU memory
        # (gmnn.py:2419-2520 reranks in tiny windows); on TPU each call is
        # a full dispatch and the per-example subgraph state is tiny, so
        # batch inference up to 2048 (one static shape -> one compile) and
        # DEFER the host fetch: device arrays accumulate asynchronously and
        # one concatenated transfer syncs at the end — the per-batch
        # np.asarray variant paid a ~65 ms tunnel round trip per window.
        bsz = int(getattr(self.args, "test_batch_size", 0) or max(bsz, 2048))
        n = len(examples)
        pad = (-n) % bsz
        ex = np.concatenate([examples, examples[:1].repeat(pad, axis=0)]) \
            if pad else examples
        # per-window host uploads are SMALL (16 KB) and overlap with the
        # previous window's compute — a device-resident example table
        # sliced per window was measured 3x SLOWER (61.6 -> 175 s at the
        # 100K rerank: each slice is its own dispatch over the tunnel)
        probs = []
        for s in range(0, len(ex), bsz):
            b = ex[s:s + bsz]
            probs.append(self._prob_c(
                self.params, jnp.asarray(b[:, 0]), jnp.asarray(b[:, 1])))
        return np.asarray(jnp.concatenate(probs))[:n]

    def _rank_eval(self, examples: np.ndarray, label: str):
        cand = int(self.args.cand_size)
        probs = self._match_probs(examples, int(self.args.dev_batch_size))
        golds = examples[:, 2]
        n_src = len(examples) // cand
        pr = probs[:n_src * cand].reshape(n_src, cand)
        gd = golds[:n_src * cand].reshape(n_src, cand)
        # rank of the gold candidate under stable descending argsort
        # (reference gmnn.py rerank: first gold hit in sorted order):
        # strictly-greater count + equal-valued candidates at lower index
        has_gold = gd.any(axis=1)
        gold_idx = np.argmax(gd == 1, axis=1)
        rows = np.arange(n_src)
        gp = pr[rows, gold_idx]
        rank = (pr > gp[:, None]).sum(axis=1) + \
            ((pr == gp[:, None]) &
             (np.arange(cand)[None, :] < gold_idx[:, None])).sum(axis=1)
        rank = rank[has_gold]    # gold-less sources count in the denominator
        hits = {k: int((rank < k).sum()) for k in (1, 5, 10, 50)}
        hits_pct = [round(hits[k] / n_src * 100, 3) for k in (1, 5, 10, 50)]
        mr = float((rank + 1).sum()) / n_src
        mrr = float((1.0 / (rank + 1)).sum()) / n_src
        print("{} results: hits@[1, 5, 10, 50] = {}%, mr = {:.3f}, "
              "mrr = {:.6f}".format(label, hits_pct, mr, mrr))
        return hits_pct[0], mrr

    def run(self):
        t = time.time()
        a = self.args
        train_c = self.generate_candidates(self.kgs.train_links)
        valid_c = self.generate_candidates(self.kgs.valid_links)
        test_c = self.generate_candidates(self.kgs.test_links)
        self._train_ex = self.build_examples(self.kgs.train_links, train_c)
        self._valid_ex = self.build_examples(self.kgs.valid_links, valid_c)
        self._test_ex = self.build_examples(self.kgs.test_links, test_c)
        if self._step_c is None:
            self._step_c = self._make_epoch_fn()
        bsz = int(a.batch_size)
        n_steps = max(1, len(self._train_ex) // bsz)
        # bound each device call: at 100K scale an epoch is ~85K scanned
        # steps (train links x cand_size / batch 20) and a single
        # multi-minute XLA call crashed the TPU worker over the tunnel —
        # slice the scan into <= scan_slice-step calls (the loss fetch
        # stays deferred to the last slice, so round trips stay O(1))
        slice_steps = max(1, int(a.get("scan_slice", 8192) or 8192))
        rng = np.random.RandomState(a.seed)
        # the example table uploads ONCE (43 MB at 100K; per-epoch
        # re-upload of the host-permuted copy cost ~4 s/epoch at the
        # tunnel's ~10 MB/s) — only the 7 MB permutation rides per epoch
        ex_dev = self._dev_cached("train_ex", 0,
                                  self._train_ex.astype(np.int32))
        for i in range(1, a.max_epoch + 1):
            start = time.time()
            # np.resize wraps cyclically when the example count is below
            # one batch (tiny smoke datasets), and truncates — identical
            # to [:n_steps*bsz] — otherwise
            order = np.resize(rng.permutation(len(self._train_ex)),
                              n_steps * bsz)
            ex = ex_dev[jnp.asarray(order)].reshape(n_steps, bsz, 3)
            losses = []
            for s in range(0, n_steps, slice_steps):
                self.params, self.opt_state, l = self._step_c(
                    self.params, self.opt_state, ex[s:s + slice_steps])
                losses.append(l)
            loss_sum = sum(float(l) for l in losses)
            print("epoch {}, avg. matching loss: {:.4f}, cost time: {:.4f}s"
                  .format(i, loss_sum, time.time() - start))
            if i >= a.start_valid and i % a.eval_freq == 0:
                hits1, mrr = self._rank_eval(self._valid_ex, "quick")
                flag = hits1 if a.stop_metric == "hits1" else mrr
                self.flag1, self.flag2, self.early_stop = early_stop(
                    self.flag1, self.flag2, flag)
                if self.early_stop or i == a.max_epoch:
                    break
        print("Training ends. Total time = {:.3f} s.".format(time.time() - t))

    def valid(self, stop_metric):
        hits1, mrr = self._rank_eval(self._valid_ex, "quick")
        return hits1 if stop_metric == "hits1" else mrr

    def test(self, save: bool = True):
        self._rank_eval(self._test_ex, "accurate")

    def save(self):
        print("GMNN stores no entity embedding table; nothing to save")
