"""KDCoE: co-training of relational embeddings and a description encoder
(reference approaches/kdcoe.py).

Iterates (max_iter times):
1. description-encoder epochs: GRU -> Conv1D(valid, k=3, tanh) ->
   softmax attention -> GRU -> attention -> sum -> Dense(tanh) -> l2norm
   (reference :308-374), trained with the batch-contrastive
   -sum log sigmoid(indicator * D1 D2^T)/B loss (diag +1, off-diag -1/B);
2. propose new pairs whose desc similarity > desc_sim_th (greedy row
   argmax, :388-439);
3. relational epochs: margin TransE + mapping loss on seed links + the
   same mapping loss on proposed pairs scaled by new_param (:376-386);
4. propose new pairs by mapped relational similarity > sim_th;
until a round adds no new pair.

Descriptions come from attributes whose URI contains 'escription' with
entity-name fallback, tokenized to `default_desc_length` word ids
(reference _get_desc_input, :88-230); word vectors load from args.word_embed
or fall back to deterministic hashed vectors (data/name_vectors.py).

KDCoE_wo_desc is the shipped ablation (reference kdcoe_wo_desc.py):
relational + mapping co-training only.
"""

from __future__ import annotations

import math
import time
from typing import Dict, List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from openea_tpu.data.name_vectors import (_hash_vector, _tokenize,
                                          get_local_name_triples,
                                          load_word_vectors)
from openea_tpu.eval.evaluation import early_stop, test as eval_test, valid as eval_valid
from openea_tpu.models.base import BasicModel
from openea_tpu.ops import bootstrapping as bs
from openea_tpu.ops import losses as L
from openea_tpu.ops.initializers import l2_normalize
from openea_tpu.ops.matching import check_new_alignment
from openea_tpu.ops.optim import get_optimizer


def descriptions_input(kgs, word_embed_path: Optional[str], wv_dim: int,
                       length: int, training_data: str = ""):
    """(word_em [V+1, wv_dim], e_desc_ids [E, length]) — per-entity first-
    `length` description-token ids; id V = unlogged/pad."""
    id_attr = {}
    for d in ((kgs.kg1.attributes_id_dict or {}),
              (kgs.kg2.attributes_id_dict or {})):
        for a, aid in d.items():
            id_attr[aid] = a
    desc_attr_ids = {aid for aid, a in id_attr.items() if "escription" in a}

    texts: Dict[int, str] = {}
    # sorted union: 'first description wins' must be canonical, not
    # PYTHONHASHSEED set order
    for h, a, v in sorted(kgs.kg1.local_attribute_triples_set
                          | kgs.kg2.local_attribute_triples_set,
                          key=lambda t: (t[0], t[1], str(t[2]))):
        if a in desc_attr_ids and h not in texts:
            texts[h] = str(v)
    for e, _, name in get_local_name_triples(kgs, training_data):
        if e not in texts:
            texts[e] = name

    tok_lists = {e: _tokenize(t, length) for e, t in texts.items()}
    vocab: Dict[str, int] = {}
    for toks in tok_lists.values():
        for t in toks:
            if t not in vocab:
                vocab[t] = len(vocab)
    word_vecs = load_word_vectors(word_embed_path, wv_dim)
    V = len(vocab)
    word_em = np.zeros((V + 1, wv_dim), np.float32)
    for w, i in vocab.items():
        if word_vecs is not None:
            v = word_vecs.get(w)
            word_em[i] = v if v is not None else 0.0
        else:
            word_em[i] = _hash_vector(w, wv_dim)
    e_desc = np.full((kgs.max_entities_id, length), V, np.int32)
    for e, toks in tok_lists.items():
        ids = [vocab[t] for t in toks][:length]
        e_desc[e, :len(ids)] = ids
    return word_em, e_desc


def _glorot(key, shape):
    rng = math.sqrt(6.0 / (shape[0] + shape[1]))
    return jax.random.uniform(key, shape, minval=-rng, maxval=rng)


def _gru_params(key, in_dim, units):
    k1, k2 = jax.random.split(key)
    return {"kernel": _glorot(k1, (in_dim, 3 * units)),
            "recurrent": jax.nn.initializers.orthogonal()(k2, (units, 3 * units)),
            "bias": jnp.zeros((3 * units,))}


def _gru_apply(p, x_seq):
    """keras GRU (reset_after=False, tanh / hard-sigmoid), returning all
    hidden states [B, T, U]."""
    B, T, _ = x_seq.shape
    U = p["recurrent"].shape[0]

    def hard_sigmoid(x):
        return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)

    def cell(h, x):
        xz = x @ p["kernel"] + p["bias"]
        xz_z, xz_r, xz_h = jnp.split(xz, 3, axis=-1)
        rz_z, rz_r, rz_h = jnp.split(h @ p["recurrent"], 3, axis=-1)
        z = hard_sigmoid(xz_z + rz_z)
        r = hard_sigmoid(xz_r + rz_r)
        hh = jnp.tanh(xz_h + r * rz_h)
        h = z * h + (1.0 - z) * hh
        return h, h

    _, ys = jax.lax.scan(cell, jnp.zeros((B, U)), jnp.swapaxes(x_seq, 0, 1))
    return jnp.swapaxes(ys, 0, 1)


class KDCoE(BasicModel):

    def __init__(self):
        super().__init__()
        self.new_alignment: List[Tuple[int, int]] = []
        self.new_alignment_index: Set[Tuple[int, int]] = set()

    def check_args(self):
        assert self.args.alpha > 1

    def init(self):
        super().init()
        a = self.args
        self.wv_dim = int(a.wv_dim)
        self.desc_len = int(a.default_desc_length)
        word_em, e_desc = descriptions_input(
            self.kgs, a.get("word_embed"), self.wv_dim, self.desc_len,
            training_data=str(a.training_data))
        # host numpy: closure constants of the jitted desc steps embed from
        # host memory at lowering (device arrays cost a tunnel round trip)
        self._word_em = np.asarray(word_em)
        self._e_desc = np.asarray(e_desc)
        self.key, *ks = jax.random.split(self.key, 8)
        wv = self.wv_dim
        self.desc_params = {
            "gru1": _gru_params(ks[0], wv, wv),
            "gru5": _gru_params(ks[1], wv, wv),
            "conv_w": _glorot(ks[2], (3 * wv, wv)),
            "conv_b": jnp.zeros((wv,)),
            "att1_w": _glorot(ks[3], (wv, 1)), "att1_b": jnp.zeros((1,)),
            "att3_w": _glorot(ks[4], (wv, 1)), "att3_b": jnp.zeros((1,)),
            "ds3_w": _glorot(ks[5], (wv, wv)), "ds3_b": jnp.zeros((wv,)),
        }
        self.desc_opt = get_optimizer(a.optimizer, a.learning_rate)
        self.desc_opt_state = self.desc_opt.init(self.desc_params)
        self.new_map_opt = get_optimizer(a.optimizer, a.learning_rate)
        self.new_map_opt_state = self.new_map_opt.init(self.params)
        # multi-chip: rel+mapping epochs ride the base sharded path; the
        # new-pair mapping objective gets a sharded optimizer state, and
        # the desc-encoder batches shard over 'data' (desc params are a
        # tiny replicated pytree; in-batch negatives d1 @ d2^T become a
        # local encode + all_gather under GSPMD)
        self.new_map_opt_state, self._new_map_osh = self._shard_opt_state(
            self.new_map_opt_state)
        self._desc_step_c = None
        self._desc_bsz = None
        self._encode_c = None
        self._new_map_step = None

    # ------------------------------------------------------------------ #
    # description encoder
    # ------------------------------------------------------------------ #

    def _encode_desc(self, dp, em_seq):
        """em_seq [B, L, wv] -> [B, wv] l2-normalized."""
        x = _gru_apply(dp["gru1"], em_seq)
        # Conv1D valid, kernel 3, tanh
        L_ = x.shape[1]
        windows = jnp.stack([x[:, i:i + 3].reshape(x.shape[0], -1)
                             for i in range(L_ - 2)], axis=1)
        conv = jnp.tanh(windows @ dp["conv_w"] + dp["conv_b"])
        att = jax.nn.softmax(jnp.tanh(conv @ dp["att1_w"] + dp["att1_b"]),
                             axis=-2)
        x = conv * (self.desc_len * att)
        x = _gru_apply(dp["gru5"], x)
        att = jax.nn.softmax(jnp.tanh(x @ dp["att3_w"] + dp["att3_b"]), axis=-2)
        x = jnp.sum(x * att, axis=1)
        return l2_normalize(jnp.tanh(x @ dp["ds3_w"] + dp["ds3_b"]))

    def _encode_entities(self, ents) -> jax.Array:
        if self._encode_c is None:
            self._encode_c = jax.jit(
                lambda dp, ids: self._encode_desc(
                    dp, jnp.asarray(self._word_em)[
                        jnp.asarray(self._e_desc)[ids]]))
        return self._encode_c(self.desc_params, jnp.asarray(ents, jnp.int32))

    def _make_desc_step(self, bsz: int):
        neg_w = -1.0 / bsz
        indicator = np.full((bsz, bsz), neg_w, np.float32)
        np.fill_diagonal(indicator, 1.0)
        indicator = jnp.asarray(indicator)
        opt = self.desc_opt
        mesh = self.mesh

        def step(dp, opt_state, ids1, ids2):
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                ids1 = jax.lax.with_sharding_constraint(
                    ids1, NamedSharding(mesh, P("data")))
                ids2 = jax.lax.with_sharding_constraint(
                    ids2, NamedSharding(mesh, P("data")))

            def loss_fn(p):
                word_em_c = jnp.asarray(self._word_em)
                e_desc_c = jnp.asarray(self._e_desc)
                d1 = self._encode_desc(p, word_em_c[e_desc_c[ids1]])
                d2 = self._encode_desc(p, word_em_c[e_desc_c[ids2]])
                sim = (d1 @ d2.T) * indicator
                return -jnp.sum(jax.nn.log_sigmoid(sim)) / bsz

            loss, grads = jax.value_and_grad(loss_fn)(dp)
            updates, opt_state = opt.update(grads, opt_state, dp)
            dp = optax.apply_updates(dp, updates)
            return dp, opt_state, loss

        return jax.jit(step, donate_argnums=(0, 1))

    def launch_desc_1epo(self, epoch: int):
        start = time.time()
        pairs = self.kgs.train_links + list(self.new_alignment)
        arr = np.asarray(pairs, np.int32)
        bsz = min(int(self.args.desc_batch_size), len(arr))
        if self._desc_step_c is None or self._desc_bsz != bsz:
            self._desc_step_c = self._make_desc_step(bsz)
            self._desc_bsz = bsz
        num_batch = max(1, len(arr) // bsz)
        rng = np.random.RandomState(epoch)
        choices = rng.choice(len(arr), len(arr), replace=True)
        losses = []
        for i in range(num_batch):
            b = arr[choices[i * bsz:(i + 1) * bsz]]
            self.desc_params, self.desc_opt_state, loss = self._desc_step_c(
                self.desc_params, self.desc_opt_state,
                jnp.asarray(b[:, 0]), jnp.asarray(b[:, 1]))
            losses.append(loss)   # device scalar; ONE sync after the loop
        loss_sum = float(jnp.sum(jnp.stack(losses)))
        print("epoch {}, avg. desc loss: {:.4f}, cost time: {:.4f}s"
              .format(epoch, loss_sum, time.time() - start))

    # ------------------------------------------------------------------ #
    # new-pair mapping objective
    # ------------------------------------------------------------------ #

    def launch_mapping_training_1epo_new(self, epoch: int):
        if not self.new_alignment:
            return
        t = time.time()
        raw = np.asarray(list(self.new_alignment), np.int32)
        # pad to the next power of two and mask: one jit signature for all
        # epochs regardless of how many new pairs were proposed
        rows = 1 << max(0, int(np.ceil(np.log2(max(1, raw.shape[0])))))
        pairs_np = np.zeros((rows, 2), np.int32)
        pairs_np[:raw.shape[0]] = raw
        w_np = (np.arange(rows) < raw.shape[0]).astype(np.float32)

        if getattr(self, "_new_map_step", None) is None:
            opt = self.new_map_opt
            new_param = float(self.args.new_param)

            def step(params, opt_state, pairs, w):
                def loss_fn(p):
                    ent = p["ent_embeds"]
                    if self.args.ent_l2_norm:
                        ent = l2_normalize(ent)
                    e1, e2 = ent[pairs[:, 0]], ent[pairs[:, 1]]
                    return new_param * L.mapping_loss(e1, e2,
                                                      p["mapping_mat"], w)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss

            self._new_map_step = self._jit_custom(step, 2,
                                                  self._new_map_osh)

        pairs = jnp.asarray(pairs_np)
        self.params, self.new_map_opt_state, loss = self._new_map_step(
            self.params, self.new_map_opt_state, pairs, jnp.asarray(w_np))
        print("epoch {}, avg. new mapping loss: {:.4f}, cost time: {:.4f}s"
              .format(epoch, float(loss) / max(1, raw.shape[0]),
                      time.time() - t))

    # ------------------------------------------------------------------ #
    # pair proposal
    # ------------------------------------------------------------------ #

    def _propose(self, e1, e2, th: float) -> Optional[Set[Tuple[int, int]]]:
        vals, idx = bs.ref_topk(e1, e2, 1, block=self.args.eval_block_size)
        rows = np.nonzero(vals[:, 0] > th)[0]
        if len(rows) == 0:
            return None
        return {(int(r), int(idx[r, 0])) for r in rows}

    def _merge_new_pairs(self, pairs: Optional[Set[Tuple[int, int]]]) -> bool:
        if not pairs:
            return False
        check_new_alignment(pairs)
        if not self.new_alignment_index:
            self.new_alignment_index = set(pairs)
            stop = False
        elif not (pairs - self.new_alignment_index):
            return True
        else:
            self.new_alignment_index |= pairs
            stop = False
        check_new_alignment(self.new_alignment_index,
                            context="check total new alignment")
        un1 = self.kgs.valid_entities1 + self.kgs.test_entities1
        un2 = self.kgs.valid_entities2 + self.kgs.test_entities2
        self.new_alignment = [(un1[x], un2[y])
                              for x, y in self.new_alignment_index]
        return stop

    def find_new_alignment_desc(self) -> bool:
        un1 = self.kgs.valid_entities1 + self.kgs.test_entities1
        un2 = self.kgs.valid_entities2 + self.kgs.test_entities2
        d1 = self._encode_entities(un1)
        d2 = self._encode_entities(un2)
        print("find new alignment based on description embeddings:")
        return self._merge_new_pairs(self._propose(d1, d2, self.args.desc_sim_th))

    def find_new_alignment_rel(self) -> bool:
        un1 = self.kgs.valid_entities1 + self.kgs.test_entities1
        un2 = self.kgs.valid_entities2 + self.kgs.test_entities2
        ent = self._ent_embeds_for_eval()
        e1 = ent[jnp.asarray(un1, jnp.int32)] @ self.params["mapping_mat"]
        e2 = ent[jnp.asarray(un2, jnp.int32)]
        e1, e2 = l2_normalize(e1), l2_normalize(e2)
        print("find new alignment based on relational embeddings:")
        return self._merge_new_pairs(self._propose(e1, e2, self.args.sim_th))

    # ------------------------------------------------------------------ #
    # co-training loop
    # ------------------------------------------------------------------ #

    def valid_desc(self, stop_metric):
        print("valid desc")
        d1 = self._encode_entities(self.kgs.valid_entities1)
        d2 = self._encode_entities(self.kgs.valid_entities2)
        hits1, mrr = eval_valid(d1, d2, None, self.args.top_k,
                                metric=self.args.eval_metric,
                                normalize=self.args.eval_norm, csls_k=0,
                                accurate=False)
        return hits1 if stop_metric == "hits1" else mrr

    def test_desc(self):
        print("test desc")
        d1 = self._encode_entities(self.kgs.test_entities1)
        d2 = self._encode_entities(self.kgs.test_entities2)
        eval_test(d1, d2, None, self.args.top_k, metric=self.args.eval_metric,
                  normalize=self.args.eval_norm, csls_k=self.args.csls,
                  accurate=True)

    def run(self):
        t = time.time()
        a = self.args
        for it in range(1, int(a.max_iter) + 1):
            self.flag1, self.flag2, self.early_stop = -1, -1, False
            for i in range(1, a.max_epoch + 1):
                self.launch_desc_1epo(i)
                if i % a.eval_freq == 0:
                    flag = self.valid_desc(a.stop_metric)
                    self.flag1, self.flag2, self.early_stop = early_stop(
                        self.flag1, self.flag2, flag)
                    if self.early_stop or i == a.max_epoch:
                        break
            if self.find_new_alignment_desc():
                print("co-training ends")
                break
            self.flag1, self.flag2, self.early_stop = -1, -1, False
            for i in range(1, a.max_epoch + 1):
                self.launch_triple_training_1epo(i)
                self.launch_mapping_training_1epo(i)
                self.launch_mapping_training_1epo_new(i)
                if i % a.eval_freq == 0:
                    flag = self.valid(a.stop_metric)
                    self.flag1, self.flag2, self.early_stop = early_stop(
                        self.flag1, self.flag2, flag)
                    if self.early_stop or i == a.max_epoch:
                        break
            if self.find_new_alignment_rel():
                print("co-training ends")
                break
        print("Training ends. Total time = {:.3f} s.".format(time.time() - t))


class KDCoE_wo_desc(KDCoE):
    """Ablation: relational + mapping co-training only (reference
    approaches/kdcoe_wo_desc.py)."""

    def init(self):
        BasicModel.init(self)
        a = self.args
        self.new_map_opt = get_optimizer(a.optimizer, a.learning_rate)
        self.new_map_opt_state = self.new_map_opt.init(self.params)
        self.new_map_opt_state, self._new_map_osh = self._shard_opt_state(
            self.new_map_opt_state)

    def run(self):
        t = time.time()
        a = self.args
        for it in range(1, int(a.max_iter) + 1):
            self.flag1, self.flag2, self.early_stop = -1, -1, False
            for i in range(1, a.max_epoch + 1):
                self.launch_triple_training_1epo(i)
                self.launch_mapping_training_1epo(i)
                self.launch_mapping_training_1epo_new(i)
                if i % a.eval_freq == 0:
                    flag = self.valid(a.stop_metric)
                    self.flag1, self.flag2, self.early_stop = early_stop(
                        self.flag1, self.flag2, flag)
                    if self.early_stop or i == a.max_epoch:
                        break
            if self.find_new_alignment_rel():
                print("co-training ends")
                break
        print("Training ends. Total time = {:.3f} s.".format(time.time() - t))
