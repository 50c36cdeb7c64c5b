"""AttrE: character-level attribute-value embedding (reference
approaches/attre.py).

Three objectives per epoch: (1) margin TransE over relation triples,
(2) margin loss over attribute triples e + a - comp(value chars) with
head-only corruption, (3) joint loss sum(1 - cos(SE_e, CE_e)) pulling the
two entity spaces together.  Eval embeddings are the SE table.

TPU note: the reference's n-gram compositional function
(attre.py:88-109, a tf.while_loop summing means of all prefixes) is
algebraically a FIXED linear combination of the char vectors:
    comp(v) = sum_{n=1..L} mean(v[:n]) = sum_i v_i * w_i,
    w_i = sum_{n=i+1..L} 1/n
so it compiles to one einsum against a constant weight vector — no loop,
no dynamic shapes.
"""

from __future__ import annotations

import math
import time
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from openea_tpu.eval.evaluation import early_stop
from openea_tpu.models.base import BasicModel
from openea_tpu.ops import losses as L
from openea_tpu.ops.initializers import init_embeddings, l2_normalize
from openea_tpu.ops.optim import get_optimizer
from openea_tpu.ops.sampling import proportional_batch_sizes


def formatting_attr_triples(kgs, literal_len: int):
    """Clean values, build the char vocabulary (chars with frequency share
    >= 1e-4; id 0 = padding/OOV), and re-key values to dense value ids
    with a [n_values, literal_len] char-id matrix
    (reference attre.py:19-82)."""

    def clean(triples):
        out = []
        for e, a, v in triples:
            v = str(v).split("(")[0].rstrip(" ")
            v = (v.replace(".", "").replace("(", "").replace(")", "")
                 .replace(",", "").replace("_", " ").replace("-", " ")
                 .split('"')[0])
            out.append((e, a, v))
        return out

    tr1 = clean(kgs.kg1.local_attribute_triples_list)
    tr2 = clean(kgs.kg2.local_attribute_triples_list)
    values = list({v for _, _, v in tr1 + tr2})
    ch_num = {}
    for v in values:
        for ch in v:
            ch_num[ch] = ch_num.get(ch, 0) + 1
    total = sum(ch_num.values()) or 1
    chars = [c for c, n in sorted(ch_num.items(), key=lambda x: -x[1])
             if n / total >= 0.0001]
    char_id = {c: i + 1 for i, c in enumerate(chars)}

    v2row = {}
    char_rows: List[List[int]] = []
    new1, new2 = [], []
    for src, dst in ((tr1, new1), (tr2, new2)):
        for e, a, v in src:
            if v not in v2row:
                row = [0] * literal_len
                for i in range(min(len(v), literal_len)):
                    row[i] = char_id.get(v[i], 0)
                v2row[v] = len(char_rows)
                char_rows.append(row)
            dst.append((e, a, v2row[v]))
    if not char_rows:
        char_rows = [[0] * literal_len]
    return new1, new2, np.asarray(char_rows, np.int32), len(chars) + 1


def ngram_weights(literal_len: int) -> np.ndarray:
    """w_i = sum_{n=i+1..L} 1/n (closed form of the reference's prefix-mean
    accumulation)."""
    inv = 1.0 / np.arange(1, literal_len + 1)
    return np.cumsum(inv[::-1])[::-1].astype(np.float32)


class AttrE(BasicModel):

    def check_args(self):
        a = self.args
        assert a.alignment_module == "sharing"
        assert a.loss == "margin-based"
        assert a.neg_sampling == "uniform"
        assert a.optimizer == "SGD"
        assert a.eval_metric == "inner"
        assert a.loss_norm == "L2"
        assert a.ent_l2_norm is True
        assert a.rel_l2_norm is True
        assert a.neg_triple_num == 1

    def init(self):
        (self.attr_triples1, self.attr_triples2, char_rows,
         self.char_list_size) = formatting_attr_triples(
            self.kgs, self.args.literal_len)
        super().init()
        # host numpy: closure constants of the jitted epochs embed from
        # host memory at lowering (device arrays cost a tunnel round trip)
        self._value_chars = np.asarray(char_rows)
        self._ngram_w = np.asarray(ngram_weights(self.args.literal_len))
        self.ce_opt = get_optimizer(self.args.optimizer, self.args.learning_rate)
        self.ce_opt_state = self.ce_opt.init(self.params)
        self.joint_opt = get_optimizer(self.args.optimizer, self.args.learning_rate)
        self.joint_opt_state = self.joint_opt.init(self.params)
        self._prepare_attr_arrays()
        self._ce_epoch = None
        self._joint_epoch = None

    def _define_variables(self, key: jax.Array):
        key, k1, k2, k3 = jax.random.split(key, 4)
        super()._define_variables(key)
        a = self.args
        self.params["ent_embeds_ce"] = init_embeddings(
            k1, (self.kgs.max_entities_id, a.dim), a.init, a.ent_l2_norm)
        self.params["attr_embeds"] = init_embeddings(
            k2, (self.kgs.max_attributes_id or 1, a.dim), a.init, a.attr_l2_norm)
        self.params["char_embeds"] = init_embeddings(
            k3, (self.char_list_size, a.dim), a.init, a.char_l2_norm)

    # ------------------------------------------------------------------ #
    # attribute (CE) epoch
    # ------------------------------------------------------------------ #

    def _prepare_attr_arrays(self):
        t1, t2 = self.attr_triples1, self.attr_triples2
        n1, n2 = len(t1), len(t2)
        bs = self.args.batch_size
        self._a_steps = max(1, int(math.ceil((n1 + n2) / bs))) if (n1 + n2) else 0
        if not self._a_steps:
            return
        ab1, ab2 = proportional_batch_sizes(n1, n2, bs)
        self._abs1, self._abs2 = max(1, ab1), max(1, ab2)

        def pad(x, rows):
            arr = np.zeros((rows, 3), np.int32)
            if len(x):
                arr[:len(x)] = np.asarray(x, np.int32)[:rows]
            return arr

        r1 = self._a_steps * self._abs1
        r2 = self._a_steps * self._abs2
        self._at1 = jnp.asarray(pad(t1, r1))
        self._at2 = jnp.asarray(pad(t2, r2))
        self._aw1 = jnp.asarray((np.arange(r1) < n1).astype(np.float32))
        self._aw2 = jnp.asarray((np.arange(r2) < n2).astype(np.float32))

    def _comp_values(self, params, value_ids):
        chars = params["char_embeds"]
        if self.args.char_l2_norm:
            chars = l2_normalize(chars)
        vecs = chars[jnp.asarray(self._value_chars)[value_ids]]  # [B, L, d]
        return jnp.einsum("bld,l->bd", vecs, jnp.asarray(self._ngram_w))

    def _attr_lookup(self, params, triples):
        ce = params["ent_embeds_ce"]
        at = params["attr_embeds"]
        if self.args.ent_l2_norm:
            ce = l2_normalize(ce)
        if self.args.attr_l2_norm:
            at = l2_normalize(at)
        return (ce[triples[:, 0]], at[triples[:, 1]],
                self._comp_values(params, triples[:, 2]))

    def _make_ce_epoch_fn(self):
        steps, ab1, ab2 = self._a_steps, self._abs1, self._abs2
        ents1, ents2 = self._ents1, self._ents2
        opt = self.ce_opt

        def epoch(params, opt_state, key, t1, w1, t2, w2):
            # numpy closure constants -> jnp inside the trace (host embed)
            ents1_c, ents2_c = jnp.asarray(ents1), jnp.asarray(ents2)
            k1, k2, kscan = jax.random.split(key, 3)
            p1 = jax.random.permutation(k1, t1.shape[0])
            p2 = jax.random.permutation(k2, t2.shape[0])
            t1s, w1s = t1[p1].reshape(steps, ab1, 3), w1[p1].reshape(steps, ab1)
            t2s, w2s = t2[p2].reshape(steps, ab2, 3), w2[p2].reshape(steps, ab2)
            keys = jax.random.split(kscan, steps)

            def step(carry, xs):
                params, opt_state = carry
                pos1, w1b, pos2, w2b, sk = xs
                sk1, sk2 = jax.random.split(sk)
                # attribute negatives corrupt the head entity only
                # (reference batch.py:188-200)
                nh1 = ents1_c[jax.random.randint(sk1, (pos1.shape[0],), 0,
                                                 ents1_c.shape[0])]
                nh2 = ents2_c[jax.random.randint(sk2, (pos2.shape[0],), 0,
                                                 ents2_c.shape[0])]
                neg1 = pos1.at[:, 0].set(nh1)
                neg2 = pos2.at[:, 0].set(nh2)
                pos = jnp.concatenate([pos1, pos2], axis=0)
                neg = jnp.concatenate([neg1, neg2], axis=0)
                pw = jnp.concatenate([w1b, w2b], axis=0)

                def loss_fn(p):
                    pes, pas, pvs = self._attr_lookup(p, pos)
                    nes, nas, nvs = self._attr_lookup(p, neg)
                    return L.get_loss_func(pes, pas, pvs, nes, nas, nvs,
                                           self.args, pos_w=pw, neg_w=pw)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), (t1s, w1s, t2s, w2s, keys))
            return params, opt_state, jnp.sum(losses)

        return jax.jit(epoch, donate_argnums=(0, 1))

    def launch_ce_training_1epo(self, epoch: int):
        if not self._a_steps:
            return
        start = time.time()
        if self._ce_epoch is None:
            self._ce_epoch = self._make_ce_epoch_fn()
        self.key, k = jax.random.split(self.key)
        self.params, self.ce_opt_state, loss = self._ce_epoch(
            self.params, self.ce_opt_state, k, self._at1, self._aw1,
            self._at2, self._aw2)
        n = len(self.attr_triples1) + len(self.attr_triples2)
        print("epoch {}, CE, avg. triple loss: {:.4f}, cost time: {:.4f}s"
              .format(epoch, float(loss) / max(n, 1), time.time() - start))

    # ------------------------------------------------------------------ #
    # joint SE<->CE cosine epoch
    # ------------------------------------------------------------------ #

    def _make_joint_epoch_fn(self):
        all_ents = jnp.concatenate([self._ents1, self._ents2])
        opt = self.joint_opt
        reps = max(1, int(math.ceil(all_ents.shape[0] / self.args.batch_size)))

        def epoch(params, opt_state):
            def step(carry, _):
                params, opt_state = carry

                def loss_fn(p):
                    se = p["ent_embeds"]
                    ce = p["ent_embeds_ce"]
                    if self.args.ent_l2_norm:
                        se, ce = l2_normalize(se), l2_normalize(ce)
                    cos = jnp.sum(se[all_ents] * ce[all_ents], axis=-1)
                    return jnp.sum(1.0 - cos)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            # the reference feeds the FULL entity list `steps` times per
            # epoch (attre.py:225-238)
            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), None, length=reps)
            return params, opt_state, jnp.sum(losses)

        return jax.jit(epoch, donate_argnums=(0, 1))

    def launch_joint_training_1epo(self, epoch: int):
        start = time.time()
        if self._joint_epoch is None:
            self._joint_epoch = self._make_joint_epoch_fn()
        self.params, self.joint_opt_state, loss = self._joint_epoch(
            self.params, self.joint_opt_state)
        n = self.kgs.kg1.entities_num + self.kgs.kg2.entities_num
        print("epoch {}, joint learning loss: {:.4f}, time: {:.4f}s"
              .format(epoch, float(loss) / max(n, 1), time.time() - start))

    def run(self):
        # wo_attr ablation: train only the relational TransE part
        # (reference approaches_without_attribute/attre.py:248-249
        # comments out CE and joint training)
        if not self.args.get("use_attributes", True):
            t = time.time()
            for i in range(1, self.args.max_epoch + 1):
                self.launch_triple_training_1epo(i)
                if (i >= self.args.start_valid
                        and i % self.args.eval_freq == 0):
                    flag = self.valid(self.args.stop_metric)
                    self.flag1, self.flag2, self.early_stop = early_stop(
                        self.flag1, self.flag2, flag)
                    if self.early_stop or i == self.args.max_epoch:
                        break
            print("Training ends. Total time = {:.3f} s."
                  .format(time.time() - t))
            return
        t = time.time()
        for i in range(1, self.args.max_epoch + 1):
            self.launch_triple_training_1epo(i)
            self.launch_ce_training_1epo(i)
            self.launch_joint_training_1epo(i)
            if i >= self.args.start_valid and i % self.args.eval_freq == 0:
                flag = self.valid(self.args.stop_metric)
                self.flag1, self.flag2, self.early_stop = early_stop(
                    self.flag1, self.flag2, flag)
                if self.early_stop or i == self.args.max_epoch:
                    break
        print("Training ends. Total time = {:.3f} s.".format(time.time() - t))
