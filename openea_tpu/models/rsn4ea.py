"""RSN4EA: recurrent skipping networks over biased random walks
(reference approaches/rsn4ea.py).

Pipeline:
1. Build a joint KB: both KGs + reverse edges (relation ids offset by R) +
   every combination of seed-aligned substitutions (reference
   BasicReader, :18-126).
2. Sample length-15 entity-relation paths with cross-KG bias beta (step
   into the other KG with prob ~ beta) and depth bias alpha (avoid/prefer
   tails connected to the pre-predecessor) (reference BasicSampler,
   :129-212); paths are cached to disk like the reference.
3. Train a 2-layer LSTM (identity activations, orthogonal init,
   forget-bias 1) over the alternating e/r embedding sequence; relation
   outputs get the "skip" residual fc(rel_out) + fc(entity_input); every
   position is scored against the next token with an NCE loss over the
   relation/entity vocab, with a random half-batch weight mask
   (reference build_sub_graph, :351-448).

TPU design: the sampler's pandas `.apply` row loops become vectorized
numpy cumulative-probability draws; the whole epoch (shuffle-with-
replacement batching + LSTM + NCE + clipped Adam) is one jitted scan.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd
from scipy.sparse import csr_matrix

from openea_tpu.eval.evaluation import early_stop
from openea_tpu.models.base import BasicModel
from openea_tpu.ops.initializers import xavier_init
from openea_tpu.ops.nce import nce_loss


# ---------------------------------------------------------------------- #
# joint KB construction (reference BasicReader)
# ---------------------------------------------------------------------- #

def build_joint_kb(kgs):
    kg1 = pd.DataFrame(kgs.kg1.relation_triples_list,
                       columns=["h_id", "r_id", "t_id"])
    kg2 = pd.DataFrame(kgs.kg2.relation_triples_list,
                       columns=["h_id", "r_id", "t_id"])
    kb = pd.concat([kg1, kg2], ignore_index=True)
    rel_num = kgs.max_relations_id
    rev = kb[["t_id", "r_id", "h_id"]].values.copy()
    rev[:, 1] += rel_num
    kb = pd.concat([kb, pd.DataFrame(rev, columns=["h_id", "r_id", "t_id"])],
                   ignore_index=True)

    em = dict(kgs.train_links)
    em.update({b: a for a, b in kgs.train_links})
    sub = kb.copy()
    sub["ah_id"] = sub.h_id.map(lambda x: em.get(x, x))
    sub["at_id"] = sub.t_id.map(lambda x: em.get(x, x))
    h_mask = sub.h_id != sub.ah_id
    t_mask = sub.t_id != sub.at_id

    frames = [kb]
    combos = [
        sub[["ah_id", "r_id", "at_id"]],
        sub[h_mask][["ah_id", "r_id", "t_id"]],
        sub[t_mask][["h_id", "r_id", "at_id"]],
        sub[h_mask & t_mask][["ah_id", "r_id", "at_id"]],
    ]
    for fr in combos:
        fr = fr.copy()
        fr.columns = ["h_id", "r_id", "t_id"]
        frames.append(fr)
    kb = pd.concat(frames, ignore_index=True).drop_duplicates()
    return kb.reset_index(drop=True), 2 * rel_num


# ---------------------------------------------------------------------- #
# biased path sampling (reference BasicSampler, vectorized)
# ---------------------------------------------------------------------- #

def sample_paths(kb: pd.DataFrame, kgs, alpha: float, beta: float,
                 max_length: int, ent_num: int, repeat_times: int = 2,
                 seed: int = 0) -> np.ndarray:
    rng = np.random.RandomState(seed)
    vals = kb[["h_id", "r_id", "t_id"]].values
    rtlist = np.unique(vals[:, 1:3], axis=0)
    rt_index = {(r, t): i for i, (r, t) in enumerate(rtlist)}
    tail_of = rtlist[:, 1]

    # per-head candidate rt ids + cross-KG-biased base probabilities
    aligned = set(e for pair in kgs.train_links for e in pair)
    across = np.where(np.isin(rtlist[:, 1], list(aligned)), beta, 1.0 - beta)

    heads = vals[:, 0]
    cand_rt = np.asarray([rt_index[(r, t)] for r, t in vals[:, 1:3]])
    order = np.argsort(heads, kind="stable")
    heads_s, cand_s = heads[order], cand_rt[order]
    uniq_heads, starts = np.unique(heads_s, return_index=True)
    indptr = np.zeros(ent_num + 1, np.int64)
    counts = np.diff(np.append(starts, len(heads_s)))
    indptr[uniq_heads + 1] = counts
    indptr = np.cumsum(indptr)
    head_row = -np.ones(ent_num, np.int64)
    head_row[uniq_heads] = 1  # marker: head has outgoing candidates

    base_p = across[cand_s]

    # head x rt connectivity for the depth bias
    htail = np.unique(np.stack([heads, cand_rt], axis=1), axis=0)
    htailmat = csr_matrix((np.ones(len(htail)), (htail[:, 0], htail[:, 1])),
                          shape=(ent_num, len(rtlist)))

    # global cumulative base probabilities: one vectorized searchsorted
    # draws a base-biased candidate for EVERY walk at once (the reference
    # does a pandas .apply per row, rsn4ea.py:174-202)
    cum = np.cumsum(base_p)
    seg_lo = indptr[:-1]
    seg_hi = indptr[1:]
    cum_lo = np.where(seg_lo > 0, cum[seg_lo - 1], 0.0)
    seg_total = np.where(seg_hi > seg_lo, cum[seg_hi - 1] - cum_lo, 0.0)

    def draw_base(curr_ents):
        """Vectorized draw from the cross-KG-biased base distribution."""
        lo = seg_lo[curr_ents]
        total = seg_total[curr_ents]
        targets = cum_lo[curr_ents] + rng.rand(len(curr_ents)) * total
        idx = np.searchsorted(cum, targets, side="right")
        idx = np.minimum(idx, seg_hi[curr_ents] - 1)
        idx = np.maximum(idx, lo)
        out = cand_s[idx]
        out[total <= 0] = -1
        return out

    max_bias = max(alpha, 1.0 - alpha)

    def draw(curr_ents, pre_ents=None):
        """Depth-biased draw via vectorized rejection sampling: propose
        from the base distribution, accept with prob bias/max_bias where
        bias is (1-alpha) for candidates connected to the pre-predecessor
        and alpha otherwise (reference perform_random2)."""
        if pre_ents is None:
            return draw_base(curr_ents)
        out = -np.ones(len(curr_ents), np.int64)
        pending = np.arange(len(curr_ents))
        for _ in range(24):
            if len(pending) == 0:
                break
            ce = curr_ents[pending]
            prop = draw_base(ce)
            dead = prop < 0
            conn = np.asarray(htailmat[pre_ents[pending], prop]).ravel()
            bias = np.where(conn > 0, 1.0 - alpha, alpha)
            accept = (rng.rand(len(pending)) * max_bias <= bias) | dead
            out[pending[accept]] = prop[accept]
            pending = pending[~accept]
        if len(pending):  # stragglers: accept the base proposal
            out[pending] = draw_base(curr_ents[pending])
        return out

    hrt = np.repeat(vals, repeat_times, axis=0)
    rts = [hrt]
    prev_tail = hrt[:, 2]
    pre = None
    c_length = 3
    while c_length < max_length:
        rt = draw(prev_tail, pre)
        dead = rt < 0
        if dead.any():
            # restart dead walks on a self-transition (rare; padded rows)
            rt[dead] = 0
        step = rtlist[rt]
        rts.append(step)
        pre = prev_tail
        prev_tail = step[:, 1]
        c_length += 2

    return np.concatenate(rts, axis=1)[:, :max_length].astype(np.int32)


# ---------------------------------------------------------------------- #
# model
# ---------------------------------------------------------------------- #

def _orthogonal(key, shape):
    return jax.nn.initializers.orthogonal()(key, shape)


class RSN4EA(BasicModel):

    def check_args(self):
        a = self.args
        assert a.max_length % 2 == 1
        assert 0.0 < a.keep_prob <= 1.0

    def init(self):
        self.check_args()
        a = self.args
        self.key = jax.random.PRNGKey(a.seed)
        kb, self._rel_vocab = build_joint_kb(self.kgs)
        E = self.kgs.max_entities_id
        self.E = E
        # legacy reference-style cache file (rsn4ea.py:225-233) is still
        # honored; new entries go through the content-keyed mining cache
        # (a folder-name key can serve stale walks when the dataset or a
        # mining knob changes — the digest cannot)
        legacy = "%spaths_%.1f_%.1f.npy" % (str(a.training_data), a.alpha,
                                            a.beta)
        if os.path.exists(legacy):
            print("load existing training sequences")
            self._train_data = np.load(legacy)
        else:
            from openea_tpu.data import mining_cache as mc

            def build():
                t = time.time()
                out = sample_paths(kb, self.kgs, a.alpha, a.beta,
                                   a.max_length, E, seed=a.seed)
                print("path sampling costs {:.1f} s".format(time.time() - t))
                return {"train_data": out}

            kb_key = kb.to_numpy() if hasattr(kb, "to_numpy") \
                else np.asarray(kb)
            self._train_data = mc.cached(
                "rsn4ea_walks",
                (kb_key, float(a.alpha), float(a.beta),
                 int(a.max_length), E, int(a.seed)),
                build, args=a, names=("train_data",))["train_data"]

        h = int(a.hidden_size)
        L = int(a.num_layers)
        self.key, *ks = jax.random.split(self.key, 12)
        p: Dict[str, jax.Array] = {
            "ent_embeds": xavier_init(ks[0], (E, h)),
            "rel_embeds": xavier_init(ks[1], (self._rel_vocab, h)),
            "rel_w": xavier_init(ks[2], (self._rel_vocab, h)),
            "rel_b": jnp.zeros((self._rel_vocab,)),
            "ent_w": xavier_init(ks[3], (E, h)),
            "ent_b": jnp.zeros((E,)),
            "skip_rel_w": xavier_init(ks[4], (h, h)),
            "skip_ent_w": xavier_init(ks[5], (h, h)),
            "bn_in_gamma": jnp.ones((h,)), "bn_in_beta": jnp.zeros((h,)),
            "bn_out_gamma": jnp.ones((h,)), "bn_out_beta": jnp.zeros((h,)),
        }
        for l in range(L):
            in_dim = h
            p[f"lstm{l}_w"] = _orthogonal(ks[6 + l], (in_dim + h, 4 * h))
            p[f"lstm{l}_b"] = jnp.zeros((4 * h,))
        self.params = p
        self._num_layers = L
        self.opt = optax.chain(optax.clip_by_global_norm(2.0),
                               optax.adam(a.learning_rate))
        self.opt_state = self.opt.init(self.params)
        self._epoch_fn = None
        # multi-chip: the walk batches are plain data-parallel work
        # (reference rsn4ea.py:351-448 runs them on one GPU); the base
        # mesh setup row-shards ent/rel tables over 'model' and the
        # epoch fn below shards each LSTM batch over 'data'
        if a.get("use_mesh") and len(jax.devices()) > 1:
            self._setup_mesh()

    # -- network -------------------------------------------------------- #

    @staticmethod
    def _bn(x, gamma, beta, eps=1e-3):
        mean = jnp.mean(x, axis=0, keepdims=True)
        var = jnp.var(x, axis=0, keepdims=True)
        return gamma * (x - mean) * jax.lax.rsqrt(var + eps) + beta

    def _lstm(self, p, x_seq, key):
        """x_seq [B, T, h] -> outputs [B, T, h]; identity activations,
        forget bias 1, per-layer output dropout (keep_prob)."""
        B, T, h = x_seq.shape
        keep = float(self.args.keep_prob)
        out = x_seq
        for l in range(self._num_layers):
            w = p[f"lstm{l}_w"]
            b = p[f"lstm{l}_b"]

            def cell(carry, x):
                c, hid = carry
                z = jnp.concatenate([x, hid], axis=-1) @ w + b
                i, j, f, o = jnp.split(z, 4, axis=-1)
                c = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * j
                hid = jax.nn.sigmoid(o) * c
                return (c, hid), hid

            init = (jnp.zeros((B, h)), jnp.zeros((B, h)))
            _, ys = jax.lax.scan(cell, init, jnp.swapaxes(out, 0, 1))
            out = jnp.swapaxes(ys, 0, 1)
            if keep < 1.0:
                key, k = jax.random.split(key)
                mask = jax.random.bernoulli(k, keep, out.shape)
                out = jnp.where(mask, out / keep, 0.0)
        return out

    def _seq_loss(self, p, seq, key):
        """seq [B, max_length] alternating e r e r ... e."""
        a = self.args
        B, length = seq.shape
        h = int(a.hidden_size)
        ent_ids = seq[:, :-1:2]
        rel_ids = seq[:, 1::2]
        ent_em = p["ent_embeds"][ent_ids]        # [B, ceil, h]
        rel_em = p["rel_embeds"][rel_ids]

        # interleave + shared input BN per position
        T = length - 1
        em = jnp.zeros((B, T, h))
        em = em.at[:, 0::2].set(ent_em[:, :(T + 1) // 2])
        em = em.at[:, 1::2].set(rel_em[:, :T // 2])
        bn_em = jax.vmap(
            lambda t: self._bn(t, p["bn_in_gamma"], p["bn_in_beta"]),
            in_axes=1, out_axes=1)(em)
        ent_bn = bn_em[:, 0::2]

        key, k_lstm = jax.random.split(key)
        outputs = self._lstm(p, bn_em, k_lstm)
        rel_out = outputs[:, 1::2]
        res_rel = (rel_out @ p["skip_rel_w"]) + (ent_bn[:, :rel_out.shape[1]]
                                                 @ p["skip_ent_w"])
        outputs = outputs.at[:, 1::2].set(res_rel)
        bn_out = jax.vmap(
            lambda t: self._bn(t, p["bn_out_gamma"], p["bn_out_beta"]),
            in_axes=1, out_axes=1)(outputs)

        key, k_mask = jax.random.split(key)
        weight = jax.random.bernoulli(k_mask, 0.5, (B,)).astype(jnp.float32)
        num_rel_sampled = min(int(a.num_samples), self._rel_vocab // 3)
        num_ent_sampled = min(int(a.num_samples), self.E // 3)
        total = 0.0
        for i in range(T):
            key, k = jax.random.split(key)
            if i % 2 == 0:   # entity position predicts next relation
                total += nce_loss(k, bn_out[:, i], seq[:, i + 1], p["rel_w"],
                                  p["rel_b"], max(1, num_rel_sampled),
                                  self._rel_vocab, example_w=weight)
            else:            # relation position predicts next entity
                total += nce_loss(k, bn_out[:, i], seq[:, i + 1], p["ent_w"],
                                  p["ent_b"], max(1, num_ent_sampled),
                                  self.E, example_w=weight)
        return total / B

    # -- training ------------------------------------------------------- #

    def _make_epoch_fn(self, num_batch: int, bsz: int):
        data = np.asarray(self._train_data)
        n = data.shape[0]
        opt = self.opt

        mesh = self.mesh

        def epoch(params, opt_state, key):
            # numpy closure constant -> jnp inside the trace (host embed)
            data_c = jnp.asarray(data)
            kc, kscan = jax.random.split(key)
            choices = jax.random.randint(kc, (num_batch * bsz,), 0, n)
            batches = data_c[choices].reshape(num_batch, bsz, -1)
            if mesh is not None:
                # each scanned LSTM step splits its batch over 'data';
                # grads on the replicated LSTM/NCE params psum over ICI
                from jax.sharding import NamedSharding, PartitionSpec as P
                batches = jax.lax.with_sharding_constraint(
                    batches, NamedSharding(mesh, P(None, "data", None)))
            keys = jax.random.split(kscan, num_batch)

            def step(carry, xs):
                params, opt_state = carry
                seq, k = xs
                loss, grads = jax.value_and_grad(self._seq_loss)(params, seq, k)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), (batches, keys))
            return params, opt_state, jnp.mean(losses)

        return self._jit_epoch(epoch, n_extra=0)

    def run(self):
        t = time.time()
        a = self.args
        bsz = int(a.batch_size)
        num_batch = max(1, len(self._train_data) // bsz)
        if self._epoch_fn is None:
            self._epoch_fn = self._make_epoch_fn(num_batch, bsz)
        for i in range(1, a.max_epoch + 1):
            t_i = time.time()
            self.key, k = jax.random.split(self.key)
            self.params, self.opt_state, loss = self._epoch_fn(
                self.params, self.opt_state, k)
            print("epoch %i, avg. batch_loss: %f,  cost time: %.4f s"
                  % (i, float(loss), time.time() - t_i))
            if i >= a.start_valid and i % a.eval_freq == 0:
                flag = self.valid(a.stop_metric)
                self.flag1, self.flag2, self.early_stop = early_stop(
                    self.flag1, self.flag2, flag)
                if self.early_stop or i >= a.max_epoch:
                    break
        print("Training ends. Total time = {:.3f} s.".format(time.time() - t))

    def _ent_embeds_for_eval(self):
        # RSN evaluates on the raw entity table (reference defines its own
        # unnormalized variables, rsn4ea.py:240-247)
        return self.params["ent_embeds"]

    def _rel_embeds_for_eval(self):
        return self.params["rel_embeds"]
