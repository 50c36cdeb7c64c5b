"""Semantic-matching KGE models: DistMult / HolE / SimplE / RotatE.

Reference: models/semantic/{distmult,hole,simple,rotate}.py.  All sharing
mode.  TPU notes:

* HolE's circular correlation runs as rfft/irfft (real FFT halves the
  work vs the reference's complex fft, reference hole.py:48-60).
* RotatE (reference rotate.py) uses float64 tables upstream to dodge NaN
  losses from log(sigmoid(x)); we keep float32 — native on the MXU — and
  compute log-sigmoid stably with jax.nn.log_sigmoid, which removes the
  documented NaN failure mode (reference rotate.py:11-17) outright.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from openea_tpu.models.base import BasicModel, Params
from openea_tpu.ops.initializers import init_embeddings, l2_normalize


class DistMult(BasicModel):
    """h.r.t trilinear score with +-1-label softplus loss
    (reference distmult.py:43-87: pos labeled +1, uniform negs labeled -1,
    mean softplus(-label * score))."""

    def check_args(self):
        a = self.args
        assert a.alignment_module in ("sharing", "mapping")

    def _triple_loss(self, params, pos, neg, pos_w, neg_w, key=None):
        phs, prs, pts = self._lookup(params, pos)
        nhs, nrs, nts = self._lookup(params, neg)
        pos_s = jnp.sum(phs * prs * pts, axis=-1)
        neg_s = jnp.sum(nhs * nrs * nts, axis=-1)
        num = jnp.sum(pos_w) + jnp.sum(neg_w)
        tot = (jnp.sum(jax.nn.softplus(-pos_s) * pos_w)
               + jnp.sum(jax.nn.softplus(neg_s) * neg_w))
        return tot / jnp.maximum(num, 1.0)


class HolE(BasicModel):
    """Circular-correlation score -sigmoid(r . ccorr(h, t)) with margin
    loss; with neg_triple_num > 1 negatives are mean-pooled per positive
    (reference hole.py:48-84)."""

    def check_args(self):
        a = self.args
        assert a.init == "xavier"
        assert a.alignment_module == "sharing"
        assert a.neg_sampling == "uniform"
        assert a.optimizer == "Adagrad"
        assert a.eval_metric == "inner"
        assert a.loss_norm == "L2"
        assert a.ent_l2_norm is True
        assert a.rel_l2_norm is True
        assert a.margin > 0.0

    @staticmethod
    def _ccorr(a: jax.Array, b: jax.Array) -> jax.Array:
        # real(ifft(conj(fft(a)) * fft(b))) via rfft on real inputs
        n = a.shape[-1]
        return jnp.fft.irfft(jnp.conj(jnp.fft.rfft(a)) * jnp.fft.rfft(b), n=n)

    def _score(self, h, r, t):
        rm = l2_normalize(r)
        return -jax.nn.sigmoid(jnp.sum(rm * self._ccorr(h, t), axis=-1))

    def _triple_loss(self, params, pos, neg, pos_w, neg_w, key=None):
        phs, prs, pts = self._lookup(params, pos)
        nhs, nrs, nts = self._lookup(params, neg)
        pos_s = self._score(phs, prs, pts)
        neg_s = self._score(nhs, nrs, nts)
        k = max(1, int(self.args.neg_triple_num))
        if k > 1:
            # padded negs carry weight 0; renormalize the mean by real count
            neg_s = neg_s.reshape(-1, k)
            w = neg_w.reshape(-1, k)
            neg_s = jnp.sum(neg_s * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1.0)
        return jnp.sum(jax.nn.relu(self.args.margin + pos_s - neg_s) * pos_w)


class SimplE(BasicModel):
    """Dual head/tail entity tables + two relation tables; averaged
    normalized trilinear score, softplus loss (reference simple.py:39-115).
    Eval embeddings are head+tail table sums (reference :90-108)."""

    def check_args(self):
        a = self.args
        assert a.init == "xavier"
        assert a.alignment_module == "sharing"
        assert a.neg_sampling == "uniform"
        assert a.optimizer == "Adagrad"
        assert a.eval_metric == "inner"
        assert a.ent_l2_norm is True
        assert a.rel_l2_norm is True

    def _define_variables(self, key: jax.Array):
        ks = jax.random.split(key, 4)
        n_ent, n_rel, d = (self.kgs.max_entities_id, self.kgs.max_relations_id,
                           self.args.dim)
        self.params = {
            "head_ent_embeds": init_embeddings(ks[0], (n_ent, d), self.args.init,
                                               self.args.ent_l2_norm),
            "tail_ent_embeds": init_embeddings(ks[1], (n_ent, d), self.args.init,
                                               self.args.ent_l2_norm),
            "rel_embeds1": init_embeddings(ks[2], (n_rel, d), self.args.init,
                                           self.args.rel_l2_norm),
            "rel_embeds2": init_embeddings(ks[3], (n_rel, d), self.args.init,
                                           self.args.rel_l2_norm),
        }

    def _tables(self, params):
        he = params["head_ent_embeds"]
        te = params["tail_ent_embeds"]
        r1 = params["rel_embeds1"]
        r2 = params["rel_embeds2"]
        if self.args.ent_l2_norm:
            he, te = l2_normalize(he), l2_normalize(te)
        if self.args.rel_l2_norm:
            r1, r2 = l2_normalize(r1), l2_normalize(r2)
        return he, te, r1, r2

    @staticmethod
    def _calc(h, r, t):
        hr = l2_normalize(h * r)
        return jnp.sum(hr * t, axis=-1)

    def _avg_score(self, params, triples):
        he, te, r1, r2 = self._tables(params)
        s1 = self._calc(he[triples[:, 0]], r1[triples[:, 1]], te[triples[:, 2]])
        s2 = self._calc(he[triples[:, 2]], r2[triples[:, 1]], te[triples[:, 0]])
        return (s1 + s2) / 2.0

    def _triple_loss(self, params, pos, neg, pos_w, neg_w, key=None):
        pos_s = self._avg_score(params, pos)
        neg_s = self._avg_score(params, neg)
        return (jnp.sum(jax.nn.softplus(-pos_s) * pos_w)
                + jnp.sum(jax.nn.softplus(neg_s) * neg_w))

    def _ent_embeds_for_eval(self):
        he, te, _, _ = self._tables(self.params)
        return he + te

    def _rel_embeds_for_eval(self):
        _, _, r1, r2 = self._tables(self.params)
        return r1 + r2

    def save(self):
        import openea_tpu.data.read as rd
        ent = np.asarray(l2_normalize(self._ent_embeds_for_eval()))
        rel = np.asarray(self._rel_embeds_for_eval())
        rd.save_embeddings(self.out_folder, self.kgs, ent, rel, None, None)
        print("Embeddings saved!")


class RotatE(BasicModel):
    """Complex rotation score gamma - ||h o r - t||, sigmoid-log loss
    (reference rotate.py:52-119).  float32 + stable log-sigmoid instead of
    the reference's float64 NaN workaround."""

    pi = 3.14159265358979323846
    epsilon = 2.0

    def check_args(self):
        a = self.args
        assert a.init == "uniform"
        assert a.alignment_module == "sharing"
        assert a.neg_sampling == "uniform"
        assert a.optimizer == "Adam"
        assert a.eval_metric == "inner"
        assert a.gamma > 0.0
        self.embedding_range = (a.gamma + self.epsilon) / a.dim

    def _define_variables(self, key: jax.Array):
        ks = jax.random.split(key, 3)
        n_ent, n_rel, d = (self.kgs.max_entities_id, self.kgs.max_relations_id,
                           self.args.dim)
        self.params = {
            "re_ent_embeds": init_embeddings(ks[0], (n_ent, d), self.args.init,
                                             self.args.ent_l2_norm),
            "im_ent_embeds": init_embeddings(ks[1], (n_ent, d), self.args.init,
                                             self.args.ent_l2_norm),
            "rel_embeds": init_embeddings(ks[2], (n_rel, d), self.args.init,
                                          self.args.rel_l2_norm),
        }

    def _lookup_all(self, params, triples):
        re_e = params["re_ent_embeds"]
        im_e = params["im_ent_embeds"]
        rel = params["rel_embeds"]
        if self.args.ent_l2_norm:
            re_e, im_e = l2_normalize(re_e), l2_normalize(im_e)
        if self.args.rel_l2_norm:
            rel = l2_normalize(rel)
        rh, rt = re_e[triples[:, 0]], re_e[triples[:, 2]]
        ih, it = im_e[triples[:, 0]], im_e[triples[:, 2]]
        phase = rel[triples[:, 1]] / (self.embedding_range / self.pi)
        return rh, jnp.cos(phase), rt, ih, jnp.sin(phase), it

    def _scores(self, params, triples):
        rh, rr, rt, ih, ir, it = self._lookup_all(params, triples)
        re_s = rh * rr - ih * ir - rt
        im_s = rh * ir + ih * rr - it
        d = jnp.sum(jnp.sqrt(re_s * re_s + im_s * im_s), axis=-1)
        return self.args.gamma - d

    def _triple_loss(self, params, pos, neg, pos_w, neg_w, key=None):
        pos_s = self._scores(params, pos)
        neg_s = -self._scores(params, neg)
        pos_l = jnp.sum(jax.nn.log_sigmoid(pos_s) * pos_w)
        neg_l = jnp.sum(jax.nn.log_sigmoid(neg_s) * neg_w)
        return -pos_l - neg_l / max(1, int(self.args.neg_triple_num))

    def _ent_embeds_for_eval(self):
        re_e = self.params["re_ent_embeds"]
        im_e = self.params["im_ent_embeds"]
        if self.args.ent_l2_norm:
            re_e, im_e = l2_normalize(re_e), l2_normalize(im_e)
        return re_e + im_e

    def _rel_embeds_for_eval(self):
        rel = self.params["rel_embeds"]
        return l2_normalize(rel) if self.args.rel_l2_norm else rel

    def save(self):
        import openea_tpu.data.read as rd
        ent = np.asarray(l2_normalize(self._ent_embeds_for_eval()))
        rel = np.asarray(self._rel_embeds_for_eval())
        rd.save_embeddings(self.out_folder, self.kgs, ent, rel, None, None)
        print("Embeddings saved!")
