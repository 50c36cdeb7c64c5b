"""Translational KGE models: TransE / TransH / TransR / TransD.

Reference: models/trans/transe.py:9-49, transh.py:1-51, transr.py:1-53,
transd.py:1-57.  All run in sharing mode (one embedding table over the
joint id space, seed-aligned entities share a row) with margin loss and
uniform neg sampling; the variants differ only in how entities are
projected before the h + r - t energy.  On TPU every projection is a
batched elementwise/matmul op fused into the jitted scan step.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from openea_tpu.models.base import BasicModel, Params
from openea_tpu.ops import losses as L
from openea_tpu.ops.initializers import init_embeddings, l2_normalize


class TransE(BasicModel):
    """Plain TransE — the BasicModel default scorer (reference transe.py)."""

    def check_args(self):
        a = self.args
        assert a.init == "normal"
        assert a.alignment_module == "sharing"
        assert a.loss == "margin-based"
        assert a.neg_sampling == "uniform"
        assert a.optimizer == "Adagrad"
        assert a.eval_metric == "inner"
        assert a.loss_norm == "L2"
        assert a.ent_l2_norm is True
        assert a.rel_l2_norm is True
        assert a.neg_triple_num == 1


class TransH(TransE):
    """Hyperplane projection e - (e.n)n per relation (reference transh.py:48-51)."""

    def _define_variables(self, key: jax.Array):
        key, k = jax.random.split(key)
        super()._define_variables(key)
        self.params["normal_vector"] = init_embeddings(
            k, (self.kgs.max_relations_id, self.args.dim), self.args.init, True)

    @staticmethod
    def _project(e: jax.Array, n: jax.Array) -> jax.Array:
        n = l2_normalize(n)
        return e - jnp.sum(e * n, axis=-1, keepdims=True) * n

    def _triple_loss(self, params, pos, neg, pos_w, neg_w, key=None):
        phs, prs, pts = self._lookup(params, pos)
        nhs, nrs, nts = self._lookup(params, neg)
        pn = l2_normalize(params["normal_vector"])[pos[:, 1]]
        nn = l2_normalize(params["normal_vector"])[neg[:, 1]]
        phs, pts = self._project(phs, pn), self._project(pts, pn)
        nhs, nts = self._project(nhs, nn), self._project(nts, nn)
        return L.margin_loss(phs, prs, pts, nhs, nrs, nts, self.args.margin,
                             self.args.loss_norm, pos_w, neg_w)


class TransR(TransE):
    """Per-relation d x d projection + row renorm (reference transr.py:20-49)."""

    def _define_variables(self, key: jax.Array):
        key, k = jax.random.split(key)
        super()._define_variables(key)
        d = self.args.dim
        self.params["rel_matrix"] = init_embeddings(
            k, (self.kgs.max_relations_id, d * d), self.args.init, False)

    def _triple_loss(self, params, pos, neg, pos_w, neg_w, key=None):
        d = self.args.dim
        phs, prs, pts = self._lookup(params, pos)
        nhs, nrs, nts = self._lookup(params, neg)
        pm = params["rel_matrix"][pos[:, 1]].reshape(-1, d, d)
        nm = params["rel_matrix"][neg[:, 1]].reshape(-1, d, d)
        # reference: matmul(M, e) with e as a column vector -> M @ e
        phs = l2_normalize(jnp.einsum("bij,bj->bi", pm, phs))
        pts = l2_normalize(jnp.einsum("bij,bj->bi", pm, pts))
        nhs = l2_normalize(jnp.einsum("bij,bj->bi", nm, nhs))
        nts = l2_normalize(jnp.einsum("bij,bj->bi", nm, nts))
        return L.get_loss_func(phs, prs, pts, nhs, nrs, nts, self.args,
                               pos_w=pos_w, neg_w=neg_w)


class TransD(TransE):
    """Dynamic mapping e + (e.t_e) t_r, renormalized (reference transd.py:56-57)."""

    def _define_variables(self, key: jax.Array):
        key, k1, k2 = jax.random.split(key, 3)
        super()._define_variables(key)
        self.params["ent_transfer"] = init_embeddings(
            k1, (self.kgs.max_entities_id, self.args.dim), self.args.init,
            self.args.ent_l2_norm)
        self.params["rel_transfer"] = init_embeddings(
            k2, (self.kgs.max_relations_id, self.args.dim), self.args.init,
            self.args.rel_l2_norm)

    @staticmethod
    def _project(e: jax.Array, te: jax.Array, tr: jax.Array) -> jax.Array:
        return l2_normalize(e + jnp.sum(e * te, axis=-1, keepdims=True) * tr)

    def _transfer_lookup(self, params, triples):
        et = params["ent_transfer"]
        rt = params["rel_transfer"]
        if self.args.ent_l2_norm:
            et = l2_normalize(et)
        if self.args.rel_l2_norm:
            rt = l2_normalize(rt)
        return et[triples[:, 0]], rt[triples[:, 1]], et[triples[:, 2]]

    def _triple_loss(self, params, pos, neg, pos_w, neg_w, key=None):
        phs, prs, pts = self._lookup(params, pos)
        nhs, nrs, nts = self._lookup(params, neg)
        pht, prt, ptt = self._transfer_lookup(params, pos)
        nht, nrt, ntt = self._transfer_lookup(params, neg)
        phs = self._project(phs, pht, prt)
        pts = self._project(pts, ptt, prt)
        nhs = self._project(nhs, nht, nrt)
        nts = self._project(nts, ntt, nrt)
        return L.get_loss_func(phs, prs, pts, nhs, nrs, nts, self.args,
                               pos_w=pos_w, neg_w=neg_w)
