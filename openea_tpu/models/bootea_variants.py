"""BootEA variants: BootEA_TransH and BootEA_RotatE
(reference approaches/bootea_transh.py, bootea_rotate.py).

Both reuse the BootEA outer loop (pseudo-label mining + alignment
objective + per-iteration neighbor regeneration) with a different triple
scorer:

* BootEA_TransH — limited loss over hyperplane-projected entities
  (bootea_transh.py:59-97); alignment objective unchanged (plain
  -log sigmoid(-||h+r-t||^2) on the raw entity table, :100-109).
* BootEA_RotatE — RotatE sigmoid-log loss (neg NOT averaged,
  bootea_rotate.py:71-79); alignment objective -sum log sigmoid(score);
  ref/neighbor embeddings are l2-normalized re+im sums; outer loop gains
  `min_iter` (no early stop before it), `start_bp` (bootstrapping delay)
  and `align_times` (alignment epochs per iteration) (:201-244).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from openea_tpu.eval.evaluation import early_stop
from openea_tpu.models.bootea import BootEA
from openea_tpu.models.semantic import RotatE
from openea_tpu.models.trans import TransH
from openea_tpu.ops import bootstrapping as bs
from openea_tpu.ops import losses as L
from openea_tpu.ops.initializers import init_embeddings, l2_normalize


class BootEA_TransH(BootEA):

    def _define_variables(self, key: jax.Array):
        key, k = jax.random.split(key)
        super()._define_variables(key)
        self.params["normal_vector"] = init_embeddings(
            k, (self.kgs.max_relations_id, self.args.dim), self.args.init, True)

    def _triple_loss(self, params, pos, neg, pos_w, neg_w, key=None):
        phs, prs, pts = self._lookup(params, pos)
        nhs, nrs, nts = self._lookup(params, neg)
        pn = l2_normalize(params["normal_vector"])[pos[:, 1]]
        nn = l2_normalize(params["normal_vector"])[neg[:, 1]]
        phs, pts = TransH._project(phs, pn), TransH._project(pts, pn)
        nhs, nts = TransH._project(nhs, nn), TransH._project(nts, nn)
        return L.limited_loss(phs, prs, pts, nhs, nrs, nts,
                              self.args.pos_margin, self.args.neg_margin,
                              self.args.loss_norm,
                              balance=self.args.neg_margin_balance,
                              pos_w=pos_w, neg_w=neg_w)


class BootEA_RotatE(RotatE, BootEA):
    """MRO: RotatE supplies the scorer/eval-table hooks, BootEA the
    bootstrapped outer loop."""

    def check_args(self):
        a = self.args
        assert a.alignment_module == "swapping"
        assert a.neg_triple_num > 0
        assert a.truncated_epsilon > 0.0
        self.embedding_range = (a.gamma + self.epsilon) / a.dim

    def _triple_loss(self, params, pos, neg, pos_w, neg_w, key=None):
        pos_s = self._scores(params, pos)
        neg_s = -self._scores(params, neg)
        # unlike plain RotatE, the negative sum is NOT averaged over
        # neg_triple_num (reference bootea_rotate.py:71-79)
        return (-jnp.sum(jax.nn.log_sigmoid(pos_s) * pos_w)
                - jnp.sum(jax.nn.log_sigmoid(neg_s) * neg_w))

    def _make_align_epoch_fn(self, steps: int, bs_: int):
        opt = self.align_opt

        def epoch(params, opt_state, triples, w):
            ts = triples.reshape(steps, bs_, 3)
            ws = w.reshape(steps, bs_)

            def step(carry, xs):
                params, opt_state = carry
                batch, wb = xs

                def loss_fn(p):
                    s = self._scores(p, batch)
                    return -jnp.sum(jax.nn.log_sigmoid(s) * wb)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), (ts, ws))
            return params, opt_state, jnp.sum(losses)

        return jax.jit(epoch, donate_argnums=(0, 1))

    def _ref_embeddings(self):
        ent = self.params["re_ent_embeds"] + self.params["im_ent_embeds"]
        e1 = l2_normalize(ent[self._ref1])
        e2 = l2_normalize(ent[self._ref2])
        return e1, e2

    def _ent_embeds_for_eval(self):
        ent = self.params["re_ent_embeds"] + self.params["im_ent_embeds"]
        # neighbors/ref sims use l2-normalized sums (bootea_rotate.py:129-140)
        return l2_normalize(ent) if self.args.ent_l2_norm else ent

    def run(self):
        t = time.time()
        sub_num = self.args.sub_epoch
        iter_nums = self.args.max_epoch // sub_num
        min_iter = int(self.args.get("min_iter", 0))
        start_bp = int(self.args.get("start_bp", 0))
        align_times = int(self.args.get("align_times", 1))
        for i in range(1, iter_nums + 1):
            print("\niteration", i)
            self.launch_training_k_epo((i - 1) * sub_num + 1, sub_num)
            if i * sub_num >= self.args.start_valid:
                flag = self.valid(self.args.stop_metric)
                self.flag1, self.flag2, self.early_stop = early_stop(
                    self.flag1, self.flag2, flag)
                if (self.early_stop and i >= min_iter) or i == iter_nums:
                    break
            if i * sub_num >= start_bp:
                print("bootstrapping")
                e1, e2 = self._ref_embeddings()
                self.labeled_align, rows, cols = bs.bootstrapping(
                    e1, e2, self.labeled_align, self.args.sim_th, self.args.k,
                    block=self.args.eval_block_size,
                    mesh=(self._eval_mesh() if self.mesh is not None
                          else None))
                if rows is not None:
                    ents1 = [self.ref_ent1[r] for r in rows]
                    ents2 = [self.ref_ent2[c] for c in cols]
                    self.train_alignment(ents1, ents2, align_times)
                if i * sub_num >= self.args.start_valid:
                    self.valid(self.args.stop_metric)
            if self.args.neg_sampling == "truncated":
                self._regenerate_neighbors()
        print("Training ends. Total time = {:.3f} s.".format(time.time() - t))
