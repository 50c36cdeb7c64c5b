"""MTransE: per-KG TransE positive loss + alternating orthogonal-mapping
epochs (reference approaches/mtranse.py:22-112).

TPU design: the triple epoch is a positive-only scan (no negatives are
sampled at all — the reference's MTransE feeds no negative placeholders);
the mapping epoch is a second scan over seed-link batches updating both the
d×d transform and the entity table.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from openea_tpu.models.base import BasicModel
from openea_tpu.ops import losses as L
from openea_tpu.ops.initializers import l2_normalize


class MTransE(BasicModel):

    def check_args(self):
        a = self.args
        assert a.init == "unit"
        assert a.alignment_module == "mapping"
        assert a.optimizer == "Adagrad"
        assert a.eval_metric == "inner"
        assert a.ent_l2_norm is True
        assert a.alpha > 1

    def _make_epoch_fn(self, use_tables: bool):
        steps, bs1, bs2 = self._steps, self._bs1, self._bs2
        opt = self.opt
        lr = float(self.args.learning_rate)
        ent_norm, rel_norm = self.args.ent_l2_norm, self.args.rel_l2_norm
        sparse = self._sparse_updates_ok()

        def sparse_step(params, opt_state, pos, pos_w):
            """Row-gradient step + touched-row Adagrad (ops/optim.py):
            identical math to the dense optax step at O(batch*d) traffic."""
            from openea_tpu.ops.optim import (sparse_adagrad_apply,
                                              rss_state, replace_rss)
            b = pos.shape[0]
            ent_idx = jnp.concatenate([pos[:, 0], pos[:, 2]])
            rel_idx = pos[:, 1]
            ent_rows = params["ent_embeds"][ent_idx]
            rel_rows = params["rel_embeds"][rel_idx]

            def loss_fn(er, rr):
                h, t = er[:b], er[b:]
                if ent_norm:
                    h, t = l2_normalize(h), l2_normalize(t)
                r = l2_normalize(rr) if rel_norm else rr
                return L.positive_loss(h, r, t, "L2", pos_w=pos_w)

            loss, (ge, gr) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                ent_rows, rel_rows)
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
            k1, k2 = jax.random.split(key)
            p1 = jax.random.permutation(k1, t1.shape[0])
            p2 = jax.random.permutation(k2, t2.shape[0])
            t1s, w1s = t1[p1].reshape(steps, bs1, 3), w1[p1].reshape(steps, bs1)
            t2s, w2s = t2[p2].reshape(steps, bs2, 3), w2[p2].reshape(steps, bs2)

            def step(carry, xs):
                params, opt_state = carry
                pos1, w1b, pos2, w2b = xs
                pos = jnp.concatenate([pos1, pos2], axis=0)
                pos_w = jnp.concatenate([w1b, w2b], axis=0)

                if sparse:
                    params, opt_state, loss = sparse_step(params, opt_state,
                                                          pos, pos_w)
                    return (params, opt_state), loss

                def loss_fn(p):
                    # ONE entity gather (h and t concatenated): the
                    # backward then issues one scatter-add into the table
                    # instead of two + a dense [N, d] add_any (profiled at
                    # 25% of the step time)
                    b = pos.shape[0]
                    er = p["ent_embeds"][
                        jnp.concatenate([pos[:, 0], pos[:, 2]])]
                    rr = p["rel_embeds"][pos[:, 1]]
                    if self.args.ent_l2_norm:
                        er = l2_normalize(er)
                    if self.args.rel_l2_norm:
                        rr = l2_normalize(rr)
                    return L.positive_loss(er[:b], rr, er[b:], "L2",
                                           pos_w=pos_w)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), (t1s, w1s, t2s, w2s))
            return params, opt_state, jnp.sum(losses)

        return jax.jit(epoch, donate_argnums=(0, 1))
