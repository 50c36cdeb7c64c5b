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

                def loss_fn(p):
                    phs, prs, pts = self._lookup(p, pos)
                    return L.positive_loss(phs, prs, pts, "L2", pos_w=pos_w)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), (t1s, w1s, t2s, w2s))
            return params, opt_state, jnp.sum(losses)

        return jax.jit(epoch, donate_argnums=(0, 1))
