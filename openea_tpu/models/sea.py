"""SEA: semi-supervised dual-mapping TransE (reference approaches/sea.py).

Margin-based TransE plus two learned d x d mappings M1 (KG1->KG2) and M2
(KG2->KG1) with (a) supervised mapping losses on seed links and (b)
unsupervised cycle-consistency losses e -> M1 -> M2 -> e on unlabeled
(valid+test) entities, weighted alpha_1 / alpha_2 (reference sea.py:83-98).

TPU design: the mapping epoch is a jitted scan over per-epoch permutations
of the labeled and unlabeled pair lists (the reference resamples with
random.sample per step, sea.py:137-147 — per-epoch permutation gives the
same coverage without host RNG).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from openea_tpu.data import read as rd
from openea_tpu.models.base import BasicModel
from openea_tpu.ops.initializers import l2_normalize, orthogonal_init


class SEA(BasicModel):

    def check_args(self):
        a = self.args
        assert a.loss == "margin-based"
        assert a.alignment_module == "mapping"
        assert a.neg_sampling == "uniform"
        assert a.optimizer == "Adam"
        assert a.eval_metric == "inner"
        assert a.loss_norm == "L2"
        assert a.ent_l2_norm is True
        assert a.rel_l2_norm is True
        assert a.neg_triple_num == 1

    def _define_variables(self, key: jax.Array):
        key, k1, k2 = jax.random.split(key, 3)
        super()._define_variables(key)
        self.params.pop("mapping_mat", None)
        d = self.args.dim
        self.params["mapping_mat_1"] = orthogonal_init(k1, (d, d))
        self.params["mapping_mat_2"] = orthogonal_init(k2, (d, d))

    def _mapping_for_eval(self):
        return self.params["mapping_mat_1"]

    def _prepare_training_arrays(self):
        super()._prepare_training_arrays()
        unlabeled = self.kgs.test_links + self.kgs.valid_links
        self._unlabeled = np.asarray(unlabeled, np.int32)

    def _make_mapping_epoch_fn(self):
        steps = self._steps
        links = self._links
        unlabeled = self._unlabeled
        nl = max(1, links.shape[0])
        nu = max(1, unlabeled.shape[0])
        per_l = max(1, nl // steps)
        per_u = max(1, nu // steps)
        a1 = float(self.args.alpha_1)
        a2 = float(self.args.alpha_2)
        opt = self.mapping_opt

        def epoch(params, opt_state, key):
            # numpy closure constants -> jnp inside the trace (host embed)
            links_c = jnp.asarray(links)
            unlabeled_c = jnp.asarray(unlabeled)
            kl, ku = jax.random.split(key)
            pl = jax.random.permutation(kl, nl)
            pu = jax.random.permutation(ku, nu)
            idx_l = jnp.concatenate([pl, pl])[:steps * per_l].reshape(steps, per_l)
            idx_u = jnp.concatenate([pu, pu])[:steps * per_u].reshape(steps, per_u)

            def step(carry, xs):
                params, opt_state = carry
                bl, bu = xs

                def loss_fn(p):
                    ent = p["ent_embeds"]
                    if self.args.ent_l2_norm:
                        ent = l2_normalize(ent)
                    m1, m2 = p["mapping_mat_1"], p["mapping_mat_2"]
                    lab = links_c[bl]
                    unl = unlabeled_c[bu]
                    le1, le2 = ent[lab[:, 0]], ent[lab[:, 1]]
                    ue1, ue2 = ent[unl[:, 0]], ent[unl[:, 1]]
                    # reference tf.nn.l2_normalize default axis=None ->
                    # global normalization of the mapped batch matrix
                    def gnorm(x):
                        return x * jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x), 1e-12))
                    map12 = gnorm(le1 @ m1)
                    map21 = gnorm(le2 @ m2)
                    sup = (jnp.sum(jnp.square(le2 - map12))
                           + jnp.sum(jnp.square(le1 - map21)))
                    cyc121 = gnorm((ue1 @ m1) @ m2)
                    cyc212 = gnorm((ue2 @ m2) @ m1)
                    semi = (jnp.sum(jnp.square(ue1 - cyc121))
                            + jnp.sum(jnp.square(ue2 - cyc212)))
                    return a1 * sup + a2 * semi

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), (idx_l, idx_u))
            return params, opt_state, jnp.sum(losses)

        return jax.jit(epoch, donate_argnums=(0, 1))

    def save(self):
        ent = np.asarray(self._ent_embeds_for_eval())
        rel = np.asarray(self._rel_embeds_for_eval())
        rd.save_embeddings(self.out_folder, self.kgs, ent, rel, None,
                           mapping_mat=np.asarray(self.params["mapping_mat_1"]),
                           rev_mapping_mat=np.asarray(self.params["mapping_mat_2"]))
        print("Embeddings saved!")
