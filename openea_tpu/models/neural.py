"""Neural KGE models: ProjE / ConvE (reference models/neural/{proje,conve}.py).

Both score a projected (h, r) vector against the entity vocabulary with a
sampled NCE loss over `dnn_neg_nums` log-uniform candidates, trained on
positive-only batches.

Batch-norm parity notes (faithful to what the reference graphs actually
compute, not to what their names suggest):
* ProjE's `tf.contrib.layers.batch_norm` defaults to is_training=True,
  center=True, scale=False -> batch-statistics normalization + learned
  shift.  We do the same with explicit batch moments.
* ConvE's `tf.layers.batch_normalization` defaults to training=False and
  its moving statistics are never updated (no update-op run), so each BN
  is effectively the affine map gamma*x/sqrt(1+eps) + beta.  We implement
  exactly that affine map.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from openea_tpu.models.base import BasicModel
from openea_tpu.ops.initializers import init_embeddings, xavier_init
from openea_tpu.ops.nce import nce_loss


def _batch_norm(x: jax.Array, beta: jax.Array, eps: float = 1e-3) -> jax.Array:
    """Training-mode BN, center only (contrib.layers.batch_norm defaults)."""
    mean = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.var(x, axis=0, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) + beta


def dim_factorization(d: int):
    """Most-square (x, y) with x*y == d (reference conve.py:10-18)."""
    half = int(math.sqrt(d)) + 1
    while d % half > 0:
        half -= 1
    return half, d // half


class ProjE(BasicModel):
    """BN(h)*w + BN(r)*w + b -> BN -> NCE against entity output table
    (reference proje.py:36-74; both input branches share one diag weight)."""

    def check_args(self):
        a = self.args
        assert a.init == "xavier"
        assert a.alignment_module == "sharing"
        assert a.optimizer == "Adam"
        assert a.eval_metric == "inner"
        assert a.ent_l2_norm is True
        assert a.rel_l2_norm is True
        assert a.dnn_neg_nums > 1

    def _define_variables(self, key: jax.Array):
        ks = jax.random.split(key, 4)
        super()._define_variables(ks[0])
        d = self.args.dim
        n_ent = self.kgs.max_entities_id
        self.params.update({
            "entity_w": init_embeddings(ks[1], (n_ent, d), "xavier", False),
            "entity_b": jnp.zeros((n_ent,), jnp.float32),
            "mlp_w": xavier_init(ks[2], (1, d)).reshape(d),
            "mlp_bias": jnp.zeros((d,), jnp.float32),
            "bn_beta_h": jnp.zeros((d,), jnp.float32),
            "bn_beta_out": jnp.zeros((d,), jnp.float32),
        })

    def _projected(self, params, pos, key):
        phs = params["ent_embeds"][pos[:, 0]]
        prs = params["rel_embeds"][pos[:, 1]]
        if self.args.ent_l2_norm:
            from openea_tpu.ops.initializers import l2_normalize
            phs = l2_normalize(phs)
        if self.args.rel_l2_norm:
            from openea_tpu.ops.initializers import l2_normalize
            prs = l2_normalize(prs)
        # shared 'bn' scope in the reference -> one beta for both branches
        bn_h = _batch_norm(phs, params["bn_beta_h"])
        bn_r = _batch_norm(prs, params["bn_beta_h"])
        out = bn_h * params["mlp_w"] + bn_r * params["mlp_w"] + params["mlp_bias"]
        return _batch_norm(out, params["bn_beta_out"])

    def _triple_loss(self, params, pos, neg, pos_w, neg_w, key=None):
        # positive-only objective; the sampled negatives come from NCE
        inputs = self._projected(params, pos, key)
        return nce_loss(key, inputs, pos[:, 2], params["entity_w"],
                        params["entity_b"], int(self.args.dnn_neg_nums),
                        self.kgs.max_entities_id, example_w=pos_w)


class ConvE(ProjE):
    """Stack h, r as 2-D maps, conv + FC, NCE loss (reference conve.py:42-79)."""

    kernel_size = (3, 3)

    def check_args(self):
        super().check_args()
        assert 0.0 < self.args.output_keep_prob <= 1.0

    def _define_variables(self, key: jax.Array):
        ks = jax.random.split(key, 4)
        super()._define_variables(ks[0])
        d = self.args.dim
        f = int(self.args.filter_num)
        kh, kw = self.kernel_size
        fan_in = kh * kw
        fan_out = kh * kw * f
        std = math.sqrt(2.0 / (fan_in + fan_out))
        self.params.update({
            "conv_kernel": jax.random.truncated_normal(
                ks[1], -2.0, 2.0, (f, 1, kh, kw)) * std,
            "conv_bias": jnp.zeros((f,), jnp.float32),
            "fc_w": xavier_init(ks[2], (f * 2 * d, d)),
            "fc_b": jnp.zeros((d,), jnp.float32),
            # tf.layers BN with frozen unit statistics -> affine gamma/beta
            "bn_gamma_in": jnp.ones((1,), jnp.float32),
            "bn_beta_in": jnp.zeros((1,), jnp.float32),
            "bn_gamma_c": jnp.ones((int(self.args.filter_num),), jnp.float32),
            "bn_beta_c": jnp.zeros((int(self.args.filter_num),), jnp.float32),
            "bn_gamma_fc": jnp.ones((d,), jnp.float32),
            "bn_beta_fc": jnp.zeros((d,), jnp.float32),
        })

    @staticmethod
    def _frozen_bn(x, gamma, beta, axis):
        shape = [1] * x.ndim
        shape[axis] = -1
        g = gamma.reshape(shape)
        b = beta.reshape(shape)
        return g * x * (1.0 / math.sqrt(1.0 + 1e-3)) + b

    def _projected(self, params, pos, key):
        from openea_tpu.ops.initializers import l2_normalize
        d = self.args.dim
        x, y = dim_factorization(d)
        f = int(self.args.filter_num)
        phs = params["ent_embeds"][pos[:, 0]]
        prs = params["rel_embeds"][pos[:, 1]]
        if self.args.ent_l2_norm:
            phs = l2_normalize(phs)
        if self.args.rel_l2_norm:
            prs = l2_normalize(prs)
        h_map = phs.reshape(-1, 1, x, y)
        r_map = prs.reshape(-1, 1, x, y)
        stacked = jnp.concatenate([h_map, r_map], axis=2)       # [B,1,2x,y]
        stacked = self._frozen_bn(stacked, params["bn_gamma_in"],
                                  params["bn_beta_in"], axis=1)
        keep = float(self.args.output_keep_prob)
        k1, k2 = jax.random.split(key)
        if keep < 1.0:
            mask = jax.random.bernoulli(k1, keep, stacked.shape)
            stacked = jnp.where(mask, stacked / keep, 0.0)
        out = jax.lax.conv_general_dilated(
            stacked, params["conv_kernel"], window_strides=(1, 1),
            padding="SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"))
        out = out + params["conv_bias"].reshape(1, f, 1, 1)
        out = self._frozen_bn(out, params["bn_gamma_c"], params["bn_beta_c"], axis=1)
        out = jax.nn.relu(out)
        if keep < 1.0:
            mask = jax.random.bernoulli(k2, keep, out.shape)
            out = jnp.where(mask, out / keep, 0.0)
        out = out.reshape(-1, f * 2 * d)
        out = jax.nn.relu(out @ params["fc_w"] + params["fc_b"])
        return self._frozen_bn(out, params["bn_gamma_fc"], params["bn_beta_fc"],
                               axis=1)
