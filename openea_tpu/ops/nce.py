"""Sampled NCE loss (TF `tf.nn.nce_loss` semantics, on-device).

The reference's ProjE/ConvE score a projected (h, r) vector against the
full entity vocabulary with `tf.nn.nce_loss` and `dnn_neg_nums` sampled
classes (models/neural/proje.py:62-74, conve.py:65-77).  TF's default
candidate sampler is log-uniform over class ids — a good match here
because OpenEA entity ids are frequency-sorted (modules/load/read.py:64-92),
i.e. id rank ~ popularity.

This is the standard NCE estimator: per example, a sigmoid
cross-entropy over [true logit] + [S shared sampled logits], each logit
corrected by -log(expected_count) of its class under the sampler.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def log_uniform_sample(key: jax.Array, num_sampled: int, num_classes: int
                       ) -> Tuple[jax.Array, jax.Array]:
    """Sample class ids from P(k) = log((k+2)/(k+1)) / log(N+1) via inverse
    CDF; returns (ids [S], log_prob [S])."""
    u = jax.random.uniform(key, (num_sampled,))
    ids = jnp.floor(jnp.exp(u * math.log(num_classes + 1.0)) - 1.0).astype(jnp.int32)
    ids = jnp.clip(ids, 0, num_classes - 1)
    return ids, _log_prob(ids, num_classes)


def _log_prob(ids: jax.Array, num_classes: int) -> jax.Array:
    idf = ids.astype(jnp.float32)
    return jnp.log(jnp.log1p(1.0 / (idf + 1.0)) / math.log(num_classes + 1.0))


def nce_loss(key: jax.Array, inputs: jax.Array, labels: jax.Array,
             weights: jax.Array, biases: jax.Array, num_sampled: int,
             num_classes: int, example_w: jax.Array = None) -> jax.Array:
    """sum over examples of sigmoid-CE NCE loss.

    inputs [B, d]; labels [B] i32; weights [N, d]; biases [N].
    """
    s_ids, s_logp = log_uniform_sample(key, num_sampled, num_classes)
    # expected counts under sampling-with-replacement of S draws
    true_logp = _log_prob(labels, num_classes)
    true_logits = (jnp.sum(inputs * weights[labels], axis=-1) + biases[labels]
                   - (true_logp + math.log(num_sampled)))
    sampled_logits = (inputs @ weights[s_ids].T + biases[s_ids][None, :]
                      - (s_logp + math.log(num_sampled))[None, :])
    per_ex = (jax.nn.softplus(-true_logits)
              + jnp.sum(jax.nn.softplus(sampled_logits), axis=-1))
    if example_w is not None:
        per_ex = per_ex * example_w
    return jnp.sum(per_ex)
