"""Sharded training step: the multi-chip version of the BasicModel step.

One jitted function per (mesh, config): limited-loss TransE step with
on-device negative sampling, entity/relation tables sharded row-wise over
'model', batch sharded over 'data'.  Used by `__graft_entry__.dryrun_multichip`
and by multi-chip training runs.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from openea_tpu.ops import losses as L
from openea_tpu.ops.optim import get_optimizer
from openea_tpu.parallel.mesh import batch_sharding, param_shardings, replicated


def make_sharded_train_step(mesh: Mesh, num_neg: int, num_entities: int,
                            pos_margin: float = 0.01, neg_margin: float = 2.0,
                            balance: float = 0.2, learning_rate: float = 0.01,
                            optimizer: str = "Adagrad"):
    """Returns (step_fn, opt) where
    step_fn(params, opt_state, key, pos_batch) -> (params, opt_state, loss).

    The batch is dp-sharded; negative corruption happens shard-locally with
    a per-shard folded key, so no host RNG or batch transfer is involved.
    """
    opt = get_optimizer(optimizer, learning_rate)

    def loss_fn(params: Dict, pos: jax.Array, neg: jax.Array) -> jax.Array:
        ph = params["ent_embeds"][pos[:, 0]]
        pr = params["rel_embeds"][pos[:, 1]]
        pt = params["ent_embeds"][pos[:, 2]]
        nh = params["ent_embeds"][neg[:, 0]]
        nr = params["rel_embeds"][neg[:, 1]]
        nt = params["ent_embeds"][neg[:, 2]]
        return L.limited_loss(ph, pr, pt, nh, nr, nt,
                              pos_margin, neg_margin, "L2", balance=balance)

    def step(params, opt_state, key, pos):
        b = pos.shape[0]
        k_coin, k_ent = jax.random.split(key)
        coin = jax.random.bernoulli(k_coin, 0.5, (b, num_neg))
        rand_e = jax.random.randint(k_ent, (b, num_neg), 0, num_entities)
        h = jnp.where(coin, rand_e, pos[:, 0:1])
        t = jnp.where(coin, pos[:, 2:3], rand_e)
        r = jnp.broadcast_to(pos[:, 1:2], (b, num_neg))
        neg = jnp.stack([h, r, t], axis=-1).reshape(b * num_neg, 3)

        loss, grads = jax.value_and_grad(loss_fn)(params, pos, neg)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step, opt


def init_sharded_state(mesh: Mesh, key: jax.Array, num_entities: int,
                       num_relations: int, dim: int, opt):
    """Create params directly with their target shardings (no host round
    trip): jit the initializer with out_shardings."""
    p_shard = {
        "ent_embeds": NamedSharding(mesh, P("model", None)),
        "rel_embeds": NamedSharding(mesh, P("model", None)),
    }

    def init(key):
        ke, kr = jax.random.split(key)
        params = {
            "ent_embeds": jax.random.normal(ke, (num_entities, dim)) * (1.0 / dim ** 0.5),
            "rel_embeds": jax.random.normal(kr, (num_relations, dim)) * (1.0 / dim ** 0.5),
        }
        return params

    params = jax.jit(init, out_shardings=p_shard)(key)
    opt_state = jax.jit(opt.init)(params)
    return params, opt_state


def compile_sharded_step(mesh: Mesh, step, params, opt_state):
    """jit the step with explicit in/out shardings for params and batch."""
    p_shard = param_shardings(mesh, params)
    o_shard = jax.tree.map(lambda _: replicated(mesh), opt_state)
    # optimizer state mirrors param sharding where shapes match
    o_shard = _opt_state_shardings(mesh, opt_state, params, p_shard)
    jitted = jax.jit(
        step,
        in_shardings=(p_shard, o_shard, replicated(mesh), batch_sharding(mesh)),
        out_shardings=(p_shard, o_shard, replicated(mesh)),
        donate_argnums=(0, 1),
    )
    return jitted


def _opt_state_shardings(mesh, opt_state, params, p_shard):
    """Optimizer accumulators mirror the params dict structure inside the
    optax state pytree, so match leaves to their parameter by PATH (the
    dict key on the leaf's path), never by shape — two same-shape tables
    must not alias each other's sharding."""

    def spec(path, leaf):
        for entry in reversed(path):
            name = getattr(entry, "key", None)
            if name in p_shard:
                if hasattr(leaf, "shape") and leaf.shape == params[name].shape:
                    return p_shard[name]
                break
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(spec, opt_state)
