"""Truncated-neighbor generation: blocked on-device top-k.

Replaces the reference's host-side N x N numpy matmul + argpartition over a
process pool (modules/train/batch.py:122-165).  The result stays in HBM as
an int32 [n, K] table consumed directly by the on-device negative sampler.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from openea_tpu.ops.sampling import NeighborTable


@partial(jax.jit, static_argnames=("k", "block"))
def top_k_neighbors(embeds: jax.Array, entity_ids: jax.Array, k: int,
                    block: int = 2048) -> jax.Array:
    """For each row of `embeds` (the KG's entities, in entity_ids order),
    the global ids of its k most-similar entities by inner product.
    Returns [n, k] i32 of global entity ids."""
    n = embeds.shape[0]
    nb = -(-n // block)
    pad = nb * block - n
    ep = jnp.concatenate([embeds, jnp.zeros((pad, embeds.shape[1]), embeds.dtype)]) if pad else embeds
    blocks = ep.reshape(nb, block, ep.shape[1])

    def one(rows):
        s = rows @ embeds.T
        _, idx = jax.lax.top_k(s, k)
        return entity_ids[idx]

    out = jax.lax.map(one, blocks).reshape(nb * block, k)
    return out[:n]


def build_neighbor_table(embeds, entity_ids, k: int, max_id: int,
                         block: int = 2048) -> NeighborTable:
    """Neighbor table + global-id -> row lookup for one KG."""
    entity_ids = jnp.asarray(entity_ids, jnp.int32)
    neighbors = top_k_neighbors(jnp.asarray(embeds), entity_ids, k, block)
    ent_pos = np.zeros((max_id,), dtype=np.int32)
    ent_pos[np.asarray(entity_ids)] = np.arange(entity_ids.shape[0], dtype=np.int32)
    return NeighborTable(neighbors=neighbors, ent_pos=jnp.asarray(ent_pos))
