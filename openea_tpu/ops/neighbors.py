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


@partial(jax.jit, static_argnames=("k", "row_block", "col_block"))
def cityblock_topk(anchors: jax.Array, table: jax.Array, k: int,
                   row_block: int = 256, col_block: int = 512) -> jax.Array:
    """Indices of each anchor's k cityblock-NEAREST table rows, streamed
    over column blocks with a running top-k merge — memory stays at
    O(row_block * col_block * d) instead of O(rows * n * d) (the RDGCN
    hard-negative miner, reference rdgcn.py:75-87, is a full host cdist)."""
    n_a, d = anchors.shape
    n_t = table.shape[0]
    rb = -(-n_a // row_block) * row_block
    cbn = -(-n_t // col_block)
    cb_total = cbn * col_block
    # pad table with far-away rows so padded columns never enter the top-k
    tpad = jnp.full((cb_total - n_t, d), 1e18, table.dtype)
    tab = jnp.concatenate([table, tpad]) if cb_total > n_t else table
    apad = jnp.zeros((rb - n_a, d), anchors.dtype)
    anc = jnp.concatenate([anchors, apad]) if rb > n_a else anchors

    def rows(block_rows):
        def step(carry, cb):
            vals, idx = carry
            cols = jax.lax.dynamic_slice(tab, (cb * col_block, 0),
                                         (col_block, d))
            dist = jnp.sum(jnp.abs(block_rows[:, None, :] - cols[None, :, :]),
                           axis=-1)
            cb_ids = cb * col_block + jnp.arange(col_block, dtype=jnp.int32)
            allv = jnp.concatenate([vals, -dist], axis=1)
            alli = jnp.concatenate(
                [idx, jnp.broadcast_to(cb_ids, dist.shape)], axis=1)
            v2, pos = jax.lax.top_k(allv, k)
            return (v2, jnp.take_along_axis(alli, pos, axis=1)), None

        init = (jnp.full((block_rows.shape[0], k), -3.4e38),
                jnp.zeros((block_rows.shape[0], k), jnp.int32))
        (vals, idx), _ = jax.lax.scan(step, init,
                                      jnp.arange(cbn, dtype=jnp.int32))
        return idx

    out = jax.lax.map(rows, anc.reshape(rb // row_block, row_block, d))
    return out.reshape(rb, k)[:n_a]


def build_neighbor_table(embeds, entity_ids, k: int, max_id: int,
                         block: int = 2048) -> NeighborTable:
    """Neighbor table + global-id -> row lookup for one KG."""
    entity_ids = jnp.asarray(entity_ids, jnp.int32)
    neighbors = top_k_neighbors(jnp.asarray(embeds), entity_ids, k, block)
    ent_pos = np.zeros((max_id,), dtype=np.int32)
    ent_pos[np.asarray(entity_ids)] = np.arange(entity_ids.shape[0], dtype=np.int32)
    return NeighborTable(neighbors=neighbors, ent_pos=jnp.asarray(ent_pos))
