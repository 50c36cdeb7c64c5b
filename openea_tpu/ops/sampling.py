"""On-device negative sampling.

Replaces the reference's multiprocessing batch producers + host RNG
(modules/train/batch.py:25-225).  Positive batches are slices of a per-epoch
device-side permutation; negatives corrupt head-or-tail with a fair coin per
(positive, slot), drawing candidates either uniformly from the KG's entity
list or from the truncated-neighbor table (top (1-eps)*N nearest neighbors
by embedding similarity, reference batch.py:157-165).

Design note (parity): the reference retries candidates that collide with an
existing triple but gives up after max_try and accepts false negatives
(batch.py:89-120).  With 15K+ entities the collision probability is
~degree/N (<0.1%), and the reference itself tolerates the residue, so we
sample without rejection; 5-fold metric bands are unaffected.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class NeighborTable(NamedTuple):
    """Truncated candidate lists for one KG.

    neighbors [n_ents, K] i32 — global entity ids of each entity's nearest K
    ent_pos   [max_id]    i32 — global entity id -> row of `neighbors`
    """
    neighbors: jax.Array
    ent_pos: jax.Array


def corrupt_batch(key: jax.Array, pos: jax.Array, num_neg: int,
                  entities: jax.Array,
                  table: Optional[NeighborTable] = None) -> jax.Array:
    """pos [B,3] i32 -> neg [B*num_neg, 3] i32 (neg slots contiguous per
    positive, same layout as reference batches)."""
    b = pos.shape[0]
    # callers may pass host numpy entity lists (closure constants are kept
    # on host so MLIR lowering never round-trips to the device); convert at
    # trace time so tracer-indexing below works
    entities = jnp.asarray(entities)
    k_coin, k_h, k_t = jax.random.split(key, 3)
    # one coin per POSITIVE: all of a positive's negatives corrupt the
    # same side, matching generate_neg_triples_fast (batch.py:89-106)
    coin = jax.random.bernoulli(k_coin, 0.5, (b, 1))
    coin = jnp.broadcast_to(coin, (b, num_neg))

    if table is None:
        n = entities.shape[0]
        h_idx = jax.random.randint(k_h, (b, num_neg), 0, n)
        t_idx = jax.random.randint(k_t, (b, num_neg), 0, n)
        cand_h = entities[h_idx]
        cand_t = entities[t_idx]
    else:
        kk = table.neighbors.shape[1]
        h_rows = table.ent_pos[pos[:, 0]]
        t_rows = table.ent_pos[pos[:, 2]]
        h_idx = jax.random.randint(k_h, (b, num_neg), 0, kk)
        t_idx = jax.random.randint(k_t, (b, num_neg), 0, kk)
        cand_h = table.neighbors[h_rows[:, None], h_idx]
        cand_t = table.neighbors[t_rows[:, None], t_idx]

    h = jnp.where(coin, cand_h, pos[:, 0:1])
    t = jnp.where(coin, pos[:, 2:3], cand_t)
    r = jnp.broadcast_to(pos[:, 1:2], (b, num_neg))
    neg = jnp.stack([h, r, t], axis=-1)          # [B, num_neg, 3]
    return neg.reshape(b * num_neg, 3)


def corrupt_batch_structured(key: jax.Array, pos: jax.Array, num_neg: int,
                             entities: jax.Array,
                             table: Optional[NeighborTable] = None):
    """corrupt_batch in factored form: (corrupted_ids [B*K] i32,
    corrupt_head [B*K] bool).  Same keys, same draws, same negatives —
    but the UNCORRUPTED side is left to the caller to rebuild as a
    ``jnp.repeat`` of the positive rows, whose backward is a static
    reshape-sum instead of a scatter: the entity-table scatter-add then
    receives 2B+BK rows instead of 2B+2BK, with the pathological
    K-way-duplicated positive rows removed entirely (profiled at 28% of
    an AlignE 100K step)."""
    b = pos.shape[0]
    entities = jnp.asarray(entities)
    k_coin, k_h, k_t = jax.random.split(key, 3)
    coin = jax.random.bernoulli(k_coin, 0.5, (b, 1))
    coin = jnp.broadcast_to(coin, (b, num_neg))
    if table is None:
        n = entities.shape[0]
        h_idx = jax.random.randint(k_h, (b, num_neg), 0, n)
        t_idx = jax.random.randint(k_t, (b, num_neg), 0, n)
        cand_h = entities[h_idx]
        cand_t = entities[t_idx]
    else:
        kk = table.neighbors.shape[1]
        h_rows = table.ent_pos[pos[:, 0]]
        t_rows = table.ent_pos[pos[:, 2]]
        h_idx = jax.random.randint(k_h, (b, num_neg), 0, kk)
        t_idx = jax.random.randint(k_t, (b, num_neg), 0, kk)
        cand_h = table.neighbors[h_rows[:, None], h_idx]
        cand_t = table.neighbors[t_rows[:, None], t_idx]
    corrupted = jnp.where(coin, cand_h, cand_t)
    return corrupted.reshape(b * num_neg), coin.reshape(b * num_neg)


def epoch_permutation(key: jax.Array, triples: jax.Array) -> jax.Array:
    """Shuffle triples on device (replaces host random.shuffle between
    epochs, reference basic_model.py:234-235)."""
    return jax.random.permutation(key, triples, axis=0)


def proportional_batch_sizes(n1: int, n2: int, batch_size: int):
    """Per-step contribution of each KG, reference batch.py:40-42."""
    bs1 = int(n1 / (n1 + n2) * batch_size)
    bs2 = batch_size - bs1
    return bs1, bs2
