"""Multi-chip sharded alignment evaluation.

The N1 x N2 similarity/ranking pass is embarrassingly row-parallel: shard
the query rows over every device (ICI), replicate the candidate block, and
compute exact ranks shard-locally with no collective in the hot loop — the
scaling-book recipe of annotate-shardings-and-let-XLA-partition, applied
via shard_map for explicitness.  This is the multi-chip form of
ops/ranking.rank_and_argmax (the reference's equivalent is a host
multiprocessing.Pool over rows, alignment.py:44-61).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from openea_tpu.ops.initializers import l2_normalize
from openea_tpu.ops.ranking import metrics_from_ranks


def eval_mesh(devices=None) -> Mesh:
    """1-D mesh over all devices for row-sharded eval."""
    devs = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devs), ("x",))


def sharded_rank_and_argmax(mesh: Mesh, embed1, embed2, gold_cols,
                            normalize: bool = False
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """Exact 0-based rank of gold + argmax column per row, rows sharded
    over the mesh's 'x' axis."""
    n1 = embed1.shape[0]
    n_dev = mesh.size
    pad = (-n1) % n_dev
    e1 = np.asarray(embed1, np.float32)
    gold = np.asarray(gold_cols, np.int32)
    if pad:
        e1 = np.concatenate([e1, np.zeros((pad, e1.shape[1]), np.float32)])
        gold = np.concatenate([gold, np.zeros(pad, np.int32)])
    e2 = jnp.asarray(embed2, jnp.float32)
    col_idx = jnp.arange(e2.shape[0], dtype=jnp.int32)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P("x", None), P(None, None), P("x")),
             out_specs=(P("x"), P("x")))
    def local(e1s, e2r, golds):
        a, b = e1s, e2r
        if normalize:
            a, b = l2_normalize(a), l2_normalize(b)
        s = a @ b.T
        gold_val = jnp.take_along_axis(s, golds[:, None].astype(jnp.int32), axis=1)
        greater = jnp.sum((s > gold_val).astype(jnp.int32), axis=1)
        ties = jnp.sum(((s == gold_val)
                        & (col_idx[None, :] < golds[:, None])).astype(jnp.int32),
                       axis=1)
        return greater + ties, jnp.argmax(s, axis=1).astype(jnp.int32)

    fn = jax.jit(local)
    ranks, best = fn(jnp.asarray(e1), e2, jnp.asarray(gold))
    return np.asarray(ranks)[:n1], np.asarray(best)[:n1]


def sharded_greedy_eval(mesh: Mesh, embed1, embed2, top_k,
                        normalize: bool = False):
    """(hits@k list, MR, MRR) with rows sharded over the mesh."""
    gold = np.arange(embed1.shape[0], dtype=np.int32)
    ranks, _ = sharded_rank_and_argmax(mesh, embed1, embed2, gold,
                                       normalize=normalize)
    return metrics_from_ranks(ranks, list(top_k))
