"""Multi-chip sharded SpMM for the GNN family.

The scaling axis of this workload is graph size (SURVEY.md §5): the
full-graph SpMM is the hot op of GCN-Align/AliNet/RDGCN.  Sharding
design (§2.6 north star):

* node features X row-sharded over the mesh ('x' axis);
* edges partitioned by DESTINATION row shard (each device owns the
  edges that produce its output rows), padded to equal per-shard nnz;
* source-feature access crosses shards, resolved with one all_gather of
  X over ICI, overlapped by XLA with the local gather+segment-sum.

For tables that fit per-device HBM the all_gather form is bandwidth-
optimal (each X row moves once per step); an all_to_all boundary-entity
exchange only wins when the working set exceeds HBM — that variant is a
follow-up.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from openea_tpu.ops.graph import SparseAdj


class ShardedAdj:
    """Destination-partitioned COO over an 'x' mesh axis.

    row_local [S, Epad] — destination row LOCAL to each shard
    col       [S, Epad] — global source node id
    val       [S, Epad] — edge weight (0 for padding)
    rows_per_shard      — output rows owned by each shard
    """

    def __init__(self, row_local, col, val, rows_per_shard: int, n_rows: int):
        self.row_local = row_local
        self.col = col
        self.val = val
        self.rows_per_shard = rows_per_shard
        self.n_rows = n_rows


def partition_adj(adj: SparseAdj, n_shards: int) -> ShardedAdj:
    """Split a row-sorted COO by destination row shard, padding each shard
    to the max per-shard nnz (padded edges write 0 into local row 0)."""
    row = np.asarray(adj.row)
    col = np.asarray(adj.col)
    val = np.asarray(adj.val)
    n = adj.n_rows
    rows_per = -(-n // n_shards)
    shard_of = row // rows_per
    counts = np.bincount(shard_of, minlength=n_shards)
    epad = max(1, int(counts.max()))
    row_l = np.zeros((n_shards, epad), np.int32)
    col_p = np.zeros((n_shards, epad), np.int32)
    val_p = np.zeros((n_shards, epad), np.float32)
    for s in range(n_shards):
        m = shard_of == s
        k = int(m.sum())
        row_l[s, :k] = row[m] - s * rows_per
        col_p[s, :k] = col[m]
        val_p[s, :k] = val[m]
    return ShardedAdj(jnp.asarray(row_l), jnp.asarray(col_p),
                      jnp.asarray(val_p), rows_per, n)


def sharded_spmm(mesh: Mesh, sadj: ShardedAdj, x: jax.Array) -> jax.Array:
    """out[i] = sum_e val[e] * x[col[e]] with output rows sharded over
    mesh axis 'x'; x enters row-sharded and is all_gathered inside."""
    rows_per = sadj.rows_per_shard
    n = sadj.n_rows
    pad_rows = rows_per * mesh.size - n
    xp = jnp.concatenate([x, jnp.zeros((pad_rows, x.shape[1]), x.dtype)]) \
        if pad_rows else x

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P("x", None), P("x", None), P("x", None),
                       P("x", None)),
             out_specs=P("x", None))
    def run(xs, row_l, col, val):
        x_full = jax.lax.all_gather(xs, "x", axis=0, tiled=True)
        gathered = val[0][:, None] * x_full[col[0]]
        out = jax.ops.segment_sum(gathered, row_l[0],
                                  num_segments=rows_per)
        return out

    out = jax.jit(run)(xp, sadj.row_local, sadj.col, sadj.val)
    return out[:n]
