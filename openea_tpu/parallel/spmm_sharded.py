"""Multi-chip sharded SpMM for the GNN family.

The scaling axis of this workload is graph size (SURVEY.md §5): the
full-graph SpMM is the hot op of GCN-Align/AliNet/RDGCN.  Sharding
design (§2.6 north star) — two variants:

1. all_gather (``partition_adj`` + ``sharded_spmm``): node features X
   row-sharded, edges partitioned by DESTINATION row shard, one
   all_gather of X over ICI resolves cross-shard source access.  Simple,
   and bandwidth-optimal when most X rows are needed by most shards.

2. boundary exchange (``plan_boundary_exchange`` + ``boundary_spmm``):
   contiguous row ranges balanced by nnz (not row count — power-law
   degree skew makes equal-row shards up to ~2x imbalanced), and each
   shard fetches ONLY the source rows its edges reference, via one
   all_to_all of the boundary entities.  Per-shard collective volume is
   O(S * R * d) where R = max boundary size per (dest, src) pair,
   vs O(N * d) for the all_gather — the win on large graphs where each
   shard touches a fraction of the node set, and the form whose volume
   stays constant as the graph scales with the mesh (BASELINE.md north
   star: edge-partitioned KGs + boundary-entity all-to-all).
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


@jax.tree_util.register_pytree_node_class
class BoundaryPlan:
    """Host-precomputed exchange plan for ``boundary_spmm``.

    Edges whose source row lives on the destination shard ("local") are
    gathered straight from the resident feature block; ONLY remote
    boundary rows ride the all_to_all.  `r` is therefore the max unique
    remote sources per (dest, src≠dest) pair — with a locality-aware
    entity ordering this shrinks with the cut size, which is the whole
    point of the exchange.

    row_starts [S+1]   — contiguous global row range per shard (nnz-balanced)
    mr                 — max rows owned by any shard (row padding)
    row_loc  [S, Epl]  — local-edge destination row, local ids (pad -> 0)
    col_loc  [S, Epl]  — local-edge source row, local ids
    val_loc  [S, Epl]  — local-edge weight (0 for padding)
    row_local [S, Ep]  — remote-edge destination row, local ids
    col_buf   [S, Ep]  — remote-edge source position in the flat receive
                         buffer (owner_shard * r + slot)
    val       [S, Ep]  — remote-edge weight (0 for padding)
    send_idx  [S, S, r]— rows (local to the SOURCE shard) each shard sends
                         to each destination; slot-aligned with col_buf
    in_map    [S*mr]   — global row feeding each padded x slot (N for pad)
    out_map   [N]      — padded slot holding each global output row
    msk_loc/msk_rem    — 1.0 for real edges, 0.0 for padding (softmax masks)
    attr_loc/attr_rem  — optional per-edge attribute (e.g. relation id)
                         partitioned identically to val (None if unused)

    Registered as a pytree so large plans can ride through jit as step
    ARGUMENTS instead of baking tens-of-MB index constants into the
    lowered module (the AliNet 100K att_metas lesson, models/alinet.py).
    """

    _LEAVES = ("row_loc", "col_loc", "val_loc", "row_local", "col_buf",
               "val", "send_idx", "in_map", "out_map", "in_valid",
               "msk_loc", "msk_rem", "attr_loc", "attr_rem")

    def __init__(self, row_starts, mr, row_loc, col_loc, val_loc,
                 row_local, col_buf, val, send_idx,
                 in_map, out_map, n_rows, r, in_valid=None,
                 msk_loc=None, msk_rem=None, attr_loc=None, attr_rem=None):
        self.row_starts = row_starts
        self.mr = mr
        self.row_loc = row_loc
        self.col_loc = col_loc
        self.val_loc = val_loc
        self.row_local = row_local
        self.col_buf = col_buf
        self.val = val
        self.send_idx = send_idx
        self.in_map = in_map
        self.out_map = out_map
        self.n_rows = n_rows
        self.r = r
        self.in_valid = in_valid
        self.msk_loc = msk_loc
        self.msk_rem = msk_rem
        self.attr_loc = attr_loc
        self.attr_rem = attr_rem

    def tree_flatten(self):
        children = tuple(getattr(self, k) for k in self._LEAVES)
        aux = (self.row_starts.tobytes(), self.row_starts.dtype.str,
               self.mr, self.n_rows, self.r)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        buf, dt, mr, n_rows, r = aux
        row_starts = np.frombuffer(buf, dtype=np.dtype(dt))
        kw = dict(zip(cls._LEAVES, children))
        return cls(row_starts, mr, kw.pop("row_loc"), kw.pop("col_loc"),
                   kw.pop("val_loc"), kw.pop("row_local"),
                   kw.pop("col_buf"), kw.pop("val"), kw.pop("send_idx"),
                   kw.pop("in_map"), kw.pop("out_map"), n_rows, r, **kw)


def plan_boundary_exchange(adj: SparseAdj, n_shards: int,
                           row_starts=None, edge_attr=None) -> BoundaryPlan:
    """Partition a row-sorted COO into nnz-balanced contiguous row ranges
    and precompute the boundary-entity all_to_all plan.

    ``row_starts``: reuse another plan's row partition so multiple graphs
    over the same node set share one padded feature layout (e.g. RDGCN's
    primal adjacency + per-triple attention edges).
    ``edge_attr``: per-edge int/float array partitioned alongside val
    (exposed as attr_loc/attr_rem, pad -> 0)."""
    row = np.asarray(adj.row)
    col = np.asarray(adj.col)
    val = np.asarray(adj.val)
    attr = None if edge_attr is None else np.asarray(edge_attr)
    # zero-weight padding edges contribute nothing to a weighted sum and
    # must NOT enter a softmax denominator — drop them from the plan
    nz = val != 0
    if not nz.all():
        row, col, val = row[nz], col[nz], val[nz]
        if attr is not None:
            attr = attr[nz]
    n = adj.n_rows
    nnz = row.shape[0]
    S = n_shards

    if row_starts is None:
        # contiguous row ranges with ~equal nnz: split the row-sorted edge
        # list at S-1 evenly spaced edge positions, snapped to row bounds
        starts = [0]
        for s in range(1, S):
            target_row = int(row[min((s * nnz) // S, nnz - 1)])
            starts.append(max(target_row, starts[-1] + 1))
        row_starts = np.asarray([min(s, n) for s in starts] + [n], np.int64)
    else:
        row_starts = np.asarray(row_starts, np.int64)
    mr = int(np.max(row_starts[1:] - row_starts[:-1]))
    owner_of_row = np.searchsorted(row_starts[1:], np.arange(n), side="right")

    shard_of_edge = owner_of_row[row]
    col_owner = owner_of_row[col]

    # split edges into local (source resident on dest shard) and remote;
    # remote: per (dest, src) unique boundary rows + per-edge slot
    reqs = [[None] * S for _ in range(S)]
    ep = 1
    epl = 1
    r = 1
    edge_data = []
    for d in range(S):
        m = shard_of_edge == d
        ed_row, ed_col, ed_val, ed_owner = row[m], col[m], val[m], col_owner[m]
        ed_attr = attr[m] if attr is not None else None
        loc = ed_owner == d
        rem = ~loc
        rrow, rcol, rval, rowner = (ed_row[rem], ed_col[rem], ed_val[rem],
                                    ed_owner[rem])
        slots = np.zeros(rcol.shape[0], np.int64)
        for s in range(S):
            if s == d:
                reqs[d][s] = np.zeros(0, np.int64)
                continue
            ms = rowner == s
            uniq, inv = np.unique(rcol[ms], return_inverse=True)
            reqs[d][s] = uniq - row_starts[s]        # local to source shard
            slots[ms] = inv
            r = max(r, len(uniq))
        ep = max(ep, int(rem.sum()))
        epl = max(epl, int(loc.sum()))
        edge_data.append((
            ed_row[loc] - row_starts[d], ed_col[loc] - row_starts[d],
            ed_val[loc],
            rrow - row_starts[d], rowner, slots, rval,
            ed_attr[loc] if ed_attr is not None else None,
            ed_attr[rem] if ed_attr is not None else None))

    row_loc = np.zeros((S, epl), np.int32)
    col_loc = np.zeros((S, epl), np.int32)
    val_loc = np.zeros((S, epl), np.float32)
    msk_loc = np.zeros((S, epl), np.float32)
    row_local = np.zeros((S, ep), np.int32)
    col_buf = np.zeros((S, ep), np.int32)
    val_p = np.zeros((S, ep), np.float32)
    msk_rem = np.zeros((S, ep), np.float32)
    send_idx = np.zeros((S, S, r), np.int32)
    if attr is not None:
        attr_loc = np.zeros((S, epl), attr.dtype)
        attr_rem = np.zeros((S, ep), attr.dtype)
    else:
        attr_loc = attr_rem = None
    for d in range(S):
        lrow, lcol, lval, rr, owner, slots, v, la, ra = edge_data[d]
        kl = lrow.shape[0]
        row_loc[d, :kl] = lrow
        col_loc[d, :kl] = lcol
        val_loc[d, :kl] = lval
        msk_loc[d, :kl] = 1.0
        k = rr.shape[0]
        row_local[d, :k] = rr
        col_buf[d, :k] = owner * r + slots
        val_p[d, :k] = v
        msk_rem[d, :k] = 1.0
        if attr is not None:
            attr_loc[d, :kl] = la
            attr_rem[d, :k] = ra
        for s in range(S):
            q = reqs[d][s]
            send_idx[s, d, :len(q)] = q

    in_map = np.full(S * mr, 0, np.int32)
    in_valid = np.zeros(S * mr, np.float32)
    out_map = np.zeros(n, np.int32)
    for s in range(S):
        k = int(row_starts[s + 1] - row_starts[s])
        sl = np.arange(row_starts[s], row_starts[s + 1])
        in_map[s * mr: s * mr + k] = sl
        in_valid[s * mr: s * mr + k] = 1.0
        out_map[sl] = s * mr + np.arange(k)
    plan = BoundaryPlan(row_starts, mr, jnp.asarray(row_loc),
                        jnp.asarray(col_loc), jnp.asarray(val_loc),
                        jnp.asarray(row_local),
                        jnp.asarray(col_buf), jnp.asarray(val_p),
                        jnp.asarray(send_idx), jnp.asarray(in_map),
                        jnp.asarray(out_map), n, r,
                        in_valid=jnp.asarray(in_valid),
                        msk_loc=jnp.asarray(msk_loc),
                        msk_rem=jnp.asarray(msk_rem),
                        attr_loc=(jnp.asarray(attr_loc)
                                  if attr_loc is not None else None),
                        attr_rem=(jnp.asarray(attr_rem)
                                  if attr_rem is not None else None))
    return plan


def pad_rows(plan: BoundaryPlan, x: jax.Array) -> jax.Array:
    """Global [N, d] -> shard-major padded [S*mr, d] (pad slots zeroed)."""
    return x[plan.in_map] * plan.in_valid[:, None]


def unpad_rows(plan: BoundaryPlan, xp: jax.Array) -> jax.Array:
    """Shard-major padded [S*mr, d] -> global [N, d]."""
    return xp[plan.out_map]


def boundary_spmm_padded(mesh: Mesh, plan: BoundaryPlan,
                         xp: jax.Array) -> jax.Array:
    """Padded-layout boundary SpMM: [S*mr, d] -> [S*mr, d], composable
    inside an outer jit (chain GCN layers without leaving the shard-major
    layout).  Padded input slots are never read with nonzero weight;
    padded output slots come back zero."""
    S = mesh.size
    mr, r = plan.mr, plan.r

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P("x", None), P("x", None), P("x", None),
                       P("x", None), P("x", None), P("x", None),
                       P("x", None), P("x", None, None)),
             out_specs=P("x", None))
    def run(xs, row_ll, col_ll, val_ll, row_l, col_b, vals, send):
        # local edges read the resident block directly — no collective
        loc = val_ll[0][:, None] * xs[col_ll[0]]
        out = jax.ops.segment_sum(loc, row_ll[0], num_segments=mr)
        # xs [mr, d]; send[0] [S, r]: rows THIS shard sends to each dest
        buf = xs[send[0]]                               # [S, r, d]
        recv = jax.lax.all_to_all(buf, "x", split_axis=0, concat_axis=0,
                                  tiled=False)          # [S, r, d]
        flat = recv.reshape(S * r, -1)
        gathered = vals[0][:, None] * flat[col_b[0]]
        return out + jax.ops.segment_sum(gathered, row_l[0],
                                         num_segments=mr)

    return run(xp, plan.row_loc, plan.col_loc, plan.val_loc,
               plan.row_local, plan.col_buf, plan.val, plan.send_idx)


def boundary_spmm(mesh: Mesh, plan: BoundaryPlan, x: jax.Array) -> jax.Array:
    """out[i] = sum_e val[e] * x[col[e]] with one boundary-entity
    all_to_all instead of a full all_gather (global row layout in/out)."""
    out = jax.jit(partial(boundary_spmm_padded, mesh, plan))(
        pad_rows(plan, x))
    return unpad_rows(plan, out)


def partition_by_plan(adj: SparseAdj, plan: BoundaryPlan):
    """Split a (possibly rectangular) row-sorted COO by the plan's
    destination row ranges.  Columns index a REPLICATED source matrix
    (e.g. the [n_attrs, d] weight of GCN-Align's attribute view), so the
    local SpMM needs no collective at all.  Returns [S, Ep] padded
    (row_local, col, val) arrays for ``local_spmm_padded``."""
    row = np.asarray(adj.row)
    col = np.asarray(adj.col)
    val = np.asarray(adj.val)
    starts = np.asarray(plan.row_starts)
    S = len(starts) - 1
    owner = np.searchsorted(starts[1:], row, side="right")
    counts = np.bincount(owner, minlength=S)
    ep = max(1, int(counts.max()))
    row_l = np.zeros((S, ep), np.int32)
    col_p = np.zeros((S, ep), np.int32)
    val_p = np.zeros((S, ep), np.float32)
    for s in range(S):
        m = owner == s
        k = int(m.sum())
        row_l[s, :k] = row[m] - starts[s]
        col_p[s, :k] = col[m]
        val_p[s, :k] = val[m]
    return jnp.asarray(row_l), jnp.asarray(col_p), jnp.asarray(val_p)


def boundary_softmax_spmm_padded(mesh: Mesh, plan: BoundaryPlan,
                                 xp: jax.Array, logit_fn,
                                 agg_cols: int = 0,
                                 rep_args=()) -> jax.Array:
    """Row-softmax attention aggregation over a boundary plan — the
    multi-chip form of ``segment_softmax`` + weighted gather-sum used by
    the attention GNNs (RDGCN sparse primal attention, rdgcn.py:202-215;
    AliNet 2-hop attention, alinet.py:581).

    out[i] = sum_{e: dst(e)=i} softmax_i(logit_e) * src_e[:, :agg_cols]

    xp [S*mr, D]: padded shard-major feature rows.  Columns beyond
    ``agg_cols`` (default: all D) carry per-source scalars that ride the
    same all_to_all and are visible to ``logit_fn`` but are not
    aggregated.
    logit_fn(dst_feats [E, D], src_feats [E, D], val [E], attr [E]|None,
    *rep_args) -> [E] per-edge logits; called once for the local and once
    for the remote edge set.  ``rep_args`` are replicated arrays (e.g. a
    per-relation logit table) passed through the shard_map with P() spec.
    Padding edges are masked out of the softmax (numerically, not by
    zero weights); rows with no edges return 0."""
    S = mesh.size
    mr, r = plan.mr, plan.r
    C = agg_cols or xp.shape[1]
    NEG = jnp.float32(-1e30)
    has_attr = plan.attr_loc is not None
    a_loc = plan.attr_loc if has_attr else plan.msk_loc
    a_rem = plan.attr_rem if has_attr else plan.msk_rem

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P("x", None),) * 11 + (P("x", None, None),)
             + (P(),) * len(rep_args),
             out_specs=P("x", None))
    def run(xs, row_ll, col_ll, v_lo, msk_ll, att_ll, row_l, col_b, v_re,
            msk_r, att_r, send, *reps):
        row_lo, row_re = row_ll[0], row_l[0]
        m_lo, m_re = msk_ll[0], msk_r[0]
        src_loc = xs[col_ll[0]]
        dst_loc = xs[row_lo]
        lg_loc = logit_fn(dst_loc, src_loc, v_lo[0],
                          att_ll[0] if has_attr else None, *reps)
        buf = xs[send[0]]                                # [S, r, D]
        recv = jax.lax.all_to_all(buf, "x", split_axis=0, concat_axis=0,
                                  tiled=False)
        flat = recv.reshape(S * r, -1)
        src_rem = flat[col_b[0]]
        dst_rem = xs[row_re]
        lg_rem = logit_fn(dst_rem, src_rem, v_re[0],
                          att_r[0] if has_attr else None, *reps)
        lg_loc = jnp.where(m_lo > 0, lg_loc, NEG)
        lg_rem = jnp.where(m_re > 0, lg_rem, NEG)
        mx = jnp.maximum(
            jax.ops.segment_max(lg_loc, row_lo, num_segments=mr),
            jax.ops.segment_max(lg_rem, row_re, num_segments=mr))
        mx = jnp.maximum(mx, NEG)          # rows with no edges: -inf -> NEG
        w_loc = jnp.where(m_lo > 0, jnp.exp(lg_loc - mx[row_lo]), 0.0)
        w_rem = jnp.where(m_re > 0, jnp.exp(lg_rem - mx[row_re]), 0.0)
        den = (jax.ops.segment_sum(w_loc, row_lo, num_segments=mr)
               + jax.ops.segment_sum(w_rem, row_re, num_segments=mr))
        num = (jax.ops.segment_sum(w_loc[:, None] * src_loc[:, :C], row_lo,
                                   num_segments=mr)
               + jax.ops.segment_sum(w_rem[:, None] * src_rem[:, :C], row_re,
                                     num_segments=mr))
        return num / jnp.maximum(den, 1e-30)[:, None]

    return run(xp, plan.row_loc, plan.col_loc, plan.val_loc, plan.msk_loc,
               a_loc, plan.row_local, plan.col_buf, plan.val, plan.msk_rem,
               a_rem, plan.send_idx, *rep_args)


def partition_pairs_by_plan(plan: BoundaryPlan, ent_ids, seg_ids):
    """Partition (segment, entity) incidence pairs by the plan's entity
    row ranges for ``sharded_segment_sum`` — the multi-chip form of the
    per-relation head/tail means (RDGCN compute_r, rdgcn.py:258-266).
    Returns padded (ent_local [S,P], seg [S,P], msk [S,P])."""
    ent = np.asarray(ent_ids)
    seg = np.asarray(seg_ids)
    starts = np.asarray(plan.row_starts)
    S = len(starts) - 1
    owner = np.searchsorted(starts[1:], ent, side="right")
    counts = np.bincount(owner, minlength=S)
    pp = max(1, int(counts.max()))
    ent_l = np.zeros((S, pp), np.int32)
    seg_p = np.zeros((S, pp), np.int32)
    msk = np.zeros((S, pp), np.float32)
    for s in range(S):
        m = owner == s
        k = int(m.sum())
        ent_l[s, :k] = ent[m] - starts[s]
        seg_p[s, :k] = seg[m]
        msk[s, :k] = 1.0
    return jnp.asarray(ent_l), jnp.asarray(seg_p), jnp.asarray(msk)


def sharded_segment_sum(mesh: Mesh, parts, xp: jax.Array,
                        num_segments: int) -> jax.Array:
    """sum of xp rows grouped by segment id, entities row-sharded in the
    plan's padded layout; output replicated [num_segments, d] via psum."""
    ent_l, seg_p, msk = parts

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P("x", None), P("x", None), P("x", None),
                       P("x", None)),
             out_specs=P(None, None))
    def run(xs, e, g, m):
        part = jax.ops.segment_sum(xs[e[0]] * m[0][:, None], g[0],
                                   num_segments=num_segments)
        return jax.lax.psum(part, "x")

    return run(xp, ent_l, seg_p, msk)


def local_spmm_padded(mesh: Mesh, plan: BoundaryPlan, parts,
                      x: jax.Array) -> jax.Array:
    """[n_src, d] replicated x -> [S*mr, d] padded output rows, edges
    pre-partitioned by ``partition_by_plan`` — shard-local, no collective."""
    row_l, col_p, val_p = parts
    mr = plan.mr

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(None, None), P("x", None), P("x", None),
                       P("x", None)),
             out_specs=P("x", None))
    def run(xr, r, c, v):
        return jax.ops.segment_sum(v[0][:, None] * xr[c[0]], r[0],
                                   num_segments=mr)

    return run(x, row_l, col_p, val_p)
