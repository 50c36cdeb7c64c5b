"""Pallas CSR SpMM for the GNN family (GCN-Align / AliNet / RDGCN).

Replaces `tf.sparse_tensor_dense_matmul` (reference
approaches/gcn_align.py:83, alinet.py:581,674-676, rdgcn.py:202-215) on
the TPU hot path.  The XLA fallback (`ops/graph.spmm`) lowers to
gather -> multiply -> scatter-add; measured on-chip at 100K scale
(n=200K, nnz=2.4M, d=128) that chain runs at ~22 GB/s effective — the
scatter-add alone is ~23 ms and the unfused [nnz, d] intermediate makes
three extra HBM round trips.  The gather itself is fast (~214 GB/s), so
the design here keeps XLA's gather and replaces everything after it:

    P = x[col]                                  (XLA gather, random reads)
    out = pallas sorted-segment matmul-reduce   (this module)

The kernel walks edge chunks of ``EC`` edges (row-sorted, so each chunk
lands in one ``TM``-row output window), builds a val-scaled one-hot
matrix S[TM, EC] on the VPU, and accumulates ``S @ P_chunk`` on the MXU
into a VMEM-resident output tile.  The output tile flushes to HBM once
per window (scalar-prefetched chunk->window routing), so the total HBM
traffic is one streaming read of P plus one write of the output —
roughly speed-of-light for this op — and the scatter-add becomes a
dense matmul the MXU is built for.

Zero-weight padding edges (col=0, val=0) make every chunk exactly EC
edges without branching; their one-hot column is all zeros so they
contribute nothing.

Backward: d/dx (A @ x) = A^T @ g — the same kernel run with a transpose
plan (edges re-sorted by source).  Adjacency values are treated as
constants (GNN adjacencies here are precomputed weights, never trained);
models that need val-gradients (attention) stay on the XLA path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TM = 128          # output rows per window (one-hot matmul height)
EC = 1024         # edges per chunk (= 8 x 128 metadata tile)
_LANE = 128


class SpmmPlan(NamedTuple):
    """Host-precomputed chunk routing for one row-sorted COO adjacency.

    col        [NC*EC]      gather indices (pad -> 0)
    val        [NC, 8, 128] edge weights per chunk (pad -> 0)
    rowloc     [NC, 8, 128] dest row local to the chunk's window
    window     [NC]         output window index per chunk (sorted)
    first      [NC]         1 where a chunk starts a new window
    n_rows     original row count (output sliced back to this)
    n_windows  padded row count // TM
    """

    col: jax.Array
    val: jax.Array
    rowloc: jax.Array
    window: jax.Array
    first: jax.Array
    n_rows: int
    n_windows: int


def build_spmm_plan(row: np.ndarray, col: np.ndarray, val: np.ndarray,
                    n_rows: int) -> SpmmPlan:
    """Chunk a row-sorted COO into EC-edge chunks that never span a
    TM-row window, padding each window's tail chunk with zero edges."""
    row = np.asarray(row)
    col = np.asarray(col)
    val = np.asarray(val)
    order = np.argsort(row, kind="stable")
    row, col, val = row[order], col[order], val[order]

    n_windows = max(-(-n_rows // TM), 1)
    win = row // TM
    # edges per window (every window gets >= 1 chunk: unvisited Pallas
    # output blocks are undefined, so empty windows need a zeroing chunk)
    wcounts = np.bincount(win, minlength=n_windows).astype(np.int64)
    wstarts = np.concatenate([[0], np.cumsum(wcounts)])
    chunks_per = np.maximum(-(-wcounts // EC), 1)
    nc = int(chunks_per.sum())

    col_p = np.zeros(nc * EC, np.int32)
    val_p = np.zeros(nc * EC, np.float32)
    rowloc_p = np.zeros(nc * EC, np.int32)
    window_p = np.zeros(nc, np.int32)
    first_p = np.zeros(nc, np.int32)

    ci = 0
    for w in range(n_windows):
        pos, cnt = int(wstarts[w]), int(wcounts[w])
        for j in range(int(chunks_per[w])):
            lo = pos + j * EC
            hi = min(pos + (j + 1) * EC, pos + cnt)
            k = hi - lo
            dst = ci * EC
            col_p[dst:dst + k] = col[lo:hi]
            val_p[dst:dst + k] = val[lo:hi]
            rowloc_p[dst:dst + k] = row[lo:hi] - w * TM
            window_p[ci] = w
            first_p[ci] = 1 if j == 0 else 0
            ci += 1

    # numpy on purpose: plans are usually CLOSURE constants of jitted
    # model steps — numpy embeds into the lowered module from host memory,
    # a device array would cost a blocking device->host read at trace time
    # (same rule as ops/graph.build_sparse(host=True))
    return SpmmPlan(
        col=col_p,
        val=val_p.reshape(nc, 8, EC // 8),
        rowloc=rowloc_p.reshape(nc, 8, EC // 8),
        window=window_p,
        first=first_p,
        n_rows=n_rows,
        n_windows=n_windows,
    )


_PRECISIONS = {
    # HIGHEST: multi-pass f32 on the MXU — exact vs segment_sum (5e-7),
    # the right default for precomputed-weight GNN adjacencies.
    "highest": jax.lax.Precision.HIGHEST,
    # DEFAULT: one bf16 pass, f32 accumulate — ~2e-3 rel err, up to 6x
    # faster matmul; right for learned attention aggregations.  (HIGH /
    # bf16x3 is not supported by the Mosaic kernel lowering.)
    "default": jax.lax.Precision.DEFAULT,
}


def _segsum_kernel(win_ref, first_ref, val_ref, rowloc_ref, p_ref, out_ref,
                   *, precision):
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rl = rowloc_ref[0].reshape(1, EC)              # [1, EC]
    v = val_ref[0].reshape(1, EC)                  # [1, EC]
    sel = (jax.lax.broadcasted_iota(jnp.int32, (TM, EC), 0)
           == rl).astype(jnp.float32)
    s = (sel * v).astype(p_ref.dtype)              # val-scaled one-hot
    out_ref[:] += jnp.dot(s, p_ref[:], preferred_element_type=jnp.float32,
                          precision=_PRECISIONS[precision])


@functools.partial(jax.jit, static_argnames=("n_rows", "n_windows",
                                             "interpret", "precision"))
def _sorted_segment_matmul(val, rowloc, window, first, p,
                           n_rows: int, n_windows: int,
                           interpret: bool = False,
                           precision: str = "highest"):
    nc = window.shape[0]
    d = p.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                     # window, first
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((1, 8, EC // 8), lambda i, w, f: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, EC // 8), lambda i, w, f: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EC, d), lambda i, w, f: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, d), lambda i, w, f: (w[i], 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_segsum_kernel, precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_windows * TM, d), jnp.float32),
        interpret=interpret,
    )(window, first, val, rowloc, p)
    return out


def _forward(plan: SpmmPlan, x: jax.Array, interpret: bool,
             precision: str = "highest") -> jax.Array:
    d0 = x.shape[1]
    xp = _pad_lanes(x, precision)   # 'default': bf16 gather, HALF the
    p = xp[plan.col]                # [NC*EC, d] HBM bill of the hot path
    out = _sorted_segment_matmul(plan.val, plan.rowloc,
                                 plan.window, plan.first, p,
                                 plan.n_rows, plan.n_windows,
                                 interpret=interpret, precision=precision)
    return out[:plan.n_rows, :d0]


def make_csr_spmm(plan: SpmmPlan, plan_t: SpmmPlan, interpret: bool = False,
                  precision: str = "highest"):
    """Differentiable y = A @ x with Pallas forward and transpose-plan
    backward.  ``plan_t`` is the plan of A^T (build_spmm_plan with row/col
    swapped); both close over the returned fn.  ``precision``: 'highest'
    (f32-exact, default) or 'default' (bf16 feature gather + one bf16 MXU
    pass with f32 accumulate, ~2e-3 rel err, ~2x less HBM traffic)."""

    @jax.custom_vjp
    def csr_spmm(x):
        return _forward(plan, x, interpret, precision)

    def fwd(x):
        return csr_spmm(x), None

    def bwd(_, g):
        return (_forward(plan_t, g, interpret, precision),)

    csr_spmm.defvjp(fwd, bwd)
    return csr_spmm


def plans_from_coo(row: np.ndarray, col: np.ndarray, val: np.ndarray,
                   n_rows: int, n_cols: int | None = None):
    """(plan, plan_T) pair for make_csr_spmm.  ``n_cols`` defaults to
    n_rows (square adjacency)."""
    n_cols = n_rows if n_cols is None else n_cols
    plan = build_spmm_plan(row, col, val, n_rows)
    plan_t = build_spmm_plan(col, row, val, n_cols)
    return plan, plan_t


# --------------------------------------------------------------------- #
# dynamic-value SpMM + SDDMM backward (attention aggregation)
# --------------------------------------------------------------------- #


@jax.tree_util.register_pytree_node_class
class ChunkMeta:
    """Chunk routing for a fixed sparsity STRUCTURE whose edge values are
    traced (attention weights): a SpmmPlan minus ``val``, plus ``slots`` —
    the flat chunk-slot position of each input edge, so traced per-edge
    values scatter into the padded chunk layout inside jit.

    Registered as a pytree (n_rows/n_windows static) so large metas can be
    passed as jit ARGUMENTS instead of being embedded as trace constants
    (at 100K-scale 2-hop adjacencies the three index arrays are ~80 MB
    each — constant-embedding them would bloat every step executable)."""

    def __init__(self, col, rowloc, window, first, slots, inv_slots,
                 n_rows: int, n_windows: int):
        self.col = col          # [NC*EC] gather indices (pad -> 0)
        self.rowloc = rowloc    # [NC, 8, EC//8]
        self.window = window    # [NC]
        self.first = first      # [NC]
        self.slots = slots      # [nnz] input-edge -> flat chunk slot
        self.inv_slots = inv_slots  # [NC*EC] slot -> input edge (pad -> nnz)
        self.n_rows = n_rows
        self.n_windows = n_windows

    def tree_flatten(self):
        return ((self.col, self.rowloc, self.window, self.first,
                 self.slots, self.inv_slots), (self.n_rows, self.n_windows))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def device_put(self) -> "ChunkMeta":
        """Copy index arrays to device (use when the meta is a step
        ARGUMENT, so it is not re-uploaded every call)."""
        return ChunkMeta(*(jnp.asarray(a) for a in
                           (self.col, self.rowloc, self.window, self.first,
                            self.slots, self.inv_slots)),
                         self.n_rows, self.n_windows)


def build_chunk_meta(row: np.ndarray, col: np.ndarray, n_rows: int,
                     pad_chunks_to: int = 1) -> ChunkMeta:
    """Like build_spmm_plan but for traced values: also records where each
    ORIGINAL edge lands in the chunked layout.  ``pad_chunks_to``: round
    the chunk count up to a multiple (blocked execution reshapes chunks
    into [n_mega, S]); pad chunks carry zero values into the last window."""
    row = np.asarray(row)
    col = np.asarray(col)
    nnz = len(row)
    # skip the re-sort when rows arrive sorted (they usually do: the
    # adjacency builders emit row-sorted COO) — the argsort + two 80M
    # gathers cost seconds at the 100K 2-hop shape
    presorted = nnz == 0 or bool((np.diff(row) >= 0).all())
    if presorted:
        order = None
        row_s, col_s = row, col
    else:
        order = None
        if nnz >= (1 << 22) and row.dtype == np.int32:
            # native parallel counting argsort (bounded key domain):
            # np.argsort costs ~20 s at the 80M-edge transpose-meta shape
            from openea_tpu.data.native import counting_argsort
            order = counting_argsort(row, n_rows)
        if order is None:
            order = np.argsort(row, kind="stable")
        row_s, col_s = row[order], col[order]

    # TM / EC are powers of two: shifts, not divmod (int64 division over
    # tens of millions of edges is seconds-per-pass)
    tm_b = TM.bit_length() - 1
    assert (1 << tm_b) == TM
    n_windows = max(-(-n_rows // TM), 1)
    win = row_s >> tm_b if row_s.dtype == np.int32 \
        else (row_s // TM).astype(np.int64)
    wcounts = np.bincount(win, minlength=n_windows).astype(np.int64)
    wstarts = np.concatenate([[0], np.cumsum(wcounts)])
    chunks_per = np.maximum(-(-wcounts // EC), 1)
    nc = int(chunks_per.sum())
    nc_pad = -(-nc // pad_chunks_to) * pad_chunks_to

    col_p = np.zeros(nc_pad * EC, np.int32)
    rowloc_p = np.zeros(nc_pad * EC, np.int32)
    # pad chunks: zero-valued edges into the LAST window (keeps the
    # window sequence nondecreasing for blocked relative indexing)
    window_p = np.full(nc_pad, n_windows - 1, np.int32)
    first_p = np.zeros(nc_pad, np.int32)

    # chunk routing is LINEAR in the sorted position: sorted edge i of
    # window w sits at within-window position p = i - wstarts[w], i.e.
    # chunk cumch[w] + p//EC at slot p%EC — and (cumch[w] + p//EC)*EC +
    # p%EC = cumch[w]*EC + p, so the whole route is one per-window
    # offset gather + an add (the divmod form cost ~10 s at 80M edges)
    cumch = np.concatenate([[0], np.cumsum(chunks_per)])
    woff = cumch[:-1] * EC - wstarts[:-1]          # [n_windows] int64
    slot_sorted = np.arange(nnz, dtype=np.int64)
    slot_sorted += woff[win]
    col_p[slot_sorted] = col_s
    rowloc_p[slot_sorted] = (row_s & (TM - 1)).astype(np.int32)
    if nc:
        window_p[:nc] = np.repeat(np.arange(n_windows, dtype=np.int32),
                                  chunks_per)
        first_p[cumch[:-1]] = 1          # first chunk of every window

    if presorted:
        slots = slot_sorted
        inv = np.full(nc_pad * EC, nnz, np.int64)
        inv[slot_sorted] = np.arange(nnz, dtype=np.int64)
    else:
        slots = np.zeros(nnz, np.int64)
        slots[order] = slot_sorted
        # slot -> original edge (pad slots -> nnz: callers append a zero)
        inv = np.full(nc_pad * EC, nnz, np.int64)
        inv[slot_sorted] = order
    return ChunkMeta(col=col_p, rowloc=rowloc_p.reshape(nc_pad, 8, EC // 8),
                     window=window_p, first=first_p,
                     slots=slots.astype(np.int32),
                     inv_slots=inv.astype(np.int32),
                     n_rows=n_rows, n_windows=n_windows)


def _sddmm_kernel(win_ref, rowloc_ref, p_ref, g_ref, out_ref, *, precision):
    """Per-edge <g[row_e], p_e> for one chunk: M = g @ p^T on the MXU
    ([TM, EC] = every window row x every edge), then mask with the row
    one-hot and reduce over sublanes — Mosaic-friendly layouts only (a
    direct [EC, 1] rowloc column or [EC]->(8,128) reshape is an
    unsupported shape cast)."""
    rl = rowloc_ref[0].reshape(1, EC)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (TM, EC), 0)
           == rl).astype(jnp.float32)
    m = jax.lax.dot_general(g_ref[:], p_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_PRECISIONS[precision])      # [TM, EC]
    out_ref[:] = jnp.sum(sel * m, axis=0, keepdims=True)[None]    # (1,1,EC)


@functools.partial(jax.jit, static_argnames=("n_windows", "interpret",
                                             "precision"))
def _sorted_segment_sddmm(rowloc, window, p, g, n_windows: int,
                          interpret: bool = False,
                          precision: str = "highest"):
    nc = window.shape[0]
    d = p.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                     # window
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((1, 8, EC // 8), lambda i, w: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EC, d), lambda i, w: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, d), lambda i, w: (w[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, EC), lambda i, w: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_sddmm_kernel, precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nc, 1, EC), jnp.float32),
        interpret=interpret,
    )(window, rowloc, p, g)
    return out.reshape(nc * EC)


def _scatter_val(m: ChunkMeta, val):
    """val [nnz] in original edge order -> chunk layout [NC, 8, EC//8].
    A GATHER via inv_slots (pad slots read the appended zero) — gathers
    are ~2x cheaper than the equivalent scatter on TPU."""
    n_chunks = m.window.shape[0]
    val_ext = jnp.concatenate([val.astype(jnp.float32),
                               jnp.zeros((1,), jnp.float32)])
    return val_ext[jnp.asarray(m.inv_slots)].reshape(n_chunks, 8, EC // 8)


def _pad_lanes(x, precision="highest"):
    """Pad features to a lane multiple; under 'default' precision cast to
    bf16 BEFORE the [nnz, d] gather — the gather dominates HBM traffic,
    so half-width features halve the kernel's memory bill."""
    d0 = x.shape[1]
    d = -(-d0 // _LANE) * _LANE
    xp = x.astype(jnp.bfloat16 if precision == "default" else jnp.float32)
    if d != d0:
        xp = jnp.pad(xp, ((0, 0), (0, d - d0)))
    return xp


def _blocked_segment_matmul(meta: ChunkMeta, val_c, xp, S: int,
                            interpret: bool, precision: str = "highest"):
    """Mega-chunked A @ x: scan over groups of S chunks so only
    [S*EC, d] of gathered features materializes at once (at 100K-scale
    attention adjacencies the full gather would be tens of GB).  Each
    mega-chunk covers a contiguous window range (chunks are window-
    sorted, every window owns >= 1 chunk, so S consecutive chunks span
    <= S+1 windows); its partial sums accumulate into the carry at the
    mega's window offset, masked to the windows it actually visited."""
    NC = meta.window.shape[0]
    assert NC % S == 0, (NC, S)
    n_mega = NC // S
    d = xp.shape[1]
    W = S + 1
    win_m = jnp.asarray(meta.window).reshape(n_mega, S)
    first_m = jnp.asarray(meta.first).reshape(n_mega, S).at[:, 0].set(1)
    cols_m = jnp.asarray(meta.col).reshape(n_mega, S * EC)
    val_m = val_c.reshape(n_mega, S, 8, EC // 8)
    rowloc_m = jnp.asarray(meta.rowloc).reshape(n_mega, S, 8, EC // 8)
    out0 = jnp.zeros((meta.n_windows * TM + W * TM, d), jnp.float32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (W * TM, 1), 0)

    def body(out, args):
        w, f, c, v, rl = args
        w0 = w[0]
        p = xp[c]
        mega = _sorted_segment_matmul(v, rl, w - w0, f, p, W * TM, W,
                                      interpret=interpret,
                                      precision=precision)
        # blocks past the last visited window hold uninitialized memory
        mega = jnp.where(row_ids < (w[-1] - w0 + 1) * TM, mega, 0.0)
        seg = jax.lax.dynamic_slice(out, (w0 * TM, 0), (W * TM, d))
        out = jax.lax.dynamic_update_slice(out, seg + mega, (w0 * TM, 0))
        return out, None

    out, _ = jax.lax.scan(body, out0, (win_m, first_m, cols_m, val_m,
                                       rowloc_m))
    return out


def _dyn_forward(meta, val, x, interpret, block_chunks, precision):
    d0 = x.shape[1]
    xp = _pad_lanes(x, precision)
    val_c = _scatter_val(meta, val)
    if block_chunks and meta.window.shape[0] > block_chunks:
        out = _blocked_segment_matmul(meta, val_c, xp, block_chunks,
                                      interpret, precision)
    else:
        p = xp[jnp.asarray(meta.col)]
        out = _sorted_segment_matmul(
            val_c, jnp.asarray(meta.rowloc), meta.window, meta.first, p,
            meta.n_rows, meta.n_windows, interpret=interpret,
            precision=precision)
    return out[:meta.n_rows, :d0]


def _float0_zeros(tree):
    return jax.tree_util.tree_map(
        lambda a: np.zeros(np.shape(a), jax.dtypes.float0), tree)


def _blocked_sddmm(meta: ChunkMeta, xp, gp, S: int, interpret: bool,
                   precision: str = "highest"):
    """Mega-chunked dval_e = <g[row_e], x[col_e]> (see
    _blocked_segment_matmul for the memory rationale)."""
    NC = meta.window.shape[0]
    assert NC % S == 0, (NC, S)
    n_mega = NC // S
    d = xp.shape[1]
    W = S + 1
    win_m = jnp.asarray(meta.window).reshape(n_mega, S)
    cols_m = jnp.asarray(meta.col).reshape(n_mega, S * EC)
    rowloc_m = jnp.asarray(meta.rowloc).reshape(n_mega, S, 8, EC // 8)
    gw = jnp.pad(gp, ((0, meta.n_windows * TM + W * TM - gp.shape[0]),
                      (0, 0)))

    def body(_, args):
        w, c, rl = args
        w0 = w[0]
        p = xp[c]
        gseg = jax.lax.dynamic_slice(gw, (w0 * TM, 0), (W * TM, d))
        return None, _sorted_segment_sddmm(rl, w - w0, p, gseg, W,
                                           interpret=interpret,
                                           precision=precision)

    _, dval = jax.lax.scan(body, None, (win_m, cols_m, rowloc_m))
    return dval.reshape(NC * EC)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def dyn_csr_spmm(meta: ChunkMeta, meta_t: ChunkMeta, val, x,
                 interpret: bool = False, block_chunks: int = 0,
                 precision: str = "highest"):
    """Differentiable ``y = A(val) @ x`` for a FIXED sparsity structure
    with TRACED per-edge values (attention weights; reference
    alinet.py:674-676's softmax-weighted aggregation).

    Forward: scatter val into the chunk layout, gather P = x[col], run the
    sorted-segment matmul.  Backward: dx = A(val)^T @ g via the transpose
    meta; dval = SDDMM(g, x) — per-edge <g[row_e], x[col_e]> — gathered
    back from chunk slots.  Both paths stay on the MXU.

    ``meta``/``meta_t`` are ChunkMeta pytrees (metas_from_coo) and may be
    passed as jit arguments (device arrays) or closure constants (numpy).
    ``val`` is in the ORIGINAL edge order given to build_chunk_meta.
    ``block_chunks``: process S chunks at a time (metas must be built
    with pad_chunks_to=S) so only [S*EC, d] of gathered features lives at
    once — required at multi-million-edge scale.
    ``precision``: MXU pass count — 'highest' (f32-exact) or 'default'
    (one bf16 pass, f32 accumulate, ~2e-3 rel err)."""
    return _dyn_forward(meta, val, x, interpret, block_chunks, precision)


def _dyn_fwd(meta, meta_t, val, x, interpret, block_chunks, precision):
    return (_dyn_forward(meta, val, x, interpret, block_chunks, precision),
            (meta, meta_t, val, x))


def _dyn_bwd(interpret, block_chunks, precision, res, g):
    meta, meta_t, val, x = res
    d0 = x.shape[1]
    gp = _pad_lanes(g, precision)
    xp = _pad_lanes(x, precision)
    # dx = A^T @ g  (transpose structure, same traced values)
    val_t = _scatter_val(meta_t, val)
    if block_chunks and meta_t.window.shape[0] > block_chunks:
        dx = _blocked_segment_matmul(meta_t, val_t, gp, block_chunks,
                                     interpret,
                                     precision)[:meta_t.n_rows, :d0]
    else:
        pt = gp[jnp.asarray(meta_t.col)]
        dx = _sorted_segment_matmul(
            val_t, jnp.asarray(meta_t.rowloc), meta_t.window, meta_t.first,
            pt, meta_t.n_rows, meta_t.n_windows, interpret=interpret,
            precision=precision)[:meta_t.n_rows, :d0]
    # dval_e = <g[row_e], x[col_e]>: SDDMM over the forward layout
    if block_chunks and meta.window.shape[0] > block_chunks:
        dval_chunks = _blocked_sddmm(meta, xp, gp, block_chunks, interpret,
                                     precision)
    else:
        p = xp[jnp.asarray(meta.col)]
        gw = jnp.pad(gp, ((0, meta.n_windows * TM - gp.shape[0]), (0, 0)))
        dval_chunks = _sorted_segment_sddmm(
            jnp.asarray(meta.rowloc), meta.window, p, gw,
            meta.n_windows, interpret=interpret, precision=precision)
    dval = dval_chunks[jnp.asarray(meta.slots)].astype(val.dtype)
    return (_float0_zeros(meta), _float0_zeros(meta_t), dval,
            dx.astype(x.dtype))


dyn_csr_spmm.defvjp(_dyn_fwd, _dyn_bwd)


def make_dynamic_csr_spmm(meta: ChunkMeta, meta_t: ChunkMeta,
                          interpret: bool = False, block_chunks: int = 0,
                          precision: str = "highest"):
    """Closure form of dyn_csr_spmm for small static structures."""
    return lambda val, x: dyn_csr_spmm(meta, meta_t, val, x, interpret,
                                       block_chunks, precision)


# --------------------------------------------------------------------- #
# fully-fused attention SpMM (AliNet 2-hop aggregation)
# --------------------------------------------------------------------- #
#
# The dyn_csr_spmm route pays three per-edge SCALAR costs that dominate
# the attention path (profiled at the 100K shape, run/profile_dyn_spmm):
#   * the caller's s1[row] / s2[col] gathers (4-byte random reads),
#   * their autodiff transposes (scatter-adds of per-edge scalars),
#   * _scatter_val's [NC*EC] permutation gather (~40 ms of a 55 ms fwd).
# TPU HBM moves 512-byte rows well and lone floats terribly, so this op
# computes the per-edge logits INSIDE the kernel instead:
#   * s1[row] is window-local -> broadcast via the one-hot sel matrix
#     that the aggregation already builds (one tiny MXU contraction);
#   * s2[col] rides the feature gather as an extra column of `feats`
#     (the [x | 1] augmentation already pads 129 -> 256 lanes, so the
#     extra column is free);
#   * the static adjacency weights are pre-permuted into chunk layout
#     once on host (chunk_vals), never per step.
# Backward recomputes w in both edge orders (fwd structure for ds1,
# transpose structure for dfeats), so NO per-edge scalar ever crosses
# HBM in either direction.
#
# Semantics (reference alinet.py:581,674-676):
#   w_e = exp(leaky_relu(v_e * (s1[row_e] + s2[col_e]), 0.2))
#   out[r, :] = sum_{e: row_e = r} w_e * feats[col_e, :]
# feats must be [x | ones | s2 | 0-pad] with x having `d_agg` columns;
# out[:, :d_agg] is the weighted sum and out[:, d_agg] the softmax
# denominator (evals are bounded — |v*(s1+s2)| <= 2 max|v| for tanh
# scores — so no max shift is needed, same argument as the folded
# softmax in models/alinet.py).


def chunk_vals(meta: ChunkMeta, val: np.ndarray) -> np.ndarray:
    """Static per-edge values -> chunk layout [NC, 8, EC//8] (host numpy;
    pad slots 0).  The per-step permutation this replaces is a [NC*EC]
    scalar gather — ~40 ms at the 100K shape."""
    n_chunks = meta.window.shape[0]
    ext = np.concatenate([np.asarray(val, np.float32), np.zeros(1, np.float32)])
    return ext[np.asarray(meta.inv_slots)].reshape(n_chunks, 8, EC // 8)


def _att_edge_w(v, s1e, s2e):
    pre = v * (s1e + s2e)
    slope = jnp.where(pre >= 0, 1.0, 0.2)
    w = jnp.exp(pre * slope) * (v != 0).astype(jnp.float32)
    return w, slope


def _sel_dot(a, b, dims):
    """One-hot SELECTION contraction (each output element copies one
    input element, so there is no accumulation error): Mosaic lowers
    skinny dots either as broadcast-multiply (which rejects mixed
    dtypes) or as tpu.matmul (which demands a 32-bit accumulator), so
    cast BOTH operands to f32 up front."""
    return jax.lax.dot_general(a.astype(jnp.float32),
                               b.astype(jnp.float32), (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _att_fwd_kernel(win_ref, first_ref, val_ref, rowloc_ref, s1_ref, p_ref,
                    out_ref, *, d_agg: int, precision: str):
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    F = p_ref.shape[1]
    rl = rowloc_ref[0].reshape(1, EC)
    v = val_ref[0].reshape(1, EC)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (TM, EC), 0)
           == rl).astype(jnp.float32)
    # s1 per edge: window-local broadcast through the one-hot rows
    s1e = jax.lax.dot_general(s1_ref[:], sel, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [1, EC]
    # s2 per edge: the s2 column of the gathered features
    e_s2 = (jax.lax.broadcasted_iota(jnp.int32, (1, F), 1)
            == d_agg + 1).astype(p_ref.dtype)
    s2e = _sel_dot(e_s2, p_ref[:], ((1,), (1,)))                   # [1, EC]
    w, _ = _att_edge_w(v, s1e, s2e)
    s = (sel * w).astype(p_ref.dtype)
    out_ref[:] += jnp.dot(s, p_ref[:], preferred_element_type=jnp.float32,
                          precision=_PRECISIONS[precision])


def _att_ds1_kernel(win_ref, first_ref, val_ref, rowloc_ref, s1_ref, p_ref,
                    g_ref, ds1_ref, *, d_agg: int, precision: str):
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _():
        ds1_ref[:] = jnp.zeros_like(ds1_ref)

    F = p_ref.shape[1]
    rl = rowloc_ref[0].reshape(1, EC)
    v = val_ref[0].reshape(1, EC)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (TM, EC), 0)
           == rl).astype(jnp.float32)
    s1e = jax.lax.dot_general(s1_ref[:], sel, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    e_s2 = (jax.lax.broadcasted_iota(jnp.int32, (1, F), 1)
            == d_agg + 1).astype(p_ref.dtype)
    s2e = _sel_dot(e_s2, p_ref[:], ((1,), (1,)))
    w, slope = _att_edge_w(v, s1e, s2e)
    # dw_e = <g[row_e], feats[col_e]> — g rows beyond d_agg are zero by
    # construction, so the full-F contraction is exact
    m = jax.lax.dot_general(g_ref[:], p_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_PRECISIONS[precision])      # [TM, EC]
    dw = jnp.sum(sel * m, axis=0, keepdims=True)                  # [1, EC]
    beta = dw * w * slope * v                                     # dpre * v
    ds1_ref[:] += jax.lax.dot_general(sel, beta, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)


def _att_dfeats_kernel(win_ref, first_ref, val_ref, rowloc_ref, x_ref,
                       g_ref, out_ref, *, d_agg: int, precision: str):
    """Transpose-structure pass: per SOURCE row c,
    dfeats[c] = sum_e w_e * g_aug[row_e]  (+ the s2-column term).
    x_ref: feats rows of this T-window [TM, F]; g_ref: [g_aug | s1]
    gathered by the transpose col indices (= original rows) [EC, F]."""
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    F = x_ref.shape[1]
    rl = rowloc_ref[0].reshape(1, EC)
    v = val_ref[0].reshape(1, EC)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (TM, EC), 0)
           == rl).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, F), 1)
    e_s1 = (lane == d_agg + 1).astype(g_ref.dtype)   # s1 col of g_slim
    e_s2 = (lane == d_agg + 1).astype(x_ref.dtype)   # s2 col of feats
    gmask = (lane <= d_agg).astype(g_ref.dtype)      # g_aug cols 0..d_agg
    # s1 per edge from the gathered g_slim; s2 per edge from the resident
    # feats block (broadcast through the one-hot like the fwd s1)
    s1e = _sel_dot(e_s1, g_ref[:], ((1,), (1,)))                   # [1, EC]
    x_s2 = _sel_dot(x_ref[:], e_s2, ((1,), (1,)))                  # [TM, 1]
    s2e = jax.lax.dot_general(x_s2, sel, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [1, EC]
    w, slope = _att_edge_w(v, s1e, s2e)
    # dw_e = <g_aug[row_e], feats[col_e]>: mask BOTH sides to cols
    # 0..d_agg so the s1/s2 carrier columns don't pollute the contraction
    m = jax.lax.dot_general(x_ref[:] * gmask.astype(x_ref.dtype),
                            g_ref[:] * gmask,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_PRECISIONS[precision])      # [TM, EC]
    dw = jnp.sum(sel * m, axis=0, keepdims=True)
    beta = dw * w * slope * v                                     # [1, EC]
    main = jnp.dot((sel * w).astype(g_ref.dtype), g_ref[:] * gmask,
                   preferred_element_type=jnp.float32,
                   precision=_PRECISIONS[precision])              # [TM, F]
    ds2_win = jax.lax.dot_general(sel, beta, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    out_ref[:] += main + ds2_win * e_s2.astype(jnp.float32)


def _att_pallas_fwd(val_c, rowloc, window, first, s1p, p, n_windows: int,
                    d_agg: int, interpret: bool, precision: str):
    nc = window.shape[0]
    F = p.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((1, 8, EC // 8), lambda i, w, f: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, EC // 8), lambda i, w, f: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i, w, f: (w[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EC, F), lambda i, w, f: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, F), lambda i, w, f: (w[i], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_att_fwd_kernel, d_agg=d_agg, precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_windows * TM, F), jnp.float32),
        interpret=interpret,
    )(window, first, val_c, rowloc, s1p, p)


def _att_pallas_ds1(val_c, rowloc, window, first, s1p, p, gp,
                    n_windows: int, d_agg: int, interpret: bool,
                    precision: str):
    nc = window.shape[0]
    F = p.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((1, 8, EC // 8), lambda i, w, f: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, EC // 8), lambda i, w, f: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i, w, f: (w[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EC, F), lambda i, w, f: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, F), lambda i, w, f: (w[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, 1), lambda i, w, f: (w[i], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_att_ds1_kernel, d_agg=d_agg, precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_windows * TM, 1), jnp.float32),
        interpret=interpret,
    )(window, first, val_c, rowloc, s1p, p, gp)


def _att_pallas_dfeats(val_t, rowloc_t, window_t, first_t, xp, gT,
                       n_windows: int, d_agg: int, interpret: bool,
                       precision: str):
    nc = window_t.shape[0]
    F = xp.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((1, 8, EC // 8), lambda i, w, f: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, EC // 8), lambda i, w, f: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, F), lambda i, w, f: (w[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EC, F), lambda i, w, f: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, F), lambda i, w, f: (w[i], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_att_dfeats_kernel, d_agg=d_agg,
                          precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_windows * TM, F), jnp.float32),
        interpret=interpret,
    )(window_t, first_t, val_t, rowloc_t, xp, gT)


def _att_blocked(pallas_fn, meta: ChunkMeta, val_c, feats_src, S: int,
                 win_arrays, out_cols: int, interpret: bool,
                 precision: str):
    """Mega-chunked driver shared by the three attention passes: scan
    groups of S chunks so only [S*EC, F] of gathered rows materializes
    (see _blocked_segment_matmul).  ``feats_src`` is gathered by
    meta.col per mega; ``win_arrays`` are [n_windows*TM, k] per-window
    operands (s1 / g / x blocks) sliced at each mega's window offset."""
    NC = meta.window.shape[0]
    assert NC % S == 0, (NC, S)
    n_mega = NC // S
    F = feats_src.shape[1]
    W = S + 1
    win_m = jnp.asarray(meta.window).reshape(n_mega, S)
    first_m = jnp.asarray(meta.first).reshape(n_mega, S).at[:, 0].set(1)
    cols_m = jnp.asarray(meta.col).reshape(n_mega, S * EC)
    val_m = val_c.reshape(n_mega, S, 8, EC // 8)
    rowloc_m = jnp.asarray(meta.rowloc).reshape(n_mega, S, 8, EC // 8)
    pad_rows_n = meta.n_windows * TM + W * TM
    win_padded = [jnp.pad(a, ((0, pad_rows_n - a.shape[0]), (0, 0)))
                  for a in win_arrays]
    out0 = jnp.zeros((pad_rows_n, out_cols), jnp.float32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (W * TM, 1), 0)

    def body(out, args):
        w, f, c, v, rl = args
        w0 = w[0]
        p = feats_src[c]
        segs = [jax.lax.dynamic_slice(a, (w0 * TM, 0), (W * TM, a.shape[1]))
                for a in win_padded]
        mega = pallas_fn(v, rl, w - w0, f, *segs, p)
        mega = jnp.where(row_ids < (w[-1] - w0 + 1) * TM, mega, 0.0)
        seg = jax.lax.dynamic_slice(out, (w0 * TM, 0), (W * TM, out_cols))
        return jax.lax.dynamic_update_slice(out, seg + mega, (w0 * TM, 0)), None

    out, _ = jax.lax.scan(body, out0, (win_m, first_m, cols_m, val_m,
                                       rowloc_m))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def att_spmm(meta: ChunkMeta, meta_t: ChunkMeta, val_c, val_t, s1, feats,
             d_agg: int, interpret: bool = False, block_chunks: int = 0,
             precision: str = "highest"):
    """Fused attention aggregation y[r] = sum_e w_e * feats[col_e] with
    w_e = exp(leaky_relu(v_e * (s1[row_e] + s2[col_e]), 0.2)) computed
    IN-KERNEL (see the section comment above for why).

    feats [n, F]: [x (d_agg) | ones | s2 | 0-pad to a lane multiple];
    returns [n, F] whose first d_agg columns are the weighted sums and
    column d_agg the denominator.  val_c / val_t: static chunk-layout
    edge weights (chunk_vals(meta, val) / chunk_vals(meta_t, val)).

    Differentiable in s1 and feats, with one CONTRACT RESTRICTION: the
    loss must only read output columns 0..d_agg (sums + denominator).
    Column d_agg+1 of the output (the spurious s2-aggregate) is a
    byproduct the backward repurposes as the s1 carrier through the g
    gather, so its incoming cotangent is discarded — a loss that reads
    it gets silently wrong dfeats.  Columns past d_agg+1 are zero-pad.
    The in-tree caller (AliNet attention) only reads [:, :d_agg+1]."""
    return _att_forward(meta, val_c, s1, feats, d_agg, interpret,
                        block_chunks, precision)


def _att_cast(x, precision):
    return x.astype(jnp.bfloat16 if precision == "default" else jnp.float32)


def _att_forward(meta, val_c, s1, feats, d_agg, interpret, block_chunks,
                 precision):
    xp = _att_cast(feats, precision)
    s1p = jnp.zeros((meta.n_windows * TM, 1), jnp.float32)
    s1p = s1p.at[:s1.shape[0], 0].set(s1)
    val_j = jnp.asarray(val_c)
    if block_chunks and meta.window.shape[0] > block_chunks:
        fn = functools.partial(
            lambda v, rl, w, f, s1seg, p: _att_pallas_fwd(
                v, rl, w, f, s1seg, p, block_chunks + 1, d_agg, interpret,
                precision))
        out = _att_blocked(fn, meta, val_j, xp, block_chunks, [s1p],
                           xp.shape[1], interpret, precision)
    else:
        p = xp[jnp.asarray(meta.col)]
        out = _att_pallas_fwd(val_j, jnp.asarray(meta.rowloc), meta.window,
                              meta.first, s1p, p, meta.n_windows, d_agg,
                              interpret, precision)
    return out[:meta.n_rows]


def _att_fwd_rule(meta, meta_t, val_c, val_t, s1, feats, d_agg, interpret,
                  block_chunks, precision):
    out = _att_forward(meta, val_c, s1, feats, d_agg, interpret,
                       block_chunks, precision)
    return out, (meta, meta_t, val_c, val_t, s1, feats)


def _att_bwd_rule(d_agg, interpret, block_chunks, precision, res, g):
    meta, meta_t, val_c, val_t, s1, feats = res
    n = feats.shape[0]
    F = feats.shape[1]
    xp = _att_cast(feats, precision)
    val_j = jnp.asarray(val_c)
    val_tj = jnp.asarray(val_t)
    s1p = jnp.zeros((meta.n_windows * TM, 1), jnp.float32)
    s1p = s1p.at[:n, 0].set(s1)
    gp = _att_cast(jnp.pad(g.astype(jnp.float32),
                           ((0, meta.n_windows * TM - n), (0, 0))),
                   precision)

    # ds1: forward edge structure, per-window accumulation
    if block_chunks and meta.window.shape[0] > block_chunks:
        fn = functools.partial(
            lambda v, rl, w, f, s1seg, gseg, p: _att_pallas_ds1(
                v, rl, w, f, s1seg, p, gseg, block_chunks + 1, d_agg,
                interpret, precision))
        ds1 = _att_blocked(fn, meta, val_j, xp, block_chunks, [s1p, gp],
                           1, interpret, precision)
    else:
        p = xp[jnp.asarray(meta.col)]
        ds1 = _att_pallas_ds1(val_j, jnp.asarray(meta.rowloc), meta.window,
                              meta.first, s1p, p, gp, meta.n_windows,
                              d_agg, interpret, precision)
    ds1 = ds1[:n, 0]

    # dfeats: transpose edge structure; s1 rides the g gather as the
    # column d_agg+1 carrier (g's own column there is the spurious
    # s2-aggregate output the caller never reads, i.e. zero)
    g_slim = g.astype(jnp.float32).at[:, d_agg + 1].set(s1)
    g_slim = _att_cast(g_slim, precision)
    xw = jnp.pad(xp, ((0, meta_t.n_windows * TM - n), (0, 0)))
    if block_chunks and meta_t.window.shape[0] > block_chunks:
        fn = functools.partial(
            lambda v, rl, w, f, xseg, gT: _att_pallas_dfeats(
                v, rl, w, f, xseg, gT, block_chunks + 1, d_agg, interpret,
                precision))
        dfeats = _att_blocked(fn, meta_t, val_tj, g_slim, block_chunks,
                              [xw], F, interpret, precision)
    else:
        gT = g_slim[jnp.asarray(meta_t.col)]
        dfeats = _att_pallas_dfeats(val_tj, jnp.asarray(meta_t.rowloc),
                                    meta_t.window, meta_t.first, xw, gT,
                                    meta_t.n_windows, d_agg, interpret,
                                    precision)
    dfeats = dfeats[:n].astype(feats.dtype)
    return (_float0_zeros(meta), _float0_zeros(meta_t),
            _float0_zeros(val_c), _float0_zeros(val_t),
            ds1.astype(s1.dtype), dfeats)


att_spmm.defvjp(_att_fwd_rule, _att_bwd_rule)


def metas_from_coo(row: np.ndarray, col: np.ndarray, n_rows: int,
                   n_cols: int | None = None, pad_chunks_to: int = 1):
    """(meta, meta_T) pair for make_dynamic_csr_spmm / dyn_csr_spmm."""
    n_cols = n_rows if n_cols is None else n_cols
    return (build_chunk_meta(row, col, n_rows, pad_chunks_to),
            build_chunk_meta(col, row, n_cols, pad_chunks_to))
