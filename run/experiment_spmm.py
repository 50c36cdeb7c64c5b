"""Static-SpMM experiments toward the >=0.4 G edges/s target (VERDICT r2
#3) at the 100K shape, plus the bucket-density measurement for the
proposed two-level (row-window x col-block) gather-free tiling.

Host-side analysis (no chip needed): --buckets
Chip experiments: --chip [--ec 2048] [--colsort]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def powerlaw_graph(n, nnz, seed=0, alpha=1.0):
    """Degree-skewed COO with freq-sorted ids (low id = high degree),
    mimicking data/read.py's interleaved frequency ordering."""
    rng = np.random.RandomState(seed)
    # zipf-ish column distribution over sorted ids
    p = 1.0 / np.arange(1, n + 1) ** alpha
    p /= p.sum()
    col = rng.choice(n, nnz, p=p).astype(np.int32)
    row = rng.choice(n, nnz, p=p).astype(np.int32)
    return row, col


def bucket_density(n, nnz, tm=128, cbs=(256, 512, 1024), alpha=1.0):
    """Edges per nonempty (row-window x col-block) bucket — the quantity
    that decides whether densifying A tile-by-tile (one-hot matmuls with
    the x block VMEM-resident) can amortize.  The one-hot construction
    costs TM*CB*d MACs per bucket-chunk, so buckets need O(EC) edges to
    beat the gather path."""
    row, col = powerlaw_graph(n, nnz, alpha=alpha)
    print(f"n={n} nnz={nnz} alpha={alpha}")
    for cb in cbs:
        keys = (row.astype(np.int64) // tm) * ((n + cb - 1) // cb) \
            + col.astype(np.int64) // cb
        _, counts = np.unique(keys, return_counts=True)
        total_buckets = ((n + tm - 1) // tm) * ((n + cb - 1) // cb)
        print(f"  [{tm} x {cb:>4}] nonempty={len(counts):>9,} "
              f"({100 * len(counts) / total_buckets:.2f}% of "
              f"{total_buckets:,}), edges/bucket mean={counts.mean():.2f} "
              f"p50={np.percentile(counts, 50):.0f} "
              f"p99={np.percentile(counts, 99):.0f} max={counts.max()}")
        # cost model: one-hot densify = TM*CB*d MACs per bucket vs the
        # gather path's ~3 HBM passes of d floats per edge
        d = 128
        onehot_macs = len(counts) * tm * cb * d
        gather_bytes = 3 * nnz * d * 4
        # v5e: ~200e12 bf16 MAC/s, ~819e9 B/s
        print(f"    densify-lower-bound {onehot_macs / 200e12 * 1e3:.1f} ms"
              f" vs gather-path {gather_bytes / 819e9 * 1e3:.1f} ms")


def chip(ec, colsort, scale):
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_scratch")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from openea_tpu.ops import spmm_pallas as sp
    if ec:
        sp.EC = ec

    if scale == "100K":
        n, nnz, d = 200_000, 2_400_000, 128
    else:
        n, nnz, d = 30_000, 400_000, 128
    rng = np.random.RandomState(0)
    row = rng.randint(0, n, nnz).astype(np.int32)
    col = rng.randint(0, n, nnz).astype(np.int32)
    val = rng.rand(nnz).astype(np.float32)
    x = rng.randn(n, d).astype(np.float32)
    xj = jnp.asarray(x)

    if colsort:
        # secondary col sort within each row window: gather indices become
        # near-sorted per window segment -> HBM locality for the XLA gather
        win = row // sp.TM
        order = np.lexsort((col, win))
        row, col, val = row[order], col[order], val[order]

    def timeit(fn, *args, iters=10):
        def sync(o):
            leaf = jax.tree_util.tree_leaves(o)[0]
            np.asarray(leaf.ravel()[:1])
        for _ in range(2):
            sync(fn(*args))
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        return (time.time() - t0) / iters

    plan, plan_t = sp.plans_from_coo(row, col, val, n)
    colj = jnp.asarray(plan.col)

    f_gather = jax.jit(lambda c, xx: xx[c])
    t_g = timeit(f_gather, colj, xj)
    nc = plan.window.shape[0]
    gbytes = (nc * sp.EC * d * 4 * 2 + nnz * 4)   # read x + write P
    print(f"EC={sp.EC} colsort={colsort}: gather alone "
          f"{t_g * 1e3:8.2f} ms ({gbytes / t_g / 1e9:.0f} GB/s eff)")

    p = f_gather(colj, xj)
    f_k = jax.jit(lambda v, rl, w, f, pp: sp._sorted_segment_matmul(
        v, rl, w, f, pp, plan.n_rows, plan.n_windows))
    t_k = timeit(f_k, jnp.asarray(plan.val), jnp.asarray(plan.rowloc),
                 plan.window, plan.first, p)
    kbytes = nc * sp.EC * d * 4 + plan.n_windows * sp.TM * d * 4
    print(f"                      kernel alone "
          f"{t_k * 1e3:8.2f} ms ({kbytes / t_k / 1e9:.0f} GB/s eff)")

    f_full = jax.jit(sp.make_csr_spmm(plan, plan_t))
    t_f = timeit(f_full, xj)
    print(f"                      full fwd     "
          f"{t_f * 1e3:8.2f} ms ({nnz / t_f / 1e9:.3f} G edges/s)")
    f_fb = jax.jit(jax.grad(lambda xx: jnp.sum(jnp.tanh(f_full(xx)))))
    t_fb = timeit(f_fb, xj)
    print(f"                      fwd+bwd      "
          f"{t_fb * 1e3:8.2f} ms ({2 * nnz / t_fb / 1e9:.3f} G edges/s)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", action="store_true")
    ap.add_argument("--chip", action="store_true")
    ap.add_argument("--ec", type=int, default=0)
    ap.add_argument("--colsort", action="store_true")
    ap.add_argument("--scale", default="100K")
    ap.add_argument("--alpha", type=float, default=1.0)
    args = ap.parse_args()
    if args.buckets:
        bucket_density(200_000, 2_400_000, alpha=args.alpha)
    if args.chip:
        chip(args.ec, args.colsort, args.scale)


if __name__ == "__main__":
    main()
