"""Piecewise timing of the dynamic-value SpMM path (AliNet attention) —
the round-2 roofline shows it at 0.044 G edges/s vs the static kernel's
0.184 on identical structure, so ~4x is being lost OUTSIDE the Pallas
kernel.  This times each stage in isolation at the 100K shape.

Run on the chip: python run/profile_dyn_spmm.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, warmup=2, iters=10):
    import jax

    def sync(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        np.asarray(leaf if leaf.ndim == 0 else leaf.ravel()[:1])

    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_scratch")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from openea_tpu.ops import spmm_pallas as sp

    n, nnz, d = 200_000, 2_400_000, 128
    rng = np.random.RandomState(0)
    row = rng.randint(0, n, nnz).astype(np.int32)
    col = rng.randint(0, n, nnz).astype(np.int32)
    val = rng.rand(nnz).astype(np.float32)
    x = rng.randn(n, d).astype(np.float32)
    xj = jnp.asarray(x)
    vj = jnp.asarray(val)

    S = 1024
    meta, meta_t = sp.metas_from_coo(row, col, n, pad_chunks_to=S)
    meta, meta_t = meta.device_put(), meta_t.device_put()
    NC = meta.window.shape[0]
    print(f"chunks={NC}, mega={NC // S} (S={S}), windows={meta.n_windows}",
          flush=True)

    # stage 1: value scatter into chunk layout
    f_scat = jax.jit(lambda m, v: sp._scatter_val(m, v))
    print("scatter_val              {:8.2f} ms".format(
        1e3 * timeit(f_scat, meta, vj)), flush=True)

    # stage 2: the P gather alone (full, not mega-chunked)
    f_gath = jax.jit(lambda m, xx: xx[m.col])
    print("P gather (full)          {:8.2f} ms".format(
        1e3 * timeit(f_gath, meta, xj)), flush=True)

    # stage 3: kernel alone on pre-gathered P (full)
    val_c = f_scat(meta, vj)
    p = f_gath(meta, xj)
    f_kern = jax.jit(lambda m, v, pp: sp._sorted_segment_matmul(
        v, m.rowloc, m.window, m.first, pp, m.n_rows, m.n_windows))
    print("segment matmul (full)    {:8.2f} ms".format(
        1e3 * timeit(f_kern, meta, val_c, p)), flush=True)

    # stage 4: the blocked (mega-chunked) path as used at 100K
    f_blk = jax.jit(lambda m, v, xx: sp._blocked_segment_matmul(
        m, v, xx, S, False))
    print("blocked segment matmul   {:8.2f} ms".format(
        1e3 * timeit(f_blk, meta, val_c, xj)), flush=True)

    # stage 5: full dyn forward (what AliNet runs)
    f_dyn = jax.jit(lambda m, mt, v, xx: sp.dyn_csr_spmm(m, mt, v, xx,
                                                         False, S))
    print("dyn forward (blocked)    {:8.2f} ms".format(
        1e3 * timeit(f_dyn, meta, meta_t, vj, xj)), flush=True)

    # stage 6: full dyn forward WITHOUT mega-chunking (S=0) — peak memory
    # is the full [NC*EC, d] gather (3.1M x 128 f32 = 1.6 GB, fits HBM)
    f_dyn0 = jax.jit(lambda m, mt, v, xx: sp.dyn_csr_spmm(m, mt, v, xx,
                                                          False, 0))
    print("dyn forward (unblocked)  {:8.2f} ms".format(
        1e3 * timeit(f_dyn0, meta, meta_t, vj, xj)), flush=True)

    # reference: static plan forward on the same structure
    plan, plan_t = sp.plans_from_coo(row, col, val, n)
    f_stat = jax.jit(sp.make_csr_spmm(plan, plan_t))
    print("static forward           {:8.2f} ms".format(
        1e3 * timeit(f_stat, xj)), flush=True)


if __name__ == "__main__":
    raise SystemExit(main())
