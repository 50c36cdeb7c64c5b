"""Sharded-SpMM scaling: edges/s at 1..8 devices, boundary exchange vs
all_gather.

On this image only virtual CPU devices are available (one real TPU chip,
no multi-chip pod), so absolute numbers measure the partitioning +
collective overhead on a shared host, not ICI; the quantity that
transfers to a pod is the per-step collective VOLUME, which is also
printed (all_gather moves N*d floats per shard; boundary exchange moves
S*r*d).

Usage: python run/bench_spmm_scaling.py [n_nodes] [avg_degree] [dim]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    avg_deg = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    from openea_tpu.ops.graph import build_sparse, spmm
    from openea_tpu.parallel.spmm_sharded import (
        boundary_spmm, partition_adj, plan_boundary_exchange, sharded_spmm)

    rng = np.random.RandomState(0)
    # power-law-ish degrees like a KG (frequency-sorted ids: low ids dense)
    deg = np.clip((1.0 / rng.power(0.45, n)).astype(np.int64), 1, 1000)
    deg = (deg * (avg_deg * n / deg.sum())).astype(np.int64)
    deg = np.maximum(deg, 1)
    locality = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
    rows = np.repeat(np.arange(n), deg).astype(np.int32)
    cols = rng.randint(0, n, rows.shape[0]).astype(np.int32)
    if locality > 0:
        # partitioned-for-locality graph: a `locality` fraction of edges
        # point inside the row's own 8-way block (what a min-cut entity
        # reordering buys in production; random cols are the worst case)
        blk = n // 8
        local = rng.rand(rows.shape[0]) < locality
        cols[local] = ((rows[local] // blk) * blk
                       + rng.randint(0, blk, int(local.sum()))).astype(np.int32)
    vals = rng.rand(rows.shape[0]).astype(np.float32)
    nnz = rows.shape[0]
    adj = build_sparse(rows, cols, vals, n)
    x = jnp.asarray(rng.randn(n, dim).astype(np.float32))

    def timeit(fn, reps=5):
        fn()  # compile
        t = time.time()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        return (time.time() - t) / reps

    base_s = timeit(lambda: spmm(adj, x))
    print(f"single-device segment-sum: nnz={nnz} {base_s*1e3:.1f} ms "
          f"= {nnz/base_s/1e6:.1f} M edges/s")

    for n_dev in (2, 4, 8):
        mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("x",))
        plan = plan_boundary_exchange(adj, n_dev)
        b_s = timeit(lambda: boundary_spmm(mesh, plan, x))
        sadj = partition_adj(adj, n_dev)
        g_s = timeit(lambda: sharded_spmm(mesh, sadj, x))
        vol_gather = n * dim * 4 / 1e6
        # self-block of the all_to_all stays on-device; ICI volume is
        # the (S-1) remote blocks of r padded boundary rows each
        vol_bound = (n_dev - 1) * plan.r * dim * 4 / 1e6
        eff_b = base_s / b_s / n_dev
        print(f"{n_dev} dev: boundary {b_s*1e3:.1f} ms "
              f"({nnz/b_s/1e6:.1f} M e/s, eff {eff_b*100:.0f}%, "
              f"vol {vol_bound:.1f} MB/shard) | all_gather {g_s*1e3:.1f} ms "
              f"({nnz/g_s/1e6:.1f} M e/s, vol {vol_gather:.1f} MB/shard) | "
              f"boundary/gather vol = {vol_bound/vol_gather:.2f}")


if __name__ == "__main__":
    main()
