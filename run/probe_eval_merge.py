"""Eval merge-bound experiments (VERDICT r4 weak #5).

The 100K both-family inner eval (81.7 ms) sits ~3.7x above its
pure-matmul floor, bounded by the VPU k-step extract-max merge in
topk_means plus the rank counters.  This probe measures the two
remaining static knobs — column-tile width (amortizes the +acc lanes
per extraction sweep) and the running-accumulator lane count — plus the
e2e both-family pass, to either find <60 ms or close the avenue with
numbers.

Usage: python run/probe_eval_merge.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from openea_tpu.ops import pallas_kernels as pk  # noqa: E402
from openea_tpu.ops.ranking import rank_and_argmax_both  # noqa: E402


def sync(x):
    leaves = [v for v in jax.tree_util.tree_leaves(x)
              if hasattr(v, "reshape")]
    float(jnp.sum(leaves[-1].reshape(-1)[:1]))


def timeit(fn, *args, n=5, **kw):
    sync(fn(*args, **kw))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
    sync(out)
    return (time.time() - t0) / n


def main():
    n1, n2, d, k = 30000, 70000, 128, 10
    key = jax.random.PRNGKey(0)
    e1 = jax.random.normal(key, (n1, d))
    e2 = jax.random.normal(jax.random.PRNGKey(1), (n2, d))
    gold = jnp.arange(n1, dtype=jnp.int32) % n2

    t = timeit(rank_and_argmax_both, e1, e2, gold, metric="inner",
               csls_k=k)
    print("e2e both-family inner (current): %.1f ms" % (t * 1e3))

    # r2 statistic alone: topk_means over [n2, n1]
    base = timeit(pk.topk_means, e2, e1, k, metric="inner")
    print("topk_means r2 pass (default tiles): %.1f ms" % (base * 1e3))

    for tm, tn in ((256, 512), (256, 1024), (256, 2048), (512, 1024),
                   (512, 2048), (128, 2048), (512, 4096)):
        try:
            t = timeit(pk.topk_means, e2, e1, k, metric="inner",
                       tm=tm, tn=tn)
            print("topk_means tm=%d tn=%d: %.1f ms" % (tm, tn, t * 1e3))
        except Exception as ex:
            print("topk_means tm=%d tn=%d: FAIL %s" % (tm, tn,
                                                       str(ex)[:80]))

    # accumulator-lane variant: _TKLANES=32 shrinks every extraction
    # sweep by (tn+128)->(tn+32) lanes
    ref = np.asarray(pk.topk_means(e2, e1, k, metric="inner"))
    old = pk._TKLANES
    try:
        pk._TKLANES = 32
        pk.topk_means.clear_cache()   # the global is read at trace time
        for tm, tn in ((256, 512), (512, 1024), (256, 2048)):
            t = timeit(pk.topk_means, e2, e1, k, metric="inner",
                       tm=tm, tn=tn)
            out = np.asarray(pk.topk_means(e2, e1, k, metric="inner",
                                           tm=tm, tn=tn))
            exact = np.array_equal(out, ref)
            print("topk_means TKLANES=32 tm=%d tn=%d: %.1f ms (exact=%s)"
                  % (tm, tn, t * 1e3, exact))
    finally:
        pk._TKLANES = old
        pk.topk_means.clear_cache()

    # rank pass alone for the decomposition
    t = timeit(pk.inner_rank_both, e1, e2, gold, csls=False)
    print("inner_rank_both plain-only: %.1f ms" % (t * 1e3))


if __name__ == "__main__":
    main()
