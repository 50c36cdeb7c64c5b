"""Per-component timing of the AliNet attention step at 15K shape."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_scratch")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from openea_tpu.ops.graph import build_sparse, segment_softmax, \
    segmented_weighted_gather_sum
from openea_tpu.ops.spmm_pallas import dyn_csr_spmm, metas_from_coo

n, nnz, d = 15000, 13_100_000, 400
rng = np.random.RandomState(0)
row = np.sort(rng.randint(0, n, nnz).astype(np.int32))
col = rng.randint(0, n, nnz).astype(np.int32)
val = rng.rand(nnz).astype(np.float32)
x = jnp.asarray(rng.randn(n, d).astype(np.float32))
vj = jnp.asarray(val)
rowj, colj = jnp.asarray(row), jnp.asarray(col)

def timeit(fn, *a, iters=5):
    def sync(o):
        # block_until_ready is not a reliable fence over the axon tunnel;
        # a D2H read of the last output is (program order on the stream)
        leaf = jax.tree_util.tree_leaves(o)[0]
        np.asarray(leaf if leaf.ndim == 0 else leaf.ravel()[:1])
    sync(fn(*a)); sync(fn(*a))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*a)
    sync(out)
    return (time.time() - t0) / iters

S = 1024
meta, meta_t = metas_from_coo(row, col, n, pad_chunks_to=S)
meta, meta_t = meta.device_put(), meta_t.device_put()

# row/col as jit ARGS: a closure device array is lifted into the HLO as
# a constant and blows the tunnel's compile-request size cap (HTTP 413)
f_soft = jax.jit(lambda v, r: segment_softmax(v, r, n))
print("segment_softmax          %7.1f ms" % (1e3*timeit(f_soft, vj, rowj)), flush=True)

f_evals = jax.jit(lambda v, r, c, s1, s2: jax.nn.leaky_relu(v*s1[r]+v*s2[c], negative_slope=0.2))
s1 = jnp.asarray(rng.randn(n).astype(np.float32)); s2 = jnp.asarray(rng.randn(n).astype(np.float32))
print("evals (2 gathers)        %7.1f ms" % (1e3*timeit(f_evals, vj, rowj, colj, s1, s2)), flush=True)

f_dyn = jax.jit(lambda m, mt, v, xx: dyn_csr_spmm(m, mt, v, xx, False, S))
print("dyn spmm fwd             %7.1f ms" % (1e3*timeit(f_dyn, meta, meta_t, vj, x)), flush=True)
f_dyn_bf = jax.jit(lambda m, mt, v, xx: dyn_csr_spmm(m, mt, v, xx, False, S, "default"))
print("dyn spmm fwd bf16        %7.1f ms" % (1e3*timeit(f_dyn_bf, meta, meta_t, vj, x)), flush=True)
g_dyn = jax.jit(jax.grad(lambda v, xx, m, mt: jnp.sum(jnp.tanh(
    dyn_csr_spmm(m, mt, v, xx, False, S))), argnums=(0,1)))
print("dyn spmm fwd+bwd         %7.1f ms" % (1e3*timeit(g_dyn, vj, x, meta, meta_t)), flush=True)
g_dyn_bf = jax.jit(jax.grad(lambda v, xx, m, mt: jnp.sum(jnp.tanh(
    dyn_csr_spmm(m, mt, v, xx, False, S, "default"))), argnums=(0,1)))
print("dyn spmm fwd+bwd bf16    %7.1f ms" % (1e3*timeit(g_dyn_bf, vj, x, meta, meta_t)), flush=True)

f_xla = jax.jit(lambda v, xx, r, c: segmented_weighted_gather_sum(r, c, v, xx, n))
print("xla gather-sum fwd       %7.1f ms" % (1e3*timeit(f_xla, vj, x, rowj, colj)), flush=True)
g_xla = jax.jit(jax.grad(lambda v, xx, r, c: jnp.sum(jnp.tanh(
    segmented_weighted_gather_sum(r, c, v, xx, n))), argnums=(0,1)))
print("xla gather-sum fwd+bwd   %7.1f ms" % (1e3*timeit(g_xla, vj, x, rowj, colj)), flush=True)
