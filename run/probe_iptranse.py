"""Ablation probe for the IPTransE 100K epoch cost (VERDICT r4 weak #1).

Loads the cached mined paths (run `run/bench_models.py iptranse_100k`
once to populate /tmp/openea_tpu_cache) and times the jitted epoch scan
under controlled ablations, so the 3.05 s/epoch decomposes into
attributable parts instead of a plausible story.

Usage: python run/probe_iptranse.py [variants...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from openea_tpu.ops.initializers import l2_normalize  # noqa: E402
from openea_tpu.ops.optim import get_optimizer  # noqa: E402

CACHE = "/tmp/openea_tpu_cache/iptranse_paths_843eef39f96894ac00d82e5876e00c35.npz"

N_ENT = 200_000
DIM = 100
STEPS = 32
MARGIN = 1.5
PATH_PARM = 0.1
LR = 0.01


def _sync(out):
    """block_until_ready is a no-op over the axon tunnel — force a real
    device->host fetch of one scalar element to synchronize."""
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "reshape")]
    float(jnp.sum(leaves[-1].reshape(-1)[:1]))


def timeit(fn, *args, n=4, warmup=1):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / n


def main():
    variants = sys.argv[1:] or ["triples", "paths", "paths_noperm",
                                "paths_bf16", "micro"]
    z = np.load(CACHE)
    paths_np, w_np = z["paths"], z["path_w"]
    n_paths = len(paths_np)
    R = int(paths_np.max()) + 1
    path_bs = n_paths // STEPS
    print("n_paths=%d R=%d path_bs=%d steps=%d" % (n_paths, R, path_bs,
                                                   STEPS))
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "ent_embeds": jax.random.normal(k1, (N_ENT, DIM)) * 0.01,
        "rel_embeds": jax.random.normal(k2, (R, DIM)) * 0.01,
    }
    opt = get_optimizer("Adagrad", LR)
    opt_state = opt.init(params)
    paths_dev = jnp.asarray(paths_np)
    w_dev = jnp.asarray(w_np)
    # fake triple batches [steps, 20000, 3]
    trip = jax.random.randint(k3, (STEPS, 20000, 3), 0, N_ENT // 2)
    trip = trip.at[:, :, 1].set(trip[:, :, 1] % R)

    def rel_lookup(p, idx, dtype=None):
        rel = l2_normalize(p["rel_embeds"])
        if dtype is not None:
            rel = rel.astype(dtype)
        return rel[idx]

    def ent_lookup(p, tri):
        ent = l2_normalize(p["ent_embeds"])
        rel = l2_normalize(p["rel_embeds"])
        return ent[tri[:, 0]], rel[tri[:, 1]], ent[tri[:, 2]]

    def make_epoch(mode, gather_dtype=None, permute=True):
        def epoch(params, opt_state, key, paths_c, w_c):
            kp, kscan = jax.random.split(key)
            if permute:
                pperm = jax.random.permutation(kp, n_paths)
            else:
                pperm = jnp.arange(n_paths)
            rows = STEPS * path_bs
            pidx = pperm[:rows].reshape(STEPS, path_bs)
            step_keys = jax.random.split(kscan, STEPS)

            def step(carry, xs):
                params, opt_state = carry
                pb, sk, pos = xs

                def loss_fn(p):
                    total = 0.0
                    if mode in ("triples", "full"):
                        ph, pr, pt = ent_lookup(p, pos)
                        neg = pos.at[:, 0].set(
                            jax.random.randint(sk, (pos.shape[0],), 0,
                                               N_ENT // 2))
                        nh, nr_, nt = ent_lookup(p, neg)
                        ps = jnp.sum(jnp.square(ph + pr - pt), axis=-1)
                        ns = jnp.sum(jnp.square(nh + nr_ - nt), axis=-1)
                        total += jnp.sum(jax.nn.relu(ps + MARGIN - ns))
                    if mode in ("paths", "full"):
                        ppath = paths_c[pb]
                        pw = w_c[pb]
                        neg_r = jax.random.randint(sk, (path_bs,), 0, R)
                        rx = rel_lookup(p, ppath[:, 0], gather_dtype)
                        ry = rel_lookup(p, ppath[:, 1], gather_dtype)
                        r = rel_lookup(p, ppath[:, 2], gather_dtype)
                        nr = rel_lookup(p, neg_r, gather_dtype)
                        pos_p = jnp.sum(jnp.square((rx + ry - r)
                                                   .astype(jnp.float32)),
                                        axis=-1)
                        neg_p = jnp.sum(jnp.square((rx + ry - nr)
                                                   .astype(jnp.float32)),
                                        axis=-1)
                        total += PATH_PARM * jnp.sum(
                            (1.0 / pw) * jax.nn.relu(pos_p + MARGIN - neg_p))
                    return total

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), (pidx, step_keys, trip))
            return params, opt_state, jnp.sum(losses)

        return jax.jit(epoch)

    if "triples" in variants:
        fn = make_epoch("triples")
        print("triples-only epoch: %.3f s" % timeit(
            fn, params, opt_state, key, paths_dev, w_dev))
    if "paths" in variants:
        fn = make_epoch("paths")
        print("paths-only epoch (current form): %.3f s" % timeit(
            fn, params, opt_state, key, paths_dev, w_dev))
    if "full" in variants:
        fn = make_epoch("full")
        print("full epoch (current form): %.3f s" % timeit(
            fn, params, opt_state, key, paths_dev, w_dev))
    if "paths_noperm" in variants:
        fn = make_epoch("paths", permute=False)
        print("paths-only, no permutation gather: %.3f s" % timeit(
            fn, params, opt_state, key, paths_dev, w_dev))
    if "paths_bf16" in variants:
        fn = make_epoch("paths", gather_dtype=jnp.bfloat16)
        print("paths-only, bf16 rel gathers: %.3f s" % timeit(
            fn, params, opt_state, key, paths_dev, w_dev))

    if "micro" in variants:
        # isolate: the [n_paths] permutation row gather of the path table
        @jax.jit
        def perm_gather(key, paths_c, w_c):
            pperm = jax.random.permutation(key, n_paths)
            return paths_c[pperm], w_c[pperm]
        print("micro perm-gather of paths+w: %.3f s" % timeit(
            perm_gather, key, paths_dev, w_dev))

        # isolate: rel row gathers fwd only, one step's batch
        pb = jnp.asarray(np.arange(path_bs), jnp.int32)

        @jax.jit
        def gathers_fwd(params, paths_c, w_c, pb):
            ppath = paths_c[pb]
            rel = l2_normalize(params["rel_embeds"])
            rx, ry, r = rel[ppath[:, 0]], rel[ppath[:, 1]], rel[ppath[:, 2]]
            return jnp.sum(jnp.square(rx + ry - r))
        print("micro one-step rel gathers + fwd: %.4f s (x%d steps = %.3f)"
              % (timeit(gathers_fwd, params, paths_dev, w_dev, pb), STEPS,
                 timeit(gathers_fwd, params, paths_dev, w_dev, pb) * STEPS))

        # isolate: fwd+bwd of one step's path loss (scatter-add backward)
        @jax.jit
        def gathers_fwdbwd(params, paths_c, w_c, pb):
            def f(p):
                ppath = paths_c[pb]
                rel = l2_normalize(p["rel_embeds"])
                rx, ry, r = (rel[ppath[:, 0]], rel[ppath[:, 1]],
                             rel[ppath[:, 2]])
                return jnp.sum(jnp.square(rx + ry - r))
            return jax.grad(f)(params)
        print("micro one-step rel gathers fwd+BWD: %.4f s (x%d = %.3f)"
              % (timeit(gathers_fwdbwd, params, paths_dev, w_dev, pb), STEPS,
                 timeit(gathers_fwdbwd, params, paths_dev, w_dev, pb) * STEPS))

        # isolate: dense Adagrad full-table update, 32 steps
        @jax.jit
        def adagrad_only(params, opt_state):
            def step(carry, _):
                p, s = carry
                g = jax.tree_util.tree_map(jnp.ones_like, p)
                u, s = opt.update(g, s, p)
                return (optax.apply_updates(p, u), s), 0.0
            (p, s), _ = jax.lax.scan(step, (params, opt_state),
                                     jnp.arange(STEPS))
            return p
        print("micro dense Adagrad x32: %.3f s" % timeit(
            adagrad_only, params, opt_state))


if __name__ == "__main__":
    main()
