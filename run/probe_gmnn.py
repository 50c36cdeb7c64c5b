"""GMNN 100K roofline probe (VERDICT r4 weak #4).

Attributes the 143.7 s / 90.5K-step epoch (reference protocol
batch_size=20) across: LSTM name encoding, gated-GCN aggregation +
matching forward, backward, and the dense Adam update over the full
word/param tables.  Variants monkeypatch the model before jitting, so
each timing is a real scanned epoch slice at the true shapes.

Usage: python run/probe_gmnn.py [n_steps]
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

from openea_tpu.config import Args  # noqa: E402
from openea_tpu.presets import get_preset_dict  # noqa: E402
from openea_tpu.registry import get_model  # noqa: E402
from run.bench_models import pair_100k  # noqa: E402


def sync(x):
    leaves = [v for v in jax.tree_util.tree_leaves(x) if hasattr(v, "reshape")]
    float(jnp.sum(leaves[-1].reshape(-1)[:1]))


def timeit(fn, *args, n=3):
    sync(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / n


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    vals = get_preset_dict("gmnn", "15K")
    vals.update(is_save=False, seed=1, max_epoch=1, start_valid=1000,
                eval_freq=1000, stop_metric="hits1", top_k=[1, 5, 10, 50])
    kgs = pair_100k("mapping")
    m = get_model("GMNN")()
    m.set_args(Args(vals))
    m.set_kgs(kgs)
    t0 = time.time()
    m.init()
    print("init: %.1f s; E=%d N=%d S=%d d=%d wd=%d vocab=%d" % (
        time.time() - t0, m.E, m.N, m.S, m.d,
        m.params["word_em"].shape[1], len(m.vocab)))
    for k, v in sorted(m.params.items()):
        if np.prod(v.shape) > 1e6:
            print("  big param %s %s %.1f MB" % (k, v.shape,
                                                 v.nbytes / 2**20))
    bsz = int(m.args.batch_size)
    rng = np.random.RandomState(0)
    ex = np.stack([rng.randint(0, m.E, n_steps * bsz),
                   rng.randint(0, m.E, n_steps * bsz),
                   rng.randint(0, 2, n_steps * bsz)], axis=1).astype(np.int32)
    ex_dev = jnp.asarray(ex)

    def make_epoch():
        step = m._step_core

        def epoch(params, opt_state, ex):
            def body(carry, b):
                params, opt_state = carry
                params, opt_state, loss = step(
                    params, opt_state, b[:, 0], b[:, 1], b[:, 2])
                return (params, opt_state), loss
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), ex.reshape(n_steps, bsz, 3))
            return params, opt_state, jnp.sum(losses)
        return jax.jit(epoch)

    base = dict(m.__class__.__dict__)

    def run_variant(name, **patches):
        for k, v in patches.items():
            setattr(m, k, v.__get__(m) if callable(v) else v)
        fn = make_epoch()
        t = timeit(fn, m.params, m.opt_state, ex_dev)
        per = t / n_steps * 1e3
        print("%-34s %.3f s / %d steps = %.3f ms/step -> %.1f s at 90.5K"
              % (name, t, n_steps, per, per * 90500 / 1e3))
        for k in patches:
            try:
                delattr(m, k)
            except AttributeError:
                pass
        return t

    run_variant("full step")

    # optimizer ablation: apply no update (isolates Adam dense passes)
    def step_no_opt(self, params, opt_state, e1, e2, labels):
        def loss_fn(p):
            logits = self._logits(p, e1, e2)
            onehot = jax.nn.one_hot(labels, 2)
            return jnp.mean(optax.softmax_cross_entropy(logits, onehot))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        # consume grads so they aren't DCE'd, but skip the Adam passes
        params = jax.tree_util.tree_map(
            lambda p, g: p + 0.0 * jnp.sum(g) / (jnp.size(g) + 1.0),
            params, grads)
        return params, opt_state, loss
    run_variant("fwd+bwd, no Adam update", _step_core=step_no_opt)

    # forward-only
    def step_fwd(self, params, opt_state, e1, e2, labels):
        logits = self._logits(params, e1, e2)
        onehot = jax.nn.one_hot(labels, 2)
        return params, opt_state, jnp.mean(
            optax.softmax_cross_entropy(logits, onehot))
    run_variant("forward only", _step_core=step_fwd)

    # LSTM ablation: mean word embedding + linear proj instead of the
    # W-step LSTM scan
    orig_node_reps = m.__class__._node_reps

    def node_reps_mean(self, p, ent_ids):
        toks = jnp.asarray(self._tok_mat)[ent_ids]
        x = p["word_em"][toks]                      # [B, N, W, wd]
        mean = jnp.mean(x, axis=2)
        wd = mean.shape[-1]
        return mean @ p["lstm_w"][:wd, :self.d]
    run_variant("no LSTM (mean-pool names)", _node_reps=node_reps_mean)

    # no word-table touch at all: constant node reps (isolates the
    # word_em gather + its scatter-add backward + its Adam rows)
    def node_reps_const(self, p, ent_ids):
        B, N = ent_ids.shape
        return jnp.ones((B, N, self.d)) * jnp.sum(p["lstm_b"]) * 1e-6
    run_variant("no word table (const reps)", _node_reps=node_reps_const)


if __name__ == "__main__":
    main()
