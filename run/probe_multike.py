"""MultiKE 100K view-cost probe: ablate the rel/attr view losses to
attribute their 1.30/1.35 s/epoch (the two views own ~72% of the
steady epoch).

Usage: python run/probe_multike.py
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

from openea_tpu.config import Args  # noqa: E402
from openea_tpu.presets import get_preset_dict  # noqa: E402
from openea_tpu.registry import get_model  # noqa: E402
from run.bench_models import pair_100k  # noqa: E402


def main():
    vals = get_preset_dict("multike", "100K")
    vals.update(is_save=False, seed=1, max_epoch=2, start_valid=1000,
                eval_freq=1000)
    m = get_model("MultiKE")()
    m.set_args(Args(vals))
    m.set_kgs(pair_100k("swapping", attrs=True))
    t0 = time.time()
    m.init()
    print("init %.1f s" % (time.time() - t0))
    a = m.args
    rel_rows = np.asarray(m.kgs.kg1.local_relation_triples_list
                          + m.kgs.kg2.local_relation_triples_list, np.int32)
    pa = m.predicate_align_model
    attr_rows = m._w1000(pa.attribute_triples_w_weights1
                         + pa.attribute_triples_w_weights2)
    print("rel rows %d (batch %d -> %d steps); attr rows %d (batch %d)"
          % (len(rel_rows), a.batch_size,
             -(-len(rel_rows) // a.batch_size), len(attr_rows),
             a.attribute_batch_size))

    def timed(label, fn_name, loss_fn, rows, bsz, n=3):
        # _run_epoch caches the jitted fn AND the optimizer by fn_name —
        # every variant needs its OWN name or it reuses the first trace
        if fn_name not in m._opts:
            m._opts[fn_name] = (m._opts["rel"][0],
                                m._opts["rel"][0].init(m.params))
        # warm (compile)
        m._run_epoch(fn_name, loss_fn, rows, bsz, label=label + " warm")
        t0 = time.time()
        for _ in range(n):
            m._run_epoch(fn_name, loss_fn, rows, bsz, label=label)
        print(">> %s: %.3f s/epoch" % (label, (time.time() - t0) / n))

    timed("rel full", "rel", m._rel_view_loss, rel_rows, int(a.batch_size))

    # ablations of the rel view
    def rel_core_only(p, batch, wb, key):
        # strip the final/name cross terms: pure logistic TransE
        rv = m._t(p, "rv_ent_embeds")
        rel = m._t(p, "rel_embeds")
        phs, prs, pts = rv[batch[:, 0]], rel[batch[:, 1]], rv[batch[:, 2]]
        k1, k2, k3 = jax.random.split(key, 3)
        num_neg = max(1, int(a.neg_triple_num))
        coin = jax.random.bernoulli(k1, 0.5, (batch.shape[0], 1))
        coin = jnp.broadcast_to(coin, (batch.shape[0], num_neg))
        ents1_c = jnp.asarray(m._ents1)
        c1 = ents1_c[jax.random.randint(
            k2, (batch.shape[0], num_neg), 0, ents1_c.shape[0])]
        nh = jnp.where(coin, c1, batch[:, 0:1]).reshape(-1)
        nt = jnp.where(coin, batch[:, 2:3], c1).reshape(-1)
        nr = jnp.repeat(batch[:, 1], num_neg)
        nhs, nrs, nts = rv[nh], rel[nr], rv[nt]

        def e(h, r, t):
            return jnp.sum(jnp.square(h + r - t), axis=1)
        return (jnp.sum(jax.nn.softplus(e(phs, prs, pts)) * wb)
                + jnp.sum(jax.nn.softplus(-e(nhs, nrs, nts))
                          * jnp.repeat(wb, num_neg)))

    timed("rel core (no cross/name terms)", "rel_core", rel_core_only,
          rel_rows, int(a.batch_size))

    def rel_noop(p, batch, wb, key):
        rv = m._t(p, "rv_ent_embeds")
        return jnp.sum(rv[batch[:, 0]]) * 0.0 + jnp.sum(wb)

    timed("rel noop (epoch machinery only)", "rel_noop", rel_noop, rel_rows,
          int(a.batch_size))

    timed("attr full", "attr", m._attr_view_loss, attr_rows,
          int(a.attribute_batch_size))

    for label, name, fn in extra_ablations(m, rel_rows, a):
        timed(label, name, fn, rel_rows, int(a.batch_size))




def extra_ablations(m, rel_rows, a):
    import jax
    import jax.numpy as jnp

    def rel_nonorm(p, batch, wb, key):
        # raw tables (no l2_normalize fwd+VJP over the 200K tables)
        rv = p["rv_ent_embeds"]
        rel = p["rel_embeds"]
        phs, prs, pts = rv[batch[:, 0]], rel[batch[:, 1]], rv[batch[:, 2]]
        k1, k2, _ = jax.random.split(key, 3)
        num_neg = max(1, int(a.neg_triple_num))
        coin = jax.random.bernoulli(k1, 0.5, (batch.shape[0], 1))
        coin = jnp.broadcast_to(coin, (batch.shape[0], num_neg))
        ents1_c = jnp.asarray(m._ents1)
        cand = ents1_c[jax.random.randint(
            k2, (batch.shape[0], num_neg), 0, ents1_c.shape[0])]
        cand_rows = rv[cand.reshape(-1)].reshape(-1, num_neg, rv.shape[1])
        y = jnp.where(coin[..., None], (pts - prs)[:, None, :],
                      (phs + prs)[:, None, :])
        e_neg = jnp.sum(jnp.square(cand_rows - y), axis=-1)

        def e(h, r, t):
            return jnp.sum(jnp.square(h + r - t), axis=1)
        return (jnp.sum(jax.nn.softplus(e(phs, prs, pts)) * wb)
                + jnp.sum(jax.nn.softplus(-e_neg) * wb[:, None]))

    def rel_posonly(p, batch, wb, key):
        rv = m._t(p, "rv_ent_embeds")
        rel = m._t(p, "rel_embeds")
        phs, prs, pts = rv[batch[:, 0]], rel[batch[:, 1]], rv[batch[:, 2]]
        return jnp.sum(jax.nn.softplus(
            jnp.sum(jnp.square(phs + prs - pts), axis=1)) * wb)

    def rel_norm_only(p, batch, wb, key):
        rv = m._t(p, "rv_ent_embeds")
        rel = m._t(p, "rel_embeds")
        return (jnp.sum(rv[batch[:1, 0]]) + jnp.sum(rel[batch[:1, 1]])) \
            * jnp.sum(wb) * 0.0

    return [("rel struct-neg, NO table norm", "rel_nonorm", rel_nonorm),
            ("rel pos-only (norm on)", "rel_posonly", rel_posonly),
            ("rel norm-only", "rel_normonly", rel_norm_only)]


if __name__ == "__main__":
    main()
