"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openea_tpu.parallel.mesh import make_mesh, factor_mesh, batch_sharding
from openea_tpu.parallel.train_step import (
    make_sharded_train_step, init_sharded_state, compile_sharded_step)


def test_factor_mesh():
    assert factor_mesh(8) == (2, 4)
    assert factor_mesh(4) == (1, 4)
    assert factor_mesh(2) == (1, 2)
    assert factor_mesh(1) == (1, 1)
    assert factor_mesh(3) == (3, 1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_step_runs_and_matches_single_device():
    n = 8
    mesh = make_mesh(n)
    dim, n_ent, n_rel, batch, num_neg = 16, 64 * n, 8 * n, 16 * n, 4

    step, opt = make_sharded_train_step(mesh, num_neg, n_ent)
    key = jax.random.PRNGKey(0)
    params, opt_state = init_sharded_state(mesh, key, n_ent, n_rel, dim, opt)
    jitted = compile_sharded_step(mesh, step, params, opt_state)

    rng = np.random.RandomState(0)
    pos_np = np.stack([rng.randint(0, n_ent, batch),
                       rng.randint(0, n_rel, batch),
                       rng.randint(0, n_ent, batch)], axis=1).astype(np.int32)
    pos = jax.device_put(jnp.asarray(pos_np), batch_sharding(mesh))
    params2, opt_state2, loss = jitted(params, opt_state, key, pos)
    assert np.isfinite(float(loss))

    # single-device reference: same math, no shardings
    params_ref, opt_state_ref = init_sharded_state(make_mesh(1), key, n_ent,
                                                   n_rel, dim, opt)
    _, _, loss_ref = jax.jit(step)(params_ref, opt_state_ref, key,
                                   jnp.asarray(pos_np))
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_opt_state_shardings_match_by_path_not_shape():
    """Two same-shape tables with different shardings must each get their
    OWN accumulator sharding (regression: shape-based matching aliased)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from openea_tpu.ops.optim import get_optimizer
    from openea_tpu.parallel.train_step import _opt_state_shardings

    mesh = make_mesh(8)
    params = {"a": jnp.zeros((16, 8)), "b": jnp.zeros((16, 8))}
    p_shard = {"a": NamedSharding(mesh, P("model", None)),
               "b": NamedSharding(mesh, P(None, "model"))}
    opt = get_optimizer("Adagrad", 0.01)
    opt_state = opt.init(params)
    o_shard = _opt_state_shardings(mesh, opt_state, params, p_shard)
    leaves = jax.tree_util.tree_leaves_with_path(
        o_shard, is_leaf=lambda x: isinstance(x, NamedSharding))
    by_name = {}
    for path, sh in leaves:
        for entry in reversed(path):
            k = getattr(entry, "key", None)
            if k in p_shard:
                by_name[k] = sh
    assert by_name["a"].spec == P("model", None)
    assert by_name["b"].spec == P(None, "model")


def test_graft_entry_compiles():
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow
def test_graft_dryrun_multichip():
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "graft_entry2", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_sharded_eval_matches_single_device():
    import numpy as np
    from openea_tpu.parallel.eval_sharded import eval_mesh, sharded_greedy_eval
    from openea_tpu.ops.ranking import rank_and_argmax, metrics_from_ranks
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    e1 = rng.randn(37, 16).astype(np.float32)
    e2 = rng.randn(41, 16).astype(np.float32)
    mesh = eval_mesh()
    hits, mr, mrr = sharded_greedy_eval(mesh, e1, e2, [1, 5, 10],
                                        normalize=True)
    ranks, _ = rank_and_argmax(jnp.asarray(e1), jnp.asarray(e2),
                               jnp.arange(37), metric="inner", normalize=True)
    hits_ref, mr_ref, mrr_ref = metrics_from_ranks(np.asarray(ranks), [1, 5, 10])
    assert hits == hits_ref
    assert abs(mr - mr_ref) < 1e-6
    assert abs(mrr - mrr_ref) < 1e-9


def test_sharded_spmm_matches_dense():
    import numpy as np
    import jax.numpy as jnp
    from openea_tpu.ops.graph import build_sparse, spmm
    from openea_tpu.parallel.eval_sharded import eval_mesh
    from openea_tpu.parallel.spmm_sharded import partition_adj, sharded_spmm

    rng = np.random.RandomState(0)
    n, m, d = 53, 53, 12
    dense = (rng.rand(n, m) < 0.15) * rng.randn(n, m)
    row, col = np.nonzero(dense)
    adj = build_sparse(row.astype(np.int32), col.astype(np.int32),
                       dense[row, col].astype(np.float32), n)
    x = jnp.asarray(rng.randn(m, d).astype(np.float32))
    mesh = eval_mesh()
    sadj = partition_adj(adj, mesh.size)
    out = np.asarray(sharded_spmm(mesh, sadj, x))
    ref = np.asarray(spmm(adj, x))
    assert np.allclose(out, ref, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_csls_eval_matches_single_device():
    from openea_tpu.parallel.eval_sharded import (eval_mesh,
                                                  sharded_rank_and_argmax)
    from openea_tpu.ops.ranking import rank_and_argmax
    rng = np.random.RandomState(3)
    for n1, n2, csls, metric, norm in [(333, 500, 5, "inner", True),
                                       (256, 300, 10, "euclidean", False),
                                       (64, 80, 3, "cosine", False)]:
        e1 = rng.randn(n1, 32).astype(np.float32)
        e2 = rng.randn(n2, 32).astype(np.float32)
        e2[:n1] = e1 + 0.1 * rng.randn(n1, 32)
        gold = np.arange(n1, dtype=np.int32)
        r_ref, b_ref = rank_and_argmax(
            jnp.asarray(e1), jnp.asarray(e2), jnp.asarray(gold),
            metric=metric, normalize=norm, csls_k=csls, block=128)
        r_sh, b_sh = sharded_rank_and_argmax(
            eval_mesh(), e1, e2, gold, metric=metric, normalize=norm,
            csls_k=csls, block=37)
        assert np.array_equal(np.asarray(r_ref), r_sh)
        assert np.array_equal(np.asarray(b_ref), b_sh)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_mesh_model_training_matches_single_device():
    """A registered model trains on the 2x4 mesh (use_mesh=True) with
    bit-identical losses, metrics, and parameters vs single-device."""
    from tests.test_models_e2e import run_model, test_hits1
    kw = dict(init="normal", optimizer="Adagrad", eval_metric="inner",
              ent_l2_norm=True, rel_l2_norm=True, loss="limited",
              neg_sampling="truncated", truncated_epsilon=0.9,
              truncated_freq=5, pos_margin=0.01, neg_margin=2.0,
              neg_margin_balance=0.2, learning_rate=0.05, neg_triple_num=5,
              eval_norm=True)
    m1, _ = run_model("AlignE", "swapping", epochs=10, **kw)
    m2, _ = run_model("AlignE", "swapping", epochs=10, use_mesh=True, **kw)
    assert m2.mesh is not None and m2.mesh.size == 8
    h1, mrr1 = test_hits1(m1)
    h2, mrr2 = test_hits1(m2)
    assert h1 == h2 and mrr1 == mrr2
    n = np.asarray(m1.params["ent_embeds"]).shape[0]
    e1 = np.asarray(m1.params["ent_embeds"])
    e2 = np.asarray(m2.params["ent_embeds"])[:n]
    assert np.abs(e1 - e2).max() == 0.0
    # tables really are row-sharded over the 'model' axis
    spec = m2.params["ent_embeds"].sharding.spec
    assert spec and spec[0] == "model"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_mesh_mapping_model_matches_single_device():
    """MTransE (mapping module, super-steps) on the mesh: identical
    metrics; exercises the mapping optimizer sharding path."""
    from tests.test_models_e2e import run_model, test_hits1
    kw = dict(init="unit", optimizer="Adagrad", eval_metric="inner",
              ent_l2_norm=True, rel_l2_norm=True, alpha=5, eval_norm=True,
              epochs_per_call=4)
    m1, _ = run_model("MTransE", "mapping", epochs=8, **kw)
    m2, _ = run_model("MTransE", "mapping", epochs=8, use_mesh=True, **kw)
    h1, mrr1 = test_hits1(m1)
    h2, mrr2 = test_hits1(m2)
    assert h1 == h2 and mrr1 == mrr2


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_boundary_spmm_matches_dense_and_balances_nnz():
    from openea_tpu.ops.graph import build_sparse, spmm
    from openea_tpu.parallel.eval_sharded import eval_mesh
    from openea_tpu.parallel.spmm_sharded import (plan_boundary_exchange,
                                                  boundary_spmm)
    rng = np.random.RandomState(0)
    n = 500
    dense = (rng.rand(n, n) < 0.02) * rng.randn(n, n)
    r, c = np.nonzero(dense)
    adj = build_sparse(r.astype(np.int32), c.astype(np.int32),
                       dense[r, c].astype(np.float32), n)
    x = jnp.asarray(rng.randn(n, 32).astype(np.float32))
    plan = plan_boundary_exchange(adj, 8)
    out = np.asarray(boundary_spmm(eval_mesh(), plan, x))
    assert np.allclose(out, np.asarray(spmm(adj, x)), atol=1e-4)
    # boundary exchange volume beats the all_gather at this sparsity
    assert 8 * plan.r < n

    # power-law degrees: nnz-balanced contiguous ranges stay within 5%
    deg = np.clip((1.0 / np.random.RandomState(1).power(0.3, 2000))
                  .astype(int), 1, 400)
    rows = np.repeat(np.arange(2000), deg).astype(np.int32)
    cols = np.random.RandomState(2).randint(0, 2000, rows.shape[0]).astype(np.int32)
    adj2 = build_sparse(rows, cols, np.ones(rows.shape[0], np.float32), 2000)
    plan2 = plan_boundary_exchange(adj2, 8)
    per_shard = np.asarray([(np.asarray(plan2.val)[s] != 0).sum()
                            for s in range(8)], np.float64)
    assert per_shard.max() / per_shard.mean() < 1.05
    x2 = jnp.asarray(np.random.RandomState(3).randn(2000, 32).astype(np.float32))
    out2 = np.asarray(boundary_spmm(eval_mesh(), plan2, x2))
    assert np.allclose(out2, np.asarray(spmm(adj2, x2)), atol=1e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_boundary_spmm_padded_chains_like_two_spmms():
    """Composable padded-layout form: two chained layer SpMMs inside one
    jit match spmm(adj, spmm(adj, x)) — the GCN mesh-training hot path."""
    from functools import partial
    from openea_tpu.ops.graph import build_sparse, spmm
    from openea_tpu.parallel.eval_sharded import eval_mesh
    from openea_tpu.parallel.spmm_sharded import (
        plan_boundary_exchange, boundary_spmm_padded, pad_rows, unpad_rows)

    rng = np.random.RandomState(4)
    n, d = 300, 16
    dense = (rng.rand(n, n) < 0.03) * rng.randn(n, n)
    r, c = np.nonzero(dense)
    adj = build_sparse(r.astype(np.int32), c.astype(np.int32),
                       dense[r, c].astype(np.float32), n)
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    mesh = eval_mesh()
    plan = plan_boundary_exchange(adj, mesh.size)

    @jax.jit
    def two_layer(xp):
        h = boundary_spmm_padded(mesh, plan, xp)
        return boundary_spmm_padded(mesh, plan, jax.nn.relu(h))

    out = unpad_rows(plan, two_layer(pad_rows(plan, x)))
    ref = spmm(adj, jax.nn.relu(spmm(adj, x)))
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    # gradient flows through the all_to_all back to the padded input
    def loss(xp):
        return jnp.sum(two_layer(xp) ** 2)

    g = jax.grad(loss)(pad_rows(plan, x))

    def loss_ref(xg):
        return jnp.sum(spmm(adj, jax.nn.relu(spmm(adj, xg))) ** 2)

    g_ref = jax.grad(loss_ref)(x)
    assert np.allclose(np.asarray(unpad_rows(plan, g)),
                       np.asarray(g_ref), atol=1e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_local_spmm_padded_rectangular():
    """Replicated-source local SpMM (attribute incidence) aligned to the
    boundary plan's padded layout."""
    from openea_tpu.ops.graph import build_sparse, spmm
    from openea_tpu.parallel.eval_sharded import eval_mesh
    from openea_tpu.parallel.spmm_sharded import (
        plan_boundary_exchange, partition_by_plan, local_spmm_padded,
        unpad_rows)

    rng = np.random.RandomState(5)
    n, a, d = 260, 40, 8
    sq = (rng.rand(n, n) < 0.05) * rng.randn(n, n)
    r, c = np.nonzero(sq)
    adj = build_sparse(r.astype(np.int32), c.astype(np.int32),
                       sq[r, c].astype(np.float32), n)
    mesh = eval_mesh()
    plan = plan_boundary_exchange(adj, mesh.size)

    inc = (rng.rand(n, a) < 0.2) * 1.0
    ir, ic = np.nonzero(inc)
    attr = build_sparse(ir.astype(np.int32), ic.astype(np.int32),
                        inc[ir, ic].astype(np.float32), n)
    parts = partition_by_plan(attr, plan)
    w = jnp.asarray(rng.randn(a, d).astype(np.float32))
    out = unpad_rows(plan, jax.jit(
        lambda ww: local_spmm_padded(mesh, plan, parts, ww))(w))
    assert np.allclose(np.asarray(out), np.asarray(spmm(attr, w)), atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_ring_rank_and_argmax_matches_single_device():
    """2-D ring-sharded eval (both axes sharded, candidate blocks rotate
    via ppermute): exact rank + argmax parity incl. CSLS."""
    from openea_tpu.parallel.eval_sharded import (eval_mesh,
                                                  ring_rank_and_argmax)
    from openea_tpu.ops.ranking import rank_and_argmax
    rng = np.random.RandomState(7)
    for n1, n2, csls, metric, norm in [(123, 171, 0, "inner", True),
                                       (333, 500, 5, "inner", True),
                                       (256, 300, 10, "euclidean", False),
                                       (64, 80, 3, "cosine", False),
                                       (48, 64, 2, "manhattan", False)]:
        e1 = rng.randn(n1, 24).astype(np.float32)
        e2 = rng.randn(n2, 24).astype(np.float32)
        e2[:n1] = e1 + 0.1 * rng.randn(n1, 24)
        gold = np.arange(n1, dtype=np.int32)
        r_ref, b_ref = rank_and_argmax(
            jnp.asarray(e1), jnp.asarray(e2), jnp.asarray(gold),
            metric=metric, normalize=norm, csls_k=csls, block=128)
        r_sh, b_sh = ring_rank_and_argmax(
            eval_mesh(), e1, e2, gold, metric=metric, normalize=norm,
            csls_k=csls, block=29)
        assert np.array_equal(np.asarray(r_ref), r_sh), (n1, metric, csls)
        assert np.array_equal(np.asarray(b_ref), b_sh), (n1, metric, csls)


def test_ring_eval_threshold_dispatch(monkeypatch):
    """greedy_alignment(mesh=...) must switch row-sharded -> 2-D ring
    exactly at ring_threshold (boundary semantics: >= switches), and both
    paths must report identical metrics at the boundary."""
    from openea_tpu.eval import evaluation
    from openea_tpu.parallel import eval_sharded

    rng = np.random.RandomState(3)
    n1, n2, dim = 40, 64, 16
    e1 = rng.randn(n1, dim).astype(np.float32)
    e2 = rng.randn(n2, dim).astype(np.float32)
    e2[:n1] = e1 + 0.05 * rng.randn(n1, dim)
    mesh = eval_sharded.eval_mesh()

    calls = []
    real_ring = eval_sharded.ring_rank_and_argmax
    real_row = eval_sharded.sharded_rank_and_argmax
    monkeypatch.setattr(eval_sharded, "ring_rank_and_argmax",
                        lambda *a, **k: calls.append("ring") or real_ring(*a, **k))
    monkeypatch.setattr(eval_sharded, "sharded_rank_and_argmax",
                        lambda *a, **k: calls.append("row") or real_row(*a, **k))

    # n2 == threshold -> ring;  n2 == threshold+1 (i.e. threshold > n2) -> row
    _, h_ring, mr_ring, mrr_ring = evaluation.greedy_alignment(
        e1, e2, [1, 5], metric="inner", normalize=True, accurate=True,
        mesh=mesh, ring_threshold=n2)
    _, h_row, mr_row, mrr_row = evaluation.greedy_alignment(
        e1, e2, [1, 5], metric="inner", normalize=True, accurate=True,
        mesh=mesh, ring_threshold=n2 + 1)
    assert calls == ["ring", "row"]
    assert h_ring == h_row and mr_ring == mr_row and mrr_ring == mrr_row
