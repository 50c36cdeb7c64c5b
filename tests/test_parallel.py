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
