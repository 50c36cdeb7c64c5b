"""AliNet: graph helpers + e2e learnability."""

import jax.numpy as jnp
import numpy as np
import pytest

from openea_tpu.ops.graph import segment_softmax, undirected_normalized_adj
from tests.test_models_e2e import make_kgs, run_model, test_hits1


def test_segment_softmax_rows_sum_to_one():
    vals = jnp.asarray([0.5, 1.0, -2.0, 3.0])
    segs = jnp.asarray([0, 0, 1, 1])
    out = np.asarray(segment_softmax(vals, segs, 2))
    assert np.isclose(out[0] + out[1], 1.0, atol=1e-5)
    assert np.isclose(out[2] + out[3], 1.0, atol=1e-5)
    # matches dense softmax
    assert np.allclose(out[:2], np.exp([0.5, 1.0]) / np.exp([0.5, 1.0]).sum(),
                       atol=1e-5)


def test_undirected_adj_padding_keeps_spmm_result():
    from openea_tpu.ops.graph import spmm
    triples = [(0, 0, 1), (1, 0, 2)]
    a = undirected_normalized_adj(4, triples)
    b = undirected_normalized_adj(4, triples, pad_to=64)
    assert b.row.shape[0] == 64
    x = jnp.asarray(np.random.RandomState(0).randn(4, 3).astype(np.float32))
    assert np.allclose(np.asarray(spmm(a, x)), np.asarray(spmm(b, x)), atol=1e-6)


def test_enhance_triples():
    from openea_tpu.models.alinet import enhance_triples
    tri1 = [(0, 1, 2)]
    tri2 = [(10, 5, 13)]           # maps to the NEW kg1 edge (0, 5, 3)
    enh1, enh2 = enhance_triples(tri1, tri2, [0, 2, 3], [10, 12, 13])
    assert (0, 5, 3) in enh1
    # kg1 triple (0,1,2) maps to (10,1,12): edge (10,.,12) doesn't exist
    assert (10, 1, 12) in enh2
    # an edge that already exists between the mapped endpoints is skipped
    enh1b, _ = enhance_triples([(0, 9, 2)], [(10, 5, 12)], [0, 2], [10, 12])
    assert enh1b == set()


def test_generate_2hop_pairs_excludes_direct_edges():
    from openea_tpu.models.alinet import generate_2hop_pairs
    # many distinct relation patterns so the top-5 cutoff keeps some
    triples = []
    for i in range(8):
        triples.append((0, i, i + 1))
        triples.append((i + 1, 10 + i, 20 + i))
    pairs = generate_2hop_pairs(triples)
    for h, t in pairs:
        assert (h, t) not in {(tr[0], tr[2]) for tr in triples} or h == t


def test_generate_2hop_pairs_paths_agree():
    """native emission, single-shot numpy, and chunked numpy are
    bit-identical (incl. the strided sampling path)."""
    from openea_tpu.data import native as nat
    from openea_tpu.models import alinet
    rng = np.random.RandomState(11)
    n, T, R = 900, 12000, 25
    tri = set(zip(rng.randint(0, n, T).tolist(),
                  rng.randint(0, R, T).tolist(),
                  rng.randint(0, n, T).tolist()))
    orig_native, orig_chunk = nat.mine2hop_unique, alinet._EMIT_CHUNK
    orig_min = alinet._NATIVE_MIN
    native_available = nat.mine2hop_unique(
        np.array([0], np.int64), np.array([0], np.int64),
        np.array([1], np.int64), np.array([1], np.int64), 1) is not None
    try:
        outs = {}
        for mp_ in (0, 3000):
            # native emission runs INSIDE generate_2hop_pairs (incl. the
            # strided max_pairs case): drop the size gate below this join
            alinet._NATIVE_MIN = 1
            ref = alinet.generate_2hop_pairs(tri, None, mp_, seed=5)
            alinet._NATIVE_MIN = orig_min
            nat.mine2hop_unique = lambda *a, **k: None   # numpy single-shot
            alinet._EMIT_CHUNK = 1 << 30
            a = alinet.generate_2hop_pairs(tri, None, mp_, seed=5)
            alinet._EMIT_CHUNK = 1 << 10                 # numpy chunked
            b = alinet.generate_2hop_pairs(tri, None, mp_, seed=5)
            nat.mine2hop_unique = orig_native
            alinet._EMIT_CHUNK = orig_chunk
            assert a.shape == ref.shape and (a == ref).all()
            assert b.shape == ref.shape and (b == ref).all()
            outs[mp_] = ref
        assert len(outs[3000]) == 3000 < len(outs[0])
        if not native_available:
            pytest.skip("native library unavailable: numpy paths only")
    finally:
        nat.mine2hop_unique = orig_native
        alinet._EMIT_CHUNK = orig_chunk
        alinet._NATIVE_MIN = orig_min


def test_mine2hop_native_direct():
    """Direct check of the C ABI against a hand-computed emission."""
    from openea_tpu.data.native import mine2hop_unique
    a_key = np.array([1 << 8, 2 << 8, 3 << 8], np.int64)
    base = np.array([0, 2, 0], np.int64)
    c = np.array([2, 3, 0], np.int64)
    b_key = np.array([7, 7, 5, 6, 9], np.int64)
    out = mine2hop_unique(a_key, base, c, b_key, 1)
    if out is None:                       # no toolchain: binding degrades
        pytest.skip("native library unavailable")
    # row0: 256|7, 256|7 ; row1: 512|5, 512|6, 512|9 ; row2: nothing
    assert out.tolist() == [256 | 7, 512 | 5, 512 | 6, 512 | 9]
    # strided variant reads every 2nd b_key entry
    out2 = mine2hop_unique(np.array([0], np.int64), np.array([0], np.int64),
                           np.array([3], np.int64), b_key, 2)
    assert out2.tolist() == [5, 7, 9]


@pytest.mark.slow
def test_alinet_e2e_learns():
    model, kgs = run_model(
        "AliNet", "mapping", epochs=60,
        init="xavier", layer_dims=[32, 32, 32], learning_rate=0.005,
        optimizer="Adam", neg_margin=1.5, neg_margin_balance=0.1,
        neg_triple_num=5, truncated_epsilon=0.98, truncated_freq=10,
        batch_size=60, min_rel_win=5, rel_param=0.01, sim_th=0.0,
        start_augment=2, k=5, eval_metric="inner", eval_norm=False,
        dropout=0.0, start_valid=1000, eval_freq=1000)
    hits1, mrr = test_hits1(model)
    assert hits1 > 25.0


def test_alinet_augmentation_path():
    model, kgs = run_model(
        "AliNet", "mapping", epochs=21,
        init="xavier", layer_dims=[24, 24], learning_rate=0.01,
        optimizer="Adam", neg_margin=1.5, neg_margin_balance=0.1,
        neg_triple_num=2, truncated_epsilon=0.98, truncated_freq=10,
        batch_size=60, min_rel_win=5, rel_param=0.0, sim_th=0.5,
        start_augment=1, k=5, csls=3, eval_metric="inner", eval_norm=False,
        dropout=0.0, start_valid=10, eval_freq=10)
    # augmentation ran at least once without shape errors
    assert isinstance(model.new_links, set)


@pytest.mark.slow
def test_alinet_mesh_training_matches_single_device():
    """AliNet trains on the 8-device mesh: boundary-exchange SpMM for the
    GCN layers + sharded 2-hop attention softmax (use_mesh=True) — same
    math as single-device, including the augmentation replan."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    kw = dict(init="xavier", layer_dims=[24, 24, 24], learning_rate=0.01,
              optimizer="Adam", neg_margin=1.5, neg_margin_balance=0.1,
              neg_triple_num=2, truncated_epsilon=0.98, truncated_freq=10,
              batch_size=60, min_rel_win=5, rel_param=0.01, sim_th=0.0,
              start_augment=2, k=5, eval_metric="inner", eval_norm=False,
              dropout=0.0, start_valid=1000, eval_freq=1000)
    # forward parity at init: mesh GCN + sharded 2-hop attention softmax
    # must match the single-device path exactly
    f1, kgs = run_model("AliNet", "mapping", epochs=0, **kw)
    f2, _ = run_model("AliNet", "mapping", epochs=0, kgs=kgs,
                      use_mesh=True, **kw)
    assert f2.mesh is not None and f2.mesh.size == 8
    assert f2.params["init_embedding"].sharding.spec[0] == "x"
    np.testing.assert_allclose(np.asarray(f2._ent_embeds_for_eval()),
                               np.asarray(f1._ent_embeds_for_eval()),
                               atol=2e-4, rtol=1e-4)
    # trained agreement: Adam amplifies f32 reduction-order drift, so the
    # contract is metric-level equivalence, not bitwise embeddings
    m1, _ = run_model("AliNet", "mapping", epochs=10, kgs=kgs, **kw)
    m2, _ = run_model("AliNet", "mapping", epochs=10, kgs=kgs,
                      use_mesh=True, **kw)
    diff = np.abs(np.asarray(m2._ent_embeds_for_eval())
                  - np.asarray(m1._ent_embeds_for_eval()))
    assert float(diff.mean()) < 2e-3
    h1, mrr1 = test_hits1(m1)
    h2, mrr2 = test_hits1(m2)
    assert abs(h1 - h2) <= 2.0
    assert abs(mrr1 - mrr2) < 0.02


@pytest.mark.slow
def test_alinet_attention_pallas_wiring_matches_xla():
    """The fused att_spmm attention path (TPU) must equal the segment-sum
    path bit-for-bit-ish, INCLUDING the edge-order contract between adj2
    and the chunk metas (adj2 is row-sorted = meta original order)."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from openea_tpu.config import Args
    from openea_tpu.ops.spmm_pallas import metas_from_coo
    from openea_tpu.registry import get_model

    kgs = make_kgs("mapping", seed=31)
    model = get_model("AliNet")()
    model.set_args(Args(
        embedding_module="AliNet", alignment_module="mapping",
        init="xavier", layer_dims=[16, 16, 16], learning_rate=0.01,
        optimizer="Adam", neg_margin=1.5, neg_margin_balance=0.1,
        neg_triple_num=2, truncated_epsilon=0.98, truncated_freq=10,
        batch_size=60, min_rel_win=5, rel_param=0.0, sim_th=0.0,
        start_augment=100, k=5, csls=0, eval_metric="inner", seed=3,
        max_epoch=1, start_valid=100, eval_freq=100, top_k=[1]))
    model.set_kgs(kgs)
    model.init()
    assert model._att_metas is None          # cpu backend -> XLA path
    model.args.att_precision = "highest"     # f32-exact for the parity check

    S = 4
    from openea_tpu.ops.spmm_pallas import chunk_vals
    meta, meta_t = metas_from_coo(np.asarray(model.adj2.row),
                                  np.asarray(model.adj2.col),
                                  model.n_ents, pad_chunks_to=S)
    val_np = np.asarray(model.adj2.val)
    metas = (meta, meta_t, jnp.asarray(chunk_vals(meta, val_np)),
             jnp.asarray(chunk_vals(meta_t, val_np)))
    model._att_block = S
    x = model.params["init_embedding"]
    out_xla = model._attention(model.params, 0, x, model.adj2, None)
    with pltpu.force_tpu_interpret_mode():
        out_pallas = model._attention(model.params, 0, x, model.adj2,
                                      metas)
    err = float(jnp.abs(out_pallas - out_xla).max())
    assert err < 1e-5, err

    # gradient wiring: d loss / d params flows through SDDMM + transpose
    def loss_with(metas):
        def f(p):
            out = model._attention(p, 0, p["init_embedding"], model.adj2,
                                   metas)
            return jnp.sum(jnp.tanh(out))
        return f

    g_xla = jax.grad(loss_with(None))(model.params)
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(loss_with(metas))(model.params)
    for name in ("att_0_kernel", "att_0_kernel1", "init_embedding"):
        scale = float(jnp.abs(g_xla[name]).max()) + 1e-9
        derr = float(jnp.abs(g_pal[name] - g_xla[name]).max()) / scale
        assert derr < 1e-4, (name, derr)

    # 'default' precision (bf16 gathers + one MXU pass) stays within
    # bf16 rounding of the exact path
    model.args.att_precision = "default"
    with pltpu.force_tpu_interpret_mode():
        out_bf16 = model._attention(model.params, 0, x, model.adj2,
                                    metas)
    err_bf = float(jnp.abs(out_bf16 - out_xla).max())
    assert err_bf < 3e-2, err_bf
