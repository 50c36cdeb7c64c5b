"""Disk cache for mined artifacts (AliNet 2-hop pairs, IPTransE paths):
bit-identity vs fresh mining, content-keyed invalidation, corrupt-file
fallback.  Mirrors the reference's own caching of exactly these
artifacts (alinet.py:711-725 pickle, rsn4ea.py:225-233 CSV)."""

import os

import numpy as np
import pytest

from openea_tpu.data import mining_cache as mc


@pytest.fixture
def cache_env(tmp_path, monkeypatch):
    monkeypatch.setenv("OPENEA_CACHE_DIR", str(tmp_path))
    return tmp_path


def _toy_triples(n=400, ents=80, rels=6, seed=0):
    rng = np.random.RandomState(seed)
    return list({(int(h), int(r), int(t)) for h, r, t in
                 zip(rng.randint(0, ents, n), rng.randint(0, rels, n),
                     rng.randint(0, ents, n))})


def test_cached_roundtrip_bit_identical(cache_env):
    calls = []

    def build():
        calls.append(1)
        return {"a": np.arange(7, dtype=np.int32),
                "b": np.linspace(0, 1, 5).astype(np.float32)}

    key = (np.arange(10), "p", 3)
    first = mc.cached("toy", key, build, names=("a", "b"))
    second = mc.cached("toy", key, build, names=("a", "b"))
    assert len(calls) == 1                      # second call hit the disk
    for k in ("a", "b"):
        np.testing.assert_array_equal(first[k], second[k])
        assert first[k].dtype == second[k].dtype


def test_cache_key_content_sensitivity(cache_env):
    calls = []

    def build():
        calls.append(1)
        return {"a": np.asarray([len(calls)])}

    mc.cached("toy", (np.arange(5), 1.0), build, names=("a",))
    mc.cached("toy", (np.arange(5), 2.0), build, names=("a",))   # param
    mc.cached("toy", (np.arange(6), 1.0), build, names=("a",))   # content
    assert len(calls) == 3


def test_corrupt_cache_falls_back(cache_env):
    def build():
        return {"a": np.arange(4)}

    mc.cached("toy", ("k",), build, names=("a",))
    entry = [f for f in os.listdir(cache_env) if f.startswith("toy_")][0]
    (cache_env / entry / "a.npy").write_bytes(b"garbage")
    out = mc.cached("toy", ("k",), build, names=("a",))
    np.testing.assert_array_equal(out["a"], np.arange(4))


def test_legacy_npz_entry_still_loads(cache_env):
    dig = mc.content_digest("toy", "legacy")
    np.savez(os.path.join(str(cache_env), "toy_%s.npz" % dig),
             a=np.arange(3))
    out = mc.cached("toy", ("legacy",), lambda: (_ for _ in ()).throw(
        AssertionError("must hit legacy npz")), names=("a",))
    np.testing.assert_array_equal(out["a"], np.arange(3))


def test_iptranse_paths_cache_bit_identity(cache_env):
    from openea_tpu.models.iptranse import generate_2steps_path
    triples = _toy_triples(seed=3)
    t = mc.triples_key(triples)
    fresh_p, fresh_w = generate_2steps_path(t, as_arrays=True)

    def build():
        p, w = generate_2steps_path(t, as_arrays=True)
        return {"paths": p, "path_w": w}

    mc.cached("iptranse_paths", (t,), build, names=("paths", "path_w"))
    warm = mc.cached("iptranse_paths", (t,), lambda: (_ for _ in ()).throw(
        AssertionError("must hit cache")), names=("paths", "path_w"))
    np.testing.assert_array_equal(warm["paths"], fresh_p)
    np.testing.assert_array_equal(warm["path_w"], fresh_w)
    # arrays agree with the list-of-tuples interface too
    as_list = generate_2steps_path(triples)
    assert sorted(map(tuple, np.column_stack(
        [warm["paths"], warm["path_w"]]).tolist())) == sorted(
        [(float(a), float(b), float(c), float(d)) for a, b, c, d in as_list])


def test_alinet_2hop_cache_bit_identity(cache_env):
    from openea_tpu.models.alinet import generate_2hop_pairs
    triples = _toy_triples(n=600, seed=5)
    linked = set(range(0, 80, 2))
    fresh = generate_2hop_pairs(triples, linked, 0, 7)

    def build():
        return {"two_pairs": generate_2hop_pairs(triples, linked, 0, 7)}

    key = (mc.triples_key(triples), np.asarray(sorted(linked)), 0, 7)
    mc.cached("alinet_2hop", key, build, names=("two_pairs",))
    warm = mc.cached("alinet_2hop", key, lambda: (_ for _ in ()).throw(
        AssertionError("must hit cache")), names=("two_pairs",))
    np.testing.assert_array_equal(warm["two_pairs"], fresh)
    # order-invariance of the miner itself (the digest hashes the SET)
    again = generate_2hop_pairs(list(reversed(triples)), linked, 0, 7)
    np.testing.assert_array_equal(again, fresh)


def test_iptranse_miner_order_invariance():
    """Mining from the canonically sorted array is a pure function of
    the triple set — the property the content digest relies on."""
    triples = _toy_triples(seed=11)
    a = mc.triples_key(triples)
    b = mc.triples_key(list(reversed(triples)))
    np.testing.assert_array_equal(a, b)


def test_model_level_cache_hits(cache_env):
    """IPTransE init twice with the same KGs: the second init loads the
    mined paths from disk and gets bit-identical arrays."""
    from openea_tpu.config import Args
    from openea_tpu.data.synthetic import synthesize_kg_pair
    from openea_tpu.presets import get_preset_dict
    from openea_tpu.registry import get_model

    kgs = synthesize_kg_pair(num_entities=300, num_relations=10,
                             num_triples=900, mode="sharing",
                             train_frac=0.3, valid_frac=0.1, seed=2)
    vals = get_preset_dict("iptranse", "15K")
    vals.update(is_save=False, seed=1, batch_size=64, max_epoch=2,
                start_valid=1000, eval_freq=1000)
    models = []
    for _ in range(2):
        m = get_model("IPTransE")()
        m.set_args(Args(vals))
        m.set_kgs(kgs)
        m.init()
        models.append(m)
    np.testing.assert_array_equal(models[0]._paths, models[1]._paths)
    np.testing.assert_array_equal(models[0]._path_w, models[1]._path_w)
    files = [f for f in os.listdir(cache_env)
             if f.startswith("iptranse_paths_")]
    assert len(files) == 1
