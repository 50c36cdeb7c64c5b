import numpy as np
import pytest

from openea_tpu.data import read as rd
from openea_tpu.data.kg import KG, KGs
from openea_tpu.data.synthetic import synthesize_kg_pair, write_kg_pair_folder
from openea_tpu.data.kg import read_kgs_from_folder


def test_sort_elements_freq_then_uri_desc():
    triples = {("a", "r", "b"), ("a", "r", "c"), ("c", "r", "b")}
    order = rd.sort_elements(triples, {"a", "b", "c", "d"})
    # freq: a=2, b=2, c=2, d=0; ties broken by URI descending
    assert order == ["c", "b", "a", "d"]


def test_generate_mapping_id_interleaves():
    t1 = {("x", "r", "y")}
    t2 = {("u", "s", "v"), ("u", "s", "w")}
    ids1, ids2 = rd.generate_mapping_id(t1, {"x", "y"}, t2, {"u", "v", "w"})
    assert sorted(ids1.values()) == [0, 2]
    assert set(ids2.values()) == {1, 3, 4}
    # ids never collide across KGs
    assert not set(ids1.values()) & set(ids2.values())


def test_generate_sharing_id_links_share():
    t1 = {("x", "r", "y")}
    t2 = {("u", "s", "v")}
    ids1, ids2 = rd.generate_sharing_id([("x", "u")], t1, {"x", "y"}, t2, {"u", "v"})
    assert ids1["x"] == ids2["u"]
    assert ids1["y"] != ids2["v"]


def test_swapping_generates_sup_triples():
    kgs = synthesize_kg_pair(num_entities=50, num_relations=4, num_triples=200,
                             mode="swapping", seed=3)
    assert len(kgs.kg1.sup_relation_triples_set) > 0
    assert len(kgs.kg2.sup_relation_triples_set) > 0
    # sup triples reference the counterpart's id, which lives in this KG's
    # entity set after augmentation
    assert kgs.kg1.relation_triples_num == len(kgs.kg1.triples)


def test_folder_roundtrip(tmp_path):
    folder = str(tmp_path) + "/"
    write_kg_pair_folder(folder, num_entities=60, num_relations=4,
                         num_triples=250, seed=1)
    kgs = read_kgs_from_folder(folder, "721_5fold/1/", "mapping", True)
    assert kgs.kg1.relation_triples_num > 0
    assert len(kgs.train_links) > 0
    assert len(kgs.test_links) > len(kgs.valid_links)
    # id arrays are int32 and within table bounds
    assert kgs.kg1.triples.dtype == np.int32
    assert kgs.kg1.triples[:, [0, 2]].max() < kgs.max_entities_id


def test_links_are_consistent():
    kgs = synthesize_kg_pair(num_entities=80, num_triples=300, seed=2)
    e1 = set(kgs.kg1.entities_set)
    e2 = set(kgs.kg2.entities_set)
    for a, b in kgs.train_links + kgs.valid_links + kgs.test_links:
        assert a in e1 and b in e2


def test_remove_unlinked_triples():
    triples = {("a", "r", "b"), ("c", "r", "d")}
    out = rd.remove_unlinked_triples(triples, [("a", "x"), ("b", "y")])
    assert out == {("a", "r", "b")}


def test_read_kgs_from_dbp_dwy(tmp_path):
    from openea_tpu.data.kg import read_kgs_from_dbp_dwy
    base = tmp_path / "0_3"
    base.mkdir()
    (base / "triples_1").write_text("a\tr\tb\nb\tr\tc\nx\tr\ty\n")
    (base / "triples_2").write_text("A\tR\tB\nB\tR\tC\n")
    (base / "sup_pairs").write_text("a\tA\n")
    (base / "ref_pairs").write_text("b\tB\nx\tC\n")
    kgs = read_kgs_from_dbp_dwy(str(tmp_path), "0_3", "mapping", True,
                                remove_unlinked=True)
    # (x, y) triple removed (x only linked to C which is in kg2), link
    # fixed point keeps the a/b pairs
    assert kgs.kg1.relation_triples_num >= 1
    assert len(kgs.train_links) == 1


def test_native_counting_argsort_edge_cases():
    from openea_tpu.data.native import counting_argsort
    import numpy as np
    rng = np.random.RandomState(0)
    k = rng.randint(0, 97, 50000).astype(np.int32)
    out = counting_argsort(k, 97)
    if out is None:
        import pytest
        pytest.skip("native library unavailable")
    assert (out == np.argsort(k, kind="stable")).all()
    # out-of-range key -> refuses (None), no crash
    bad = k.copy(); bad[123] = 97
    assert counting_argsort(bad, 97) is None
    bad[123] = -1
    assert counting_argsort(bad, 97) is None
    # empty input
    empty = counting_argsort(np.zeros(0, np.int32), 5)
    assert empty is None or len(empty) == 0
    # single key value
    ones = np.full(1000, 41, np.int32)
    out = counting_argsort(ones, 97)
    assert (out == np.arange(1000)).all()


def test_native_sort_unique_edge_cases():
    from openea_tpu.data.native import sort_unique_i64
    import numpy as np
    rng = np.random.RandomState(0)
    k = rng.randint(-2**40, 2**40, 30000).astype(np.int64)
    k[::3] = k[1::3][:len(k[::3])] if False else k[::3]
    dup = np.concatenate([k, k[:5000]])
    out = sort_unique_i64(dup)
    if out is None:
        import pytest
        pytest.skip("native library unavailable")
    assert (out == np.unique(dup)).all()
    empty = sort_unique_i64(np.zeros(0, np.int64))
    assert empty is None or len(empty) == 0
    one = sort_unique_i64(np.array([7, 7, 7], np.int64))
    assert one.tolist() == [7]
