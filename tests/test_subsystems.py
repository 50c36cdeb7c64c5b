"""Aux subsystems: LSH blocking, checkpoint/resume, log statistics, CLI
variant modes."""

import os

import numpy as np
import pytest

from openea_tpu.config import Args


def test_lsh_blocker_finds_near_duplicates():
    from openea_tpu.ops.blocking import LSHBlocker
    rng = np.random.RandomState(0)
    base = rng.randn(100, 16).astype(np.float32)
    blocker = LSHBlocker(hash_size=8, input_dim=16, num_hashtables=4, seed=1)
    blocker.index(base, list(range(100)))
    # query with tiny perturbations of indexed points
    queries = base[:10] + 0.01 * rng.randn(10, 16).astype(np.float32)
    cands = blocker.query(queries)
    recall = sum(1 for i, c in enumerate(cands) if i in c) / 10
    assert recall >= 0.8
    # candidate sets are much smaller than the full index
    assert np.mean([len(c) for c in cands]) < 80


def test_lsh_query_ranked_distances_and_extras():
    """Pluggable distance functions + indexed payloads (reference
    lshash.py:77-153)."""
    from openea_tpu.ops.blocking import DISTANCE_FUNCS, LSHBlocker
    rng = np.random.RandomState(2)
    base = rng.randn(60, 12).astype(np.float32)
    blocker = LSHBlocker(hash_size=6, input_dim=12, num_hashtables=6, seed=1)
    blocker.index(base, list(range(60)), extras=[f"uri:{i}" for i in range(60)])
    queries = base[:5] + 0.005 * rng.randn(5, 12).astype(np.float32)
    for dist in DISTANCE_FUNCS:
        ranked = blocker.query_ranked(queries, num_results=3,
                                      distance_func=dist)
        assert len(ranked) == 5
        for row, results in enumerate(ranked):
            assert len(results) <= 3
            dists = [d for _, d, _ in results]
            assert dists == sorted(dists)
            for i, d, extra in results:
                assert extra == f"uri:{i}"
    # euclidean: the near-duplicate should rank first when it is a candidate
    ranked = blocker.query_ranked(queries, num_results=1,
                                  distance_func="euclidean")
    hits = sum(1 for row, res in enumerate(ranked)
               if res and res[0][0] == row)
    assert hits >= 4
    with pytest.raises(ValueError):
        blocker.query_ranked(queries, distance_func="nope")


def test_retrieve_topk_alignment_pairs_and_tsv(tmp_path):
    """reference modules/finding/alignment.py:227-257 semantics: top-k
    (source, candidate, sim) triples + TSV side effect."""
    from openea_tpu.ops.matching import retrieve_topk_alignment
    rng = np.random.RandomState(0)
    emb1 = rng.randn(20, 8).astype(np.float32)
    # candidate ids index the FULL kg2 table (reference embedding_lookup
    # semantics); rows 13/14 duplicate the sources -> top-1 recovers them
    emb2 = rng.randn(15, 8).astype(np.float32)
    emb2[13] = emb1[4]
    emb2[14] = emb1[7]
    path = str(tmp_path / "topk.tsv")
    out = retrieve_topk_alignment([4, 7], emb1, [10, 11, 12, 13, 14], emb2,
                                  k=2, metric="cosine", normalize=True,
                                  output_path=path)
    assert len(out) == 4
    # best-first per source: identical embedding wins under cosine
    assert out[0][:2] == (4, 13)
    assert out[2][:2] == (7, 14)
    with open(path) as f:
        lines = f.read().strip().split("\n")
    assert len(lines) == 4 and lines[0].startswith("4\t13\t")


def test_checkpoint_roundtrip(tmp_path):
    from openea_tpu.checkpoint import save_state, load_state
    import jax.numpy as jnp
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "epoch": jnp.asarray(7)}
    path = str(tmp_path / "ck")
    save_state(path, state)
    like = {"params": {"w": jnp.zeros((2, 3))}, "epoch": jnp.asarray(0)}
    restored = load_state(path, like)
    assert int(restored["epoch"]) == 7
    assert np.allclose(np.asarray(restored["params"]["w"]),
                       np.arange(6.0).reshape(2, 3))


def test_model_checkpoint_resume(tmp_path):
    from tests.test_models_e2e import make_kgs, run_model
    ckpt = str(tmp_path / "run_ck")
    kgs = make_kgs("sharing", seed=5)
    model, _ = run_model("TransE", "sharing", epochs=6, kgs=kgs,
                         init="normal", loss="margin-based",
                         neg_sampling="uniform", optimizer="Adagrad",
                         eval_metric="inner", loss_norm="L2",
                         ent_l2_norm=True, rel_l2_norm=True,
                         neg_triple_num=1, margin=1.5,
                         checkpoint_freq=3, checkpoint_path=ckpt,
                         start_valid=1000, eval_freq=1000)
    assert os.path.exists(ckpt + ".npz")
    model2, _ = run_model("TransE", "sharing", epochs=6, kgs=kgs,
                          init="normal", loss="margin-based",
                          neg_sampling="uniform", optimizer="Adagrad",
                          eval_metric="inner", loss_norm="L2",
                          ent_l2_norm=True, rel_l2_norm=True,
                          neg_triple_num=1, margin=1.5,
                          resume=True, checkpoint_path=ckpt,
                          start_valid=1000, eval_freq=1000)


def test_log_statistics_parse_and_csv(tmp_path):
    from openea_tpu.statistics import parse_log, logs_to_csv
    log = tmp_path / "run1.log"
    log.write_text(
        "epoch 10, avg. triple loss: 0.5, cost time: 1.25s\n"
        "accurate results: hits@[1, 5, 10] = [50.5 70.  80. ]%, mr = 12.0, "
        "mrr = 0.61, time = 2.0 s \n"
        "accurate results with csls: csls=10, hits@[1, 5, 10] = "
        "[60. 75. 85.]%, mr = 9.0, mrr = 0.7, time = 1.5 s \n"
        "Total run time = 100.5 s.\n")
    rec = parse_log(str(log))
    assert rec["plain"]["hits"][0] == 50.5
    assert rec["csls"]["mrr"] == 0.7
    assert rec["total_time"] == 100.5
    # per-phase sum: 1.25 + 2.0 + 1.5; the Total line and double pattern
    # matches must NOT inflate it (reference run_time.py semantics)
    assert abs(rec["summed_time"] - 4.75) < 1e-9
    out = str(tmp_path / "summary.csv")
    rows = logs_to_csv([str(log)], out, variant="csls")
    assert rows[0]["hits@1"] == 60.0
    assert os.path.exists(out)


@pytest.mark.slow
def test_cli_test_mode(tmp_path):
    """full run then `test` mode re-evaluates the saved embeddings."""
    from openea_tpu.data.synthetic import write_kg_pair_folder
    from openea_tpu.cli.main_from_args import main
    import json

    ds = tmp_path / "ds" / "SYN"
    write_kg_pair_folder(str(ds), num_entities=150, num_relations=5,
                         num_triples=700, seed=3)
    preset = {
        "training_data": str(tmp_path / "ds") + "/",
        "output": str(tmp_path / "out") + "/",
        "dataset_division": "721_5fold/1/",
        "embedding_module": "MTransE", "alignment_module": "mapping",
        "dim": 16, "init": "unit", "ent_l2_norm": True, "rel_l2_norm": True,
        "loss_norm": "L2", "learning_rate": 0.02, "optimizer": "Adagrad",
        "max_epoch": 5, "batch_size": 300, "alpha": 5,
        "start_valid": 100, "eval_freq": 100, "eval_metric": "inner",
        "eval_norm": True, "csls": 2, "top_k": [1, 5], "seed": 0,
    }
    pf = tmp_path / "preset.json"
    pf.write_text(json.dumps(preset))
    assert main([str(pf), "SYN", "721_5fold/1/"]) == 0
    assert main([str(pf), "SYN", "721_5fold/1/", "test"]) == 0
    assert main([str(pf), "SYN", "721_5fold/1/", "rev"]) == 0


@pytest.mark.slow
def test_experiment_re_evaluate(tmp_path):
    """Save a run, re-evaluate with inner/CSLS/MCD + hubness + stable."""
    from openea_tpu.data.synthetic import write_kg_pair_folder
    from openea_tpu.cli.main_from_args import main
    from openea_tpu import experiment
    import json, glob

    ds = tmp_path / "ds" / "SYN"
    write_kg_pair_folder(str(ds), num_entities=120, num_relations=5,
                         num_triples=600, seed=9)
    preset = {
        "training_data": str(tmp_path / "ds") + "/",
        "output": str(tmp_path / "out") + "/",
        "dataset_division": "721_5fold/1/",
        "embedding_module": "MTransE", "alignment_module": "mapping",
        "dim": 16, "init": "unit", "ent_l2_norm": True, "rel_l2_norm": True,
        "loss_norm": "L2", "learning_rate": 0.02, "optimizer": "Adagrad",
        "max_epoch": 5, "batch_size": 300, "alpha": 5,
        "start_valid": 100, "eval_freq": 100, "eval_metric": "inner",
        "eval_norm": True, "csls": 2, "top_k": [1, 5], "seed": 0,
    }
    pf = tmp_path / "preset.json"
    pf.write_text(json.dumps(preset))
    assert main([str(pf), "SYN", "721_5fold/1/"]) == 0
    runs = glob.glob(str(tmp_path / "out" / "MTransE" / "SYN" / "721_5fold"
                         / "1" / "*"))
    assert runs
    hits, mrr = experiment.re_evaluate(runs[0], str(ds), "721_5fold/1/",
                                       top_k=(1, 5), csls=2)
    assert np.isfinite(mrr)
    experiment.re_retrieval(runs[0], str(ds), "721_5fold/1/")
    e1, e2, _ = experiment.test_embeddings(runs[0], str(ds), "721_5fold/1/")
    stats = experiment.hubness(e1, e2, k=5)
    assert stats["max_hub"] >= 5
    con = experiment.conicity(e1, e2)
    assert set(con) == {f"{a}_{b}" for a in ("conicity", "vs")
                        for b in ("kg1", "kg2", "all")}
    assert all(np.isfinite(v) for v in con.values())
    intra = experiment.intra_kg_neighbor_stats(e1, e2, k=5)
    # the entity itself always counts (reference includes self in top-11)
    assert 1.0 <= intra["mean_intra"] <= 6.0
    assert intra["quartile_deviation"] >= 0


def test_tutorial_labs():
    from openea_tpu.tutorial.labs import (grade_alignment,
                                          majority_voting,
                                          match_by_name_similarity,
                                          truth_accuracy)
    names1 = {"a1": "University of Oslo", "a2": "Deep Learning"}
    names2 = {"b1": "university of oslo", "b2": "machine learning"}
    matches = match_by_name_similarity(names1, names2, threshold=0.8)
    assert ("a1", "b1", 1.0) in matches
    p, r, f1 = grade_alignment([(m[0], m[1]) for m in matches],
                               [("a1", "b1")])
    assert f1 == 1.0
    claims = [("s1", "o1", "x"), ("s2", "o1", "x"), ("s3", "o1", "y"),
              ("s1", "o2", "z")]
    truth = majority_voting(claims)
    assert truth == {"o1": "x", "o2": "z"}
    assert truth_accuracy(truth, {"o1": "x", "o2": "q"}) == 0.5


def test_native_tsv_loader(tmp_path):
    from openea_tpu.data.native import read_relation_triples_fast, get_lib
    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    p = tmp_path / "rel.tsv"
    p.write_text("a\tr1\tb\nb\tr2\tc\na\tr1\tb\n ws \t r \t x \n")
    fast = read_relation_triples_fast(str(p))
    assert fast is not None
    triples, ents, rels = fast
    assert triples == {("a", "r1", "b"), ("b", "r2", "c"), ("ws", "r", "x")}
    assert ents == {"a", "b", "c", "ws", "x"}
    assert rels == {"r1", "r2", "r"}


def test_csv_to_latex_and_degree_intervals(tmp_path):
    from openea_tpu.statistics import csv_to_latex, degree_interval_accuracy
    from openea_tpu.data.synthetic import synthesize_kg_pair
    csvp = tmp_path / "s.csv"
    csvp.write_text("log,hits@1,mrr\nrun1,50.0,0.6\nmean,50.0,0.6\n")
    tex = csv_to_latex(str(csvp), caption="test")
    assert "\\begin{tabular}" in tex and "50.0" in tex
    kgs = synthesize_kg_pair(num_entities=100, num_relations=5,
                             num_triples=500, mode="mapping", seed=2)
    # perfect alignment -> every bucket has hits@1 == 1.0
    pairs = list(zip(kgs.test_entities1, kgs.test_entities2))
    out = degree_interval_accuracy(kgs, pairs)
    assert out and all(acc == 1.0 for acc, _ in out.values())


@pytest.mark.slow
def test_main_with_args_cli(tmp_path):
    from openea_tpu.data.synthetic import write_kg_pair_folder
    from openea_tpu.cli.main_with_args import main
    ds = tmp_path / "ds" / "SYN"
    write_kg_pair_folder(str(ds), num_entities=120, num_relations=5,
                         num_triples=600, seed=4)
    rc = main(["--embedding_module", "MTransE",
               "--training_data", str(tmp_path / "ds") + "/",
               "--dataset", "SYN", "--split", "721_5fold/1/",
               "--output", str(tmp_path / "out") + "/",
               "--dim", "16", "--max_epoch", "4", "--batch_size", "300",
               "--start_valid", "100", "--top_k", "[1, 5]", "--csls", "2"])
    assert rc == 0


def test_approx_lsh_eval_close_to_exact():
    from openea_tpu.eval.approx import approx_greedy_eval
    rng = np.random.RandomState(0)
    base = rng.randn(300, 32).astype(np.float32)
    e2 = base + 0.05 * rng.randn(300, 32).astype(np.float32)
    hits, mr, mrr, recall = approx_greedy_eval(base, e2, [1, 5],
                                               hash_size=10, num_tables=8)
    assert recall > 0.9       # near-duplicates land in shared buckets
    assert hits[0] > 80.0


def test_predict_works_for_gnn_models(tmp_path):
    """predict() must not depend on BasicModel training arrays."""
    from tests.test_models_e2e import run_model
    model, kgs = run_model(
        "GCN_Align", "mapping", epochs=5,
        learning_rate=2.0, gamma=3.0, beta=0.9, neg_triple_num=5,
        se_dim=16, ae_dim=16, dim=16, eval_metric="manhattan",
        eval_norm=False, start_valid=1000, eval_freq=1000)
    out = model.predict(top_k=1)
    assert len(out) > 0
    assert all(isinstance(u, str) for u, _, _ in out[:5])


@pytest.mark.slow
def test_same_seed_same_results():
    """Full determinism: two runs with one seed produce identical params."""
    from tests.test_models_e2e import make_kgs, run_model
    import jax.numpy as jnp
    kgs = make_kgs("swapping", seed=3)
    outs = []
    for _ in range(2):
        model, _ = run_model("AlignE", "swapping", epochs=10, kgs=kgs,
                             learning_rate=0.05, init="normal", loss="limited",
                             neg_sampling="truncated", optimizer="Adagrad",
                             eval_metric="inner", loss_norm="L2",
                             ent_l2_norm=True, rel_l2_norm=True,
                             pos_margin=0.01, neg_margin=2.0,
                             neg_margin_balance=0.2, neg_triple_num=4,
                             truncated_epsilon=0.9, truncated_freq=5,
                             start_valid=1000, eval_freq=1000, seed=11)
        outs.append(np.asarray(model.params["ent_embeds"]))
    assert np.array_equal(outs[0], outs[1])


def test_superstep_with_truncated_tables():
    """Super-stepped epochs recompile once when neighbor tables appear."""
    from tests.test_models_e2e import make_kgs, run_model, test_hits1
    model, _ = run_model("AlignE", "swapping", epochs=20, epochs_per_call=5,
                         learning_rate=0.05, init="normal", loss="limited",
                         neg_sampling="truncated", optimizer="Adagrad",
                         eval_metric="inner", loss_norm="L2",
                         ent_l2_norm=True, rel_l2_norm=True,
                         pos_margin=0.01, neg_margin=2.0,
                         neg_margin_balance=0.2, neg_triple_num=4,
                         truncated_epsilon=0.9, truncated_freq=10,
                         start_valid=1000, eval_freq=1000)
    hits1, mrr = test_hits1(model)
    assert hits1 > 30.0


def test_bf16_eval_close_to_f32():
    from openea_tpu.eval.evaluation import greedy_alignment
    rng = np.random.RandomState(0)
    e1 = rng.randn(300, 32).astype(np.float32)
    e2 = np.concatenate([e1 + 0.05 * rng.randn(300, 32).astype(np.float32),
                         rng.randn(200, 32).astype(np.float32)])
    _, h32, _, m32 = greedy_alignment(e1, e2, [1, 5], normalize=True,
                                      accurate=False)
    _, h16, _, m16 = greedy_alignment(e1, e2, [1, 5], normalize=True,
                                      accurate=False,
                                      compute_dtype="bfloat16")
    assert abs(h32 - h16) < 3.0
    assert abs(m32 - m16) < 0.03


@pytest.mark.slow
def test_cli_mesh_mode(tmp_path):
    """mode 'mesh' trains a preset unmodified on the device mesh: tables
    row-sharded, sharded eval — the full multi-chip CLI path."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from openea_tpu.data.synthetic import write_kg_pair_folder
    from openea_tpu.cli.main_from_args import main
    import json

    ds = tmp_path / "ds" / "SYN"
    write_kg_pair_folder(str(ds), num_entities=150, num_relations=5,
                         num_triples=700, seed=3)
    preset = {
        "training_data": str(tmp_path / "ds") + "/",
        "output": str(tmp_path / "out") + "/",
        "dataset_division": "721_5fold/1/",
        "embedding_module": "MTransE", "alignment_module": "mapping",
        "dim": 16, "init": "unit", "ent_l2_norm": True, "rel_l2_norm": True,
        "loss_norm": "L2", "learning_rate": 0.02, "optimizer": "Adagrad",
        "max_epoch": 4, "batch_size": 300, "alpha": 5,
        "start_valid": 2, "eval_freq": 2, "eval_metric": "inner",
        "eval_norm": True, "csls": 2, "top_k": [1, 5], "seed": 0,
    }
    pf = tmp_path / "preset.json"
    pf.write_text(json.dumps(preset))
    assert main([str(pf), "SYN", "721_5fold/1/", "mesh"]) == 0


def test_test_both_log_lines_parse(capsys):
    """test_both's two 'accurate results' lines keep the reference format
    statistics.parse_log consumes."""
    from openea_tpu.eval.evaluation import test_both
    from openea_tpu import statistics
    rng = np.random.RandomState(0)
    e1 = rng.randn(60, 16).astype(np.float32)
    e2 = e1 + 0.1 * rng.randn(60, 16).astype(np.float32)
    rest, hits1, mrr = test_both(e1, e2, None, [1, 5], metric="inner",
                                 normalize=True, csls_k=3)
    out = capsys.readouterr().out
    assert "accurate results: hits@" in out
    assert "accurate results with csls: csls=3" in out
    import tempfile, os
    with tempfile.NamedTemporaryFile("w", suffix=".log", delete=False) as f:
        f.write(out)
        path = f.name
    parsed = statistics.parse_log(path)
    os.unlink(path)
    assert parsed["plain"] is not None and parsed["csls"] is not None
    assert parsed["plain"]["hits"][0] == hits1
    assert parsed["csls"]["mrr"] > 0
    assert len(rest) == 60


def test_timed_epochs_forces_measured_per_epoch_lines(capsys):
    """timed_epochs=True drops to 1-epoch device calls: every cost-time
    line is an individual wall-clock measurement (no within-call-average
    disclosure line), closing the run_time.py accounting gap
    (reference run/statistics/run_time.py:4-30)."""
    from tests.test_models_e2e import run_model
    run_model("MTransE", "mapping", epochs=6,
              init="unit", optimizer="Adagrad", eval_metric="inner",
              ent_l2_norm=True, rel_l2_norm=True, alpha=5, eval_norm=True,
              epochs_per_call=3, timed_epochs=True)
    out = capsys.readouterr().out
    assert "timed_epochs: forcing epochs_per_call 1" in out
    assert "report the within-call average" not in out
    # 6 individually printed triple-loss lines with distinct measured times
    lines = [ln for ln in out.splitlines() if "avg. triple loss" in ln]
    assert len(lines) == 6
    times = {ln.rsplit("cost time:", 1)[1] for ln in lines}
    assert len(times) >= 2, "per-epoch times look averaged, not measured"


def test_tutorial_rdf_parsing(tmp_path):
    """Stdlib RDF/XML parsing for the ontology-matching lab (reference
    data_input.py rdflib parser + test.py align_parser), on an inline
    OAEI-shaped fixture: typed elements, rdf:Description+rdf:type
    spelling, rdf:ID resolution, labels, namespace filtering."""
    onto = tmp_path / "onto.rdf"
    onto.write_text("""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xml:base="http://example.org/onto.rdf">
  <owl:Class rdf:about="#Person"><rdfs:label>person</rdfs:label></owl:Class>
  <owl:Class rdf:ID="Place"/>
  <owl:Class rdf:about="http://other.org/x#Alien"/>
  <rdf:Description rdf:about="#name">
    <rdf:type rdf:resource="http://www.w3.org/2002/07/owl#DatatypeProperty"/>
    <rdfs:label>name</rdfs:label>
  </rdf:Description>
  <owl:ObjectProperty rdf:about="#knows"/>
</rdf:RDF>""")
    from openea_tpu.tutorial.rdf import (RdfParser, grade_against_refalign,
                                         parse_alignment)
    p = RdfParser(str(onto), "example.org", verbose=False)
    assert p.class_uris == ["http://example.org/onto.rdf#Person",
                            "http://example.org/onto.rdf#Place"]
    assert p.class_labels == ["person", None]       # other.org filtered out
    assert p.attribute_uris == ["http://example.org/onto.rdf#name"]
    assert p.relation_uris == ["http://example.org/onto.rdf#knows"]
    assert p.names()["http://example.org/onto.rdf#Place"] == "Place"

    align = tmp_path / "refalign.rdf"
    align.write_text("""<?xml version='1.0'?>
<rdf:RDF xmlns='http://knowledgeweb.semanticweb.org/heterogeneity/alignment'
         xmlns:rdf='http://www.w3.org/1999/02/22-rdf-syntax-ns#'>
<Alignment>
  <map><Cell>
    <entity1 rdf:resource='http://a#x'/>
    <entity2 rdf:resource='http://b#y'/>
    <measure rdf:datatype='http://www.w3.org/2001/XMLSchema#float'>1.0</measure>
    <relation>=</relation>
  </Cell></map>
  <map><Cell>
    <entity1 rdf:resource='http://a#z'/>
    <entity2 rdf:resource='http://b#w'/>
    <measure rdf:datatype='http://www.w3.org/2001/XMLSchema#float'>1.0</measure>
    <relation>=</relation>
  </Cell></map>
</Alignment>
</rdf:RDF>""")
    gold = parse_alignment(str(align))
    assert gold == [("http://a#x", "http://b#y", "1.0", "="),
                    ("http://a#z", "http://b#w", "1.0", "=")]
    p_, r_, f1 = grade_against_refalign(
        [("http://a#x", "http://b#y", "1.0", "=")], str(align))
    assert (p_, r_) == (1.0, 0.5)


def test_attr_pipelines_deterministic_across_hash_seeds():
    """Attribute triples hold string values, so any raw set/dict-order
    dependence leaks PYTHONHASHSEED into training (caught round 4 as
    cross-process metric jitter in GCN-Align's attribute incidence).
    The canonical-order fixes must hold across different hash seeds."""
    import os
    import subprocess
    import sys
    code = r"""
import hashlib, sys
import numpy as np
import jax; jax.config.update("jax_platforms", "cpu")
from openea_tpu.data.synthetic import synthesize_kg_pair
from openea_tpu.models.gcn_align import load_attr_matrix
from openea_tpu.models.imuse import _first_value_dict
from openea_tpu.models.predicate_align import get_local_name
kgs = synthesize_kg_pair(num_entities=150, num_relations=6,
                         num_triples=900, mode="mapping", train_frac=0.3,
                         num_attributes=25, attrs_per_entity=4, seed=3)
def h(x): return hashlib.md5(np.ascontiguousarray(x).tobytes()).hexdigest()
r, c, v, n = load_attr_matrix(kgs.max_entities_id, kgs)
print(h(r), h(c), n)
ea, eav = _first_value_dict(kgs.kg1.attribute_triples_set)
print(hashlib.md5(str(sorted(eav.items())).encode()).hexdigest())
print(hashlib.md5(str(kgs.kg1.attribute_triples_list[:50]).encode()).hexdigest())
print(hashlib.md5(str(sorted(get_local_name(
    set(kgs.kg1.attributes_id_dict)).items())).encode()).hexdigest())
print(hashlib.md5(str({k: sorted(s) for k, s in sorted(
    kgs.kg1.entity_attributes_dict.items())}).encode()).hexdigest())
"""
    outs = []
    for seed in ("0", "31337"):
        env = dict(os.environ, PYTHONHASHSEED=seed)
        p = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=240,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))))
        assert p.returncode == 0, p.stderr[-2000:]
        outs.append(p.stdout)
    assert outs[0] == outs[1], "attribute pipeline is PYTHONHASHSEED-" \
        "dependent:\n%s\nvs\n%s" % (outs[0], outs[1])
