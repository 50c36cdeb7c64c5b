"""Re-evaluation harness for saved embeddings
(reference src/openea/expriment/: re_evaluate.py, re_retrieval.py,
test_funcs.py, data_analyse.py — the legacy analysis stack, provided here
as one module over the standard artifact format instead of a parallel
package of copied evaluators).

Capabilities: re-score saved runs with inner/CSLS/MCD similarity, stable-
matching re-retrieval, and hubness analysis.  MCD (mean-centered
deviation, reference re_evaluate.py:9-20) is computed as one vectorized
device expression instead of the O(n*m) python product loop.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openea_tpu.data import read as rd
from openea_tpu.eval.evaluation import greedy_alignment
from openea_tpu.ops.matching import stable_alignment
from openea_tpu.ops.similarity import sim as sim_matrix


def load_run(run_folder: str):
    """(ent_embeds, mapping_mat or None, kg1 uri->id, kg2 uri->id)."""
    ent = np.load(os.path.join(run_folder, "ent_embeds.npy"))
    mpath = os.path.join(run_folder, "mapping_mat.npy")
    mapping = np.load(mpath) if os.path.exists(mpath) else None

    def read_ids(name):
        out = {}
        path = os.path.join(run_folder, name)
        if os.path.exists(path):
            with open(path, "r", encoding="utf8") as f:
                for line in f:
                    uri, i = line.rstrip("\n").split("\t")
                    out[uri] = int(i)
        return out

    return ent, mapping, read_ids("kg1_ent_ids"), read_ids("kg2_ent_ids")


def test_embeddings(run_folder: str, dataset_folder: str, division: str):
    """Test-link embeddings of a saved run."""
    ent, mapping, ids1, ids2 = load_run(run_folder)
    links = rd.read_links(os.path.join(dataset_folder, division, "test_links"))
    e1 = ent[[ids1[a] for a, _ in links]]
    e2 = ent[[ids2[b] for _, b in links]]
    return e1, e2, mapping


@jax.jit
def mcd_matrix(sim: jax.Array) -> jax.Array:
    """Mean-centered deviation re-scoring (reference re_evaluate.py:9-20)."""
    n, m = sim.shape
    row = jnp.sum(sim, axis=1, keepdims=True)
    col = jnp.sum(sim, axis=0, keepdims=True)
    mu = (row + col - sim) / (n + m - 1)
    return jnp.square(sim - mu)


def re_evaluate(run_folder: str, dataset_folder: str, division: str,
                top_k=(1, 5, 10, 50), csls: int = 10):
    """Inner + CSLS + MCD re-evaluation of a saved run (reference
    re_evaluate.py __main__ flow)."""
    e1, e2, mapping = test_embeddings(run_folder, dataset_folder, division)
    if mapping is not None:
        e1 = e1 @ mapping
    print("inner:")
    greedy_alignment(e1, e2, list(top_k), metric="inner", normalize=True)
    print("csls:")
    greedy_alignment(e1, e2, list(top_k), metric="inner", normalize=True,
                     csls_k=csls)
    print("mcd:")
    s = sim_matrix(jnp.asarray(e1), jnp.asarray(e2), metric="inner",
                   normalize=True)
    mcd = mcd_matrix(s)
    n1 = s.shape[0]
    gold = jnp.arange(n1)
    gold_val = jnp.take_along_axis(mcd, gold[:, None], axis=1)
    ranks = jnp.sum((mcd > gold_val), axis=1)
    ranks = np.asarray(ranks)
    hits = [round(float((ranks < k).mean()) * 100, 3) for k in top_k]
    mrr = float((1.0 / (ranks + 1)).mean())
    print("accurate results: hits@{} = {}%, mrr = {:.6f}".format(list(top_k),
                                                                 hits, mrr))
    return hits, mrr


def re_retrieval(run_folder: str, dataset_folder: str, division: str,
                 csls: int = 0):
    """Stable-matching re-retrieval (reference re_retrieval.py)."""
    e1, e2, mapping = test_embeddings(run_folder, dataset_folder, division)
    if mapping is not None:
        e1 = e1 @ mapping
    return stable_alignment(e1, e2, metric="inner", normalize=True,
                            csls_k=csls)


def conicity(e1, e2) -> Dict[str, float]:
    """Embedding-cone statistics (reference raw_analyse.ent_conicity
    :533-558): ATM = projection of each embedding onto the unit mean
    vector; conicity = mean(ATM), vs = var(ATM); reported for KG1, KG2
    and the combined space.  One device matvec per space — no host loop."""
    out = {}
    e1 = jnp.asarray(e1)
    e2 = jnp.asarray(e2)
    for name, ents in (("kg1", e1), ("kg2", e2),
                       ("all", jnp.concatenate([e1, e2], axis=0))):
        mean = jnp.mean(ents, axis=0)
        atm = ents @ (mean / jnp.linalg.norm(mean))
        out[f"conicity_{name}"] = float(jnp.mean(atm))
        out[f"vs_{name}"] = float(jnp.var(atm))
    return out


def intra_kg_neighbor_stats(e1, e2, k: int = 10) -> Dict[str, float]:
    """How many of each KG1 entity's top-(k+1) neighbors in the combined
    KG1+KG2 space are intra-KG (reference raw_analyse
    comp_quartile_deviation :237-268 / pool_quartile_deviation :223-235,
    which shards an argsort over a process pool; here one blocked matmul
    + top_k on device).  Returns the reference's interquartile spread and
    trimmed mean of the per-entity intra-KG counts — high values mean the
    two KGs embed into separate cones, a known failure signature."""
    e1 = jnp.asarray(e1)
    e2 = jnp.asarray(e2)
    n1 = e1.shape[0]
    cand = jnp.concatenate([e1, e2], axis=0)
    s = sim_matrix(e1, cand, metric="inner", normalize=False)
    # the reference's top-11 window includes the entity itself (it is its
    # own nearest neighbor and belongs to KG1, matching their count)
    _, idx = jax.lax.top_k(s, k + 1)
    intra = np.asarray(jnp.sum(idx < n1, axis=1))
    order = np.sort(intra)
    q = n1 // 4
    trimmed = order[q:-q] if q else order
    return {
        "quartile_deviation": float(order[-q - 1] - order[q]) if q else 0.0,
        "trimmed_mean_intra": float(trimmed.mean()),
        "mean_intra": float(intra.mean()),
        "max_intra": int(intra.max()),
    }


def hubness(e1, e2, k: int = 10) -> Dict[str, float]:
    """How unevenly targets appear among row top-k (reference
    data_analyse/raw_analyse hubness study)."""
    s = sim_matrix(jnp.asarray(e1), jnp.asarray(e2), metric="inner",
                   normalize=True)
    _, idx = jax.lax.top_k(s, min(k, s.shape[1]))
    counts = np.bincount(np.asarray(idx).ravel(), minlength=s.shape[1])
    return {
        "max_hub": int(counts.max()),
        "mean": float(counts.mean()),
        "hub_frac_over_2x": float((counts > 2 * k).mean()),
        "anti_hub_frac": float((counts == 0).mean()),
    }
