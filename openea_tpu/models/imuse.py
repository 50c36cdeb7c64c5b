"""IMUSE: unsupervised interactive EA (reference approaches/imuse.py).

Pipeline: (1) bootstrap attribute alignment by Levenshtein name
similarity, keeping the top-10 most frequent pairs (:201-249); (2)
iterate entity-by-attribute-value and attribute-by-entity-value
alignment with Levenshtein value similarity (:17-40); (3) train margin
TransE plus a per-epoch align loss sum ||e1 - e2||^2 over the collected
pairs (:306-313).

The interactive matching is inherently host/string work; the reference
shards it over an 8-process pool.  Here it runs single-process but with
(a) a candidate index (only entity pairs sharing >= 1 aligned attribute
are compared, instead of the full E1 x E2 sweep) and (b) a value-pair
similarity cache.  The training losses are jitted scans.
"""

from __future__ import annotations

import math
import time
from typing import Dict, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

try:
    import Levenshtein

    def _lev_ratio(a: str, b: str) -> float:
        return Levenshtein.ratio(a, b)
except ImportError:                                       # pragma: no cover
    from difflib import SequenceMatcher

    def _lev_ratio(a: str, b: str) -> float:
        return SequenceMatcher(None, a, b).ratio()

from openea_tpu.eval.evaluation import early_stop
from openea_tpu.models.base import BasicModel
from openea_tpu.ops.optim import get_optimizer
from openea_tpu.ops.initializers import l2_normalize


def get_aligned_attr_pair_by_name_similarity(kgs, sim_th: float, top_k: int = 10):
    """Best Levenshtein name match per KG1 attribute above sim_th, keep the
    top_k most frequent pairs (reference imuse.py:201-249)."""
    id_attr1 = {i: a for a, i in (kgs.kg1.attributes_id_dict or {}).items()}
    id_attr2 = {i: a for a, i in (kgs.kg2.attributes_id_dict or {}).items()}
    pairs = set()
    used2 = set()
    for a1 in kgs.kg1.attributes_set:
        name1 = id_attr1.get(a1, str(a1)).split("/")[-1]
        best, best_sim = None, sim_th
        for a2 in kgs.kg2.attributes_set:
            sim = _lev_ratio(name1, id_attr2.get(a2, str(a2)).split("/")[-1])
            if sim > best_sim:
                best, best_sim = a2, sim
        if best is not None and best not in used2:
            pairs.add((a1, best))
            used2.add(best)
    freq1: Dict[int, int] = {}
    freq2: Dict[int, int] = {}
    for _, a, _ in kgs.kg1.attribute_triples_set:
        freq1[a] = freq1.get(a, 0) + 1
    for _, a, _ in kgs.kg2.attribute_triples_set:
        freq2[a] = freq2.get(a, 0) + 1
    ranked = sorted(pairs, key=lambda p: -(freq1.get(p[0], 0) + freq2.get(p[1], 0)))
    return set(ranked[:top_k])


def _first_value_dict(attr_triples):
    """(e, a) -> first value seen (reference filter_by_aligned_attributes).
    Canonical iteration: string-valued triple sets follow PYTHONHASHSEED,
    so 'first seen' must not depend on set order."""
    eav = {}
    ea_attrs: Dict[int, Set[int]] = {}
    for e, a, v in sorted(attr_triples,
                          key=lambda t: (t[0], t[1], str(t[2]))):
        if (e, a) not in eav:
            eav[(e, a)] = str(v)
            ea_attrs.setdefault(e, set()).add(a)
    return ea_attrs, eav


def _ea_worker(e1_items, ea2, eav1, eav2, by_attr2, aligned_attr_pairs,
               sim_th):
    sim_cache: Dict[Tuple[str, str], float] = {}

    def vsim(v1, v2):
        key = (v1, v2)
        if key not in sim_cache:
            sim_cache[key] = _lev_ratio(v1, v2)
        return sim_cache[key]

    out = []
    for e1, attrs1 in e1_items:
        cands = set()
        for a1, a2 in aligned_attr_pairs:
            if a1 in attrs1:
                cands |= by_attr2.get(a2, set())
        best, best_sim = None, sim_th
        for e2 in cands:
            attrs2 = ea2[e2]
            s, cnt = 0.0, 0
            for a1, a2 in aligned_attr_pairs:
                if a1 in attrs1 and a2 in attrs2:
                    s += vsim(eav1[(e1, a1)], eav2[(e2, a2)])
                    cnt += 1
            if cnt:
                s /= cnt
            if s > best_sim:
                best, best_sim = e2, s
        if best is not None:
            out.append((e1, best, best_sim))
    return out


def _align_entities_vectorized(ea1, eav1, ea2, eav2, aligned_attr_pairs,
                               sim_th: float, block: int = 4096):
    """Matrix formulation of the per-entity scoring loop: for each
    aligned attribute pair, ONE native batch Levenshtein-ratio matrix
    over the distinct values replaces ~10^8 python-level ratio calls
    (hours at 100K; the reference 8-way pool has the same shape,
    imuse.py:70-100).  Scores accumulate into [block, n2_active] slabs
    (mean over shared aligned attributes, exactly the loop's math);
    returns (e1, best_e2, sim) rows with sim > sim_th, or None when the
    native kernel is unavailable."""
    from openea_tpu.data.native import lev_ratio_matrix
    if lev_ratio_matrix(["probe"], ["probe"]) is None:
        return None
    # per attr pair: holder lists + distinct-value ratio matrices
    per_attr = []
    act1_set, act2_set = set(), set()
    for a1, a2 in sorted(aligned_attr_pairs):
        es1 = sorted(e for e, attrs in ea1.items() if a1 in attrs)
        es2 = sorted(e for e, attrs in ea2.items() if a2 in attrs)
        if not es1 or not es2:
            continue
        uv1, inv1 = np.unique([eav1[(e, a1)] for e in es1],
                              return_inverse=True)
        uv2, inv2 = np.unique([eav2[(e, a2)] for e in es2],
                              return_inverse=True)
        M = lev_ratio_matrix(list(uv1), list(uv2))
        if M is None:
            return None
        per_attr.append((np.asarray(es1), inv1, np.asarray(es2), inv2, M))
        act1_set.update(es1)
        act2_set.update(es2)
    if not per_attr:
        return []
    act1 = np.asarray(sorted(act1_set))
    act2 = np.asarray(sorted(act2_set))
    pos1 = {int(e): i for i, e in enumerate(act1)}
    pos2 = {int(e): i for i, e in enumerate(act2)}
    per_attr = [(np.asarray([pos1[int(e)] for e in es1]), inv1,
                 np.asarray([pos2[int(e)] for e in es2]), inv2, M)
                for es1, inv1, es2, inv2, M in per_attr]
    n2a = len(act2)
    results = []
    for b0 in range(0, len(act1), block):
        b1 = min(b0 + block, len(act1))
        S = np.zeros((b1 - b0, n2a), np.float32)
        C = np.zeros((b1 - b0, n2a), np.int16)
        for i1, inv1, i2, inv2, M in per_attr:
            in_blk = (i1 >= b0) & (i1 < b1)
            if not in_blk.any():
                continue
            rows = i1[in_blk] - b0
            from openea_tpu.data.native import imuse_accumulate
            if not imuse_accumulate(M, rows, inv1[in_blk], i2, inv2,
                                    S, C):
                Mfull = M[inv1[in_blk]][:, inv2]      # [rows, |es2|]
                S[np.ix_(rows, i2)] += Mfull
                C[np.ix_(rows, i2)] += 1
        from openea_tpu.data.native import imuse_best
        nb = imuse_best(S, C)
        if nb is not None:
            j, sims = nb
        else:
            np.divide(S, np.maximum(C, 1), out=S)
            S[C == 0] = -1.0
            j = np.argmax(S, axis=1)
            sims = S[np.arange(b1 - b0), j]
        keep = sims > sim_th
        for r in np.nonzero(keep)[0]:
            results.append((int(act1[b0 + r]), int(act2[j[r]]),
                            float(sims[r])))
    return results


def align_entity_by_attributes(kgs, aligned_attr_pairs, sim_th: float,
                               processes: int = 8):
    """Greedy best-match per KG1 entity by mean value similarity over
    aligned attributes; candidates restricted to entities sharing at
    least one aligned attribute.  Vectorized native path first (see
    _align_entities_vectorized); python process-pool fallback otherwise
    (the reference uses an 8-way pool over the full E1 x E2 sweep,
    imuse.py:70-100)."""
    if not aligned_attr_pairs:
        return set()
    ea1, eav1 = _first_value_dict(kgs.kg1.attribute_triples_set)
    ea2, eav2 = _first_value_dict(kgs.kg2.attribute_triples_set)

    results = _align_entities_vectorized(ea1, eav1, ea2, eav2,
                                         aligned_attr_pairs, sim_th)
    if results is None:
        by_attr2: Dict[int, Set[int]] = {}
        for e2, attrs in ea2.items():
            for a2 in attrs:
                by_attr2.setdefault(a2, set()).add(e2)

        items = list(ea1.items())
        results = []
        if processes > 1 and len(items) > 2000:
            import multiprocessing as mp
            shard = (len(items) + processes - 1) // processes
            shards = [items[i:i + shard] for i in range(0, len(items), shard)]
            with mp.Pool(processes=len(shards)) as pool:
                parts = pool.starmap(
                    _ea_worker,
                    [(sh, ea2, eav1, eav2, by_attr2, aligned_attr_pairs,
                      sim_th) for sh in shards])
            for p in parts:
                results.extend(p)
        else:
            results = _ea_worker(items, ea2, eav1, eav2, by_attr2,
                                 aligned_attr_pairs, sim_th)

    # target-side conflict resolution: keep the most similar source
    aligned = set()
    used2 = set()
    for e1, e2, s in sorted(results, key=lambda x: -x[2]):
        if e2 not in used2:
            aligned.add((e1, e2))
            used2.add(e2)
    return aligned


def align_attribute_by_entities(kgs, aligned_ent_pairs, sim_th: float):
    if not aligned_ent_pairs:
        return set()
    ea1, eav1 = _first_value_dict(kgs.kg1.attribute_triples_set)
    ea2, eav2 = _first_value_dict(kgs.kg2.attribute_triples_set)
    attrs1 = {a for attrs in ea1.values() for a in attrs}
    attrs2 = {a for attrs in ea2.values() for a in attrs}
    aligned = set()
    used2 = set()
    for a1 in attrs1:
        best, best_sim = None, sim_th
        for a2 in attrs2:
            s, cnt = 0.0, 0
            for e1, e2 in aligned_ent_pairs:
                if (e1, a1) in eav1 and (e2, a2) in eav2:
                    s += _lev_ratio(eav1[(e1, a1)], eav2[(e2, a2)])
                    cnt += 1
            if cnt:
                s /= cnt
            if s > best_sim:
                best, best_sim = a2, s
        if best is not None and best not in used2:
            aligned.add((a1, best))
            used2.add(best)
    return aligned


def interactive_model(kgs, args):
    start = time.time()
    aligned_ents: Set[Tuple[int, int]] = set()
    aligned_attrs = get_aligned_attr_pair_by_name_similarity(kgs, 0.6)
    print("aligned_attr_pair_set:", len(aligned_attrs))
    i = 0
    while True:
        i += 1
        it = align_entity_by_attributes(kgs, aligned_attrs,
                                        args.sim_thresholds_ent)
        aligned_ents |= it
        print(i, "len(aligned_ent_pair_set_all):", len(aligned_ents),
              "len(aligned_ent_pair_set_iter):", len(it))
        if i >= args.interactive_model_iter_num:
            break
        new_attrs = align_attribute_by_entities(kgs, aligned_ents,
                                                args.sim_thresholds_attr)
        if len(aligned_attrs | new_attrs) == len(aligned_attrs):
            break
        aligned_attrs |= new_attrs
    print("interactive model time:", time.time() - start)
    return aligned_ents


class IMUSE(BasicModel):

    def check_args(self):
        a = self.args
        assert a.init == "normal"
        assert a.loss == "margin-based"
        assert a.neg_sampling == "uniform"
        assert a.optimizer == "SGD"
        assert a.eval_metric == "inner"
        assert a.loss_norm == "L2"
        assert a.ent_l2_norm is True
        assert a.rel_l2_norm is True
        assert a.neg_triple_num == 1
        assert a.learning_rate >= 0.01

    def init(self):
        # wo_attr ablation: no interactive attribute matching and hence no
        # align-loss pairs (reference approaches_without_attribute/
        # imuse.py:258,339 comments both out)
        if self.args.get("use_attributes", True):
            self.aligned_ent_pair_set = interactive_model(self.kgs, self.args)
        else:
            self.aligned_ent_pair_set = set()
        super().init()
        self.align_opt = get_optimizer(self.args.optimizer, self.args.learning_rate)
        self.align_opt_state = self.align_opt.init(self.params)
        # multi-chip: triple epochs ride the base sharded path; the
        # aligned-pair pull loss gets its own sharded optimizer state
        self.align_opt_state, self._align_osh = self._shard_opt_state(
            self.align_opt_state)
        self._align_step = None

    def _make_align_step(self):
        opt = self.align_opt

        def step(params, opt_state, pairs):
            def loss_fn(p):
                ent = p["ent_embeds"]
                if self.args.ent_l2_norm:
                    ent = l2_normalize(ent)
                e1 = ent[pairs[:, 0]]
                e2 = ent[pairs[:, 1]]
                return jnp.sum(jnp.square(e1 - e2))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return self._jit_custom(step, 1, self._align_osh)

    def launch_align_training_1epo(self, epoch: int):
        if not self.aligned_ent_pair_set:
            return
        start = time.time()
        if self._align_step is None:
            self._align_step = self._make_align_step()
            self._align_pairs = jnp.asarray(
                np.asarray(sorted(self.aligned_ent_pair_set), np.int32))
        # the reference feeds the FULL pair set `steps` times per epoch
        steps = int(math.ceil(len(self.aligned_ent_pair_set)
                              / self.args.batch_size))
        loss = 0.0
        for _ in range(max(1, steps)):
            self.params, self.align_opt_state, l = self._align_step(
                self.params, self.align_opt_state, self._align_pairs)
            loss += float(l)
        n = len(self.aligned_ent_pair_set) * max(1, steps)
        print("epoch {}, align learning loss: {:.4f}, time: {:.4f}s"
              .format(epoch, loss / n, time.time() - start))

    def run(self):
        t = time.time()
        for i in range(1, self.args.max_epoch + 1):
            self.launch_triple_training_1epo(i)
            self.launch_align_training_1epo(i)
            if i >= self.args.start_valid and i % self.args.eval_freq == 0:
                flag = self.valid(self.args.stop_metric)
                self.flag1, self.flag2, self.early_stop = early_stop(
                    self.flag1, self.flag2, flag)
                if self.early_stop or i == self.args.max_epoch:
                    break
        print("Training ends. Total time = {:.3f} s.".format(time.time() - t))
