"""BootEA: AlignE + epsilon-bootstrapping (reference approaches/bootea.py).

Outer loop (reference bootea.py:269-316): every `sub_epoch` epochs of
limited-loss training, mine pseudo-labels from the ref-entity similarity
(threshold ∩ row-top-k → max-weight matching → x/y conflict editing), swap
the pseudo-labeled entities into each other's triples, and take one epoch
of the alignment objective  -Σ log σ(-‖h+r-t‖²)  over those swapped
triples; truncated negative-sampling neighbors are regenerated every
iteration.

TPU design: the alignment objective is a second jitted scan with its own
Adagrad state; pseudo-label triples are padded to power-of-two step counts
so the scan recompiles O(log T) times over a whole run instead of per
iteration.  Bootstrapping sims come from blocked device top-k + pair
gathers (see ops/bootstrapping.py) — the full n1 x n2 matrix never lands
on host.
"""

from __future__ import annotations

import math
import time
from typing import List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from openea_tpu.eval.evaluation import early_stop
from openea_tpu.models.aligne import AlignE
from openea_tpu.ops import bootstrapping as bs
from openea_tpu.ops.initializers import l2_normalize
from openea_tpu.ops.optim import get_optimizer


class BootEA(AlignE):

    def __init__(self):
        super().__init__()
        self.ref_ent1: List[int] = []
        self.ref_ent2: List[int] = []
        self.labeled_align: Set[Tuple[int, int]] = set()

    def init(self):
        super().init()
        self.ref_ent1 = self.kgs.valid_entities1 + self.kgs.test_entities1
        self.ref_ent2 = self.kgs.valid_entities2 + self.kgs.test_entities2
        # host numpy: closed over by jitted fns; numpy embeds at lowering
        # without a device round trip (slow over the TPU tunnel)
        self._ref1 = np.asarray(self.ref_ent1, np.int32)
        self._ref2 = np.asarray(self.ref_ent2, np.int32)
        self.align_opt = get_optimizer(self.args.optimizer, self.args.learning_rate)
        self.align_opt_state = self.align_opt.init(self.params)
        self._align_epoch_cache = {}

    # ------------------------------------------------------------------ #
    # alignment objective on pseudo-labeled triples
    # ------------------------------------------------------------------ #

    def _make_align_epoch_fn(self, steps: int, bs_: int):
        opt = self.align_opt

        def epoch(params, opt_state, triples, w):
            ts = triples.reshape(steps, bs_, 3)
            ws = w.reshape(steps, bs_)

            def step(carry, xs):
                params, opt_state = carry
                batch, wb = xs

                def loss_fn(p):
                    h, r, t = self._lookup(p, batch)
                    e = jnp.sum(jnp.square(h + r - t), axis=-1)
                    return -jnp.sum(jax.nn.log_sigmoid(-e) * wb)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), (ts, ws))
            return params, opt_state, jnp.sum(losses)

        return jax.jit(epoch, donate_argnums=(0, 1))

    def _align_epoch_fn(self, steps: int, bs_: int):
        key = (steps, bs_)
        if key not in self._align_epoch_cache:
            self._align_epoch_cache[key] = self._make_align_epoch_fn(steps, bs_)
        return self._align_epoch_cache[key]

    def train_alignment(self, entities1: Optional[List[int]],
                        entities2: Optional[List[int]],
                        training_epochs: int = 1):
        if entities1 is None or len(entities1) == 0:
            return
        newly1, newly2 = bs.generate_supervised_triples(
            self.kgs.kg1.rt_dict, self.kgs.kg1.hr_dict,
            self.kgs.kg2.rt_dict, self.kgs.kg2.hr_dict, entities1, entities2)
        n = len(newly1) + len(newly2)
        if n == 0:
            return
        bsz = self.args.batch_size
        steps = max(1, math.ceil(n / bsz))
        # round steps to the next power of two -> bounded recompilation
        steps = 1 << (steps - 1).bit_length()
        rows = steps * bsz
        tri = np.zeros((rows, 3), np.int32)
        all_new = np.asarray(newly1 + newly2, np.int32)
        tri[:n] = all_new
        w = (np.arange(rows) < n).astype(np.float32)
        fn = self._align_epoch_fn(steps, bsz)
        for _ in range(training_epochs):
            t1 = time.time()
            self.params, self.align_opt_state, loss = fn(
                self.params, self.align_opt_state, jnp.asarray(tri), jnp.asarray(w))
            print("alignment_loss = {:.3f}, time = {:.3f} s"
                  .format(float(loss) / n, time.time() - t1))

    # ------------------------------------------------------------------ #
    # optional likelihood objective (reference bootea.py:201-267; the
    # reference run loop keeps it disabled — available via args)
    # ------------------------------------------------------------------ #

    def likelihood(self, labeled_align):
        t = time.time()
        slice_ = int(self.args.likelihood_slice)
        n1 = len(self.ref_ent1)
        steps = n1 // slice_
        if steps == 0:
            return
        ref2 = self._ref2
        opt = self.align_opt

        @jax.jit
        def step_fn(params, opt_state, rows, target):
            def loss_fn(p):
                ent = p["ent_embeds"]
                e1 = ent[rows]
                e2 = ent[ref2]
                if self.args.ent_l2_norm:
                    e1, e2 = l2_normalize(e1), l2_normalize(e2)
                mat = jax.nn.log_sigmoid(e1 @ e2.T)
                return -jnp.sum(mat * target)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        rng = np.random.RandomState(len(self.labeled_align))
        total = 0.0
        ref1 = np.asarray(self.ref_ent1, np.int32)
        for _ in range(steps):
            idx = rng.choice(n1, slice_, replace=False)
            target = bs.calculate_likelihood_rows(n1, len(self.ref_ent2),
                                                  labeled_align, idx)
            self.params, self.align_opt_state, loss = step_fn(
                self.params, self.align_opt_state,
                jnp.asarray(ref1[idx]), jnp.asarray(target))
            total += float(loss)
        print("likelihood_loss = {:.3f}, time = {:.3f} s".format(total, time.time() - t))

    # ------------------------------------------------------------------ #
    # outer loop
    # ------------------------------------------------------------------ #

    def _ref_embeddings(self):
        ent = self.params["ent_embeds"]
        e1 = l2_normalize(ent[self._ref1])
        e2 = l2_normalize(ent[self._ref2])
        return e1, e2

    def run(self):
        t = time.time()
        sub_num = self.args.sub_epoch
        iter_nums = self.args.max_epoch // sub_num
        for i in range(1, iter_nums + 1):
            print("\niteration", i)
            # one jitted super-step for the whole sub-epoch block
            self.launch_training_k_epo((i - 1) * sub_num + 1, sub_num)
            if i * sub_num >= self.args.start_valid:
                flag = self.valid(self.args.stop_metric)
                self.flag1, self.flag2, self.early_stop = early_stop(
                    self.flag1, self.flag2, flag)
                if self.early_stop or i == iter_nums:
                    break
            e1, e2 = self._ref_embeddings()
            self.labeled_align, rows, cols = bs.bootstrapping(
                e1, e2, self.labeled_align, self.args.sim_th, self.args.k,
                block=self.args.eval_block_size,
                mesh=self._eval_mesh() if self.mesh is not None else None)
            if rows is not None:
                ents1 = [self.ref_ent1[r] for r in rows]
                ents2 = [self.ref_ent2[c] for c in cols]
                self.train_alignment(ents1, ents2, 1)
            if self.args.get("use_likelihood", False):
                self.likelihood(self.labeled_align)
            if i * sub_num >= self.args.start_valid:
                self.valid(self.args.stop_metric)
            self._regenerate_neighbors()
        print("Training ends. Total time = {:.3f} s.".format(time.time() - t))
