"""Pallas kernels (interpret mode on CPU; compiled path covered on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openea_tpu.ops.pallas_kernels import manhattan_rank


@pytest.mark.parametrize("shape", [(70, 90, 13), (33, 200, 48), (128, 64, 300)])
def test_manhattan_rank_matches_naive(shape):
    n1, n2, d = shape
    rng = np.random.RandomState(n1)
    e1 = rng.randn(n1, d).astype(np.float32)
    e2 = rng.randn(n2, d).astype(np.float32)
    gold = rng.randint(0, n2, n1)
    ranks, best = manhattan_rank(jnp.asarray(e1), jnp.asarray(e2),
                                 jnp.asarray(gold), tm=16, tn=32,
                                 feat_chunk=8, interpret=True)
    D = np.abs(e1[:, None, :] - e2[None, :, :]).sum(-1)
    gold_d = D[np.arange(n1), gold]
    mask = np.ones((n1, n2), bool)
    mask[np.arange(n1), gold] = False
    ref_rank = ((D < gold_d[:, None]) & mask).sum(1)
    ref_best = np.argmin(D, axis=1)
    assert np.array_equal(np.asarray(ranks), ref_rank)
    assert np.array_equal(np.asarray(best), ref_best)


def test_manhattan_rank_gold_rank_zero_for_exact_match():
    rng = np.random.RandomState(0)
    e = rng.randn(20, 16).astype(np.float32)
    ranks, best = manhattan_rank(jnp.asarray(e), jnp.asarray(e),
                                 jnp.arange(20), tm=16, tn=32,
                                 feat_chunk=8, interpret=True)
    assert np.all(np.asarray(ranks) == 0)
    assert np.array_equal(np.asarray(best), np.arange(20))
