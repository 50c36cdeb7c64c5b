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


@pytest.mark.parametrize("shape", [(70, 90, 13), (40, 300, 128)])
def test_inner_rank_both_matches_naive(shape):
    from openea_tpu.ops.pallas_kernels import inner_rank_both
    n1, n2, d = shape
    rng = np.random.RandomState(n2)
    e1 = rng.randn(n1, d).astype(np.float32)
    e2 = rng.randn(n2, d).astype(np.float32)
    gold = rng.randint(0, n2, n1)
    k = 5
    S = e1.astype(np.float64) @ e2.astype(np.float64).T
    r1 = np.sort(S, axis=1)[:, -k:].mean(1)
    r2 = np.sort(S.T, axis=1)[:, -k:].mean(1)
    ranks, best, ranks_c, best_c = inner_rank_both(
        jnp.asarray(e1), jnp.asarray(e2), jnp.asarray(gold),
        r2=jnp.asarray(r2.astype(np.float32)),
        r2_gold=jnp.asarray(r2[gold].astype(np.float32)),
        tm=16, tn=128, interpret=True)

    def ref(mat):
        gd = mat[np.arange(n1), gold]
        mask = np.ones((n1, n2), bool)
        mask[np.arange(n1), gold] = False
        return ((mat > gd[:, None]) & mask).sum(1), np.argmax(mat, axis=1)

    # f32 vs f64 boundary effects are measure-zero on random data
    rr, rb = ref(S)
    rrc, rbc = ref(2.0 * S - r1[:, None] - r2[None, :])
    assert np.array_equal(np.asarray(ranks), rr)
    assert np.array_equal(np.asarray(best), rb)
    assert np.array_equal(np.asarray(ranks_c), rrc)
    assert np.array_equal(np.asarray(best_c), rbc)


def test_inner_rank_euclidean_matches_naive():
    from openea_tpu.ops.pallas_kernels import inner_rank_both
    n1, n2, d, k = 50, 170, 32, 5
    rng = np.random.RandomState(7)
    e1 = rng.randn(n1, d).astype(np.float32)
    e2 = rng.randn(n2, d).astype(np.float32)
    gold = rng.randint(0, n2, n1)
    S = 1.0 - np.sqrt(((e1[:, None, :].astype(np.float64)
                        - e2[None, :, :].astype(np.float64)) ** 2).sum(-1))
    r1 = np.sort(S, axis=1)[:, -k:].mean(1)
    r2 = np.sort(S.T, axis=1)[:, -k:].mean(1)
    Sc = 2.0 * S - r1[:, None] - r2[None, :]
    mask = np.ones((n1, n2), bool)
    mask[np.arange(n1), gold] = False
    ranks, best, ranks_c, best_c = inner_rank_both(
        jnp.asarray(e1), jnp.asarray(e2), jnp.asarray(gold),
        r2=jnp.asarray(r2.astype(np.float32)),
        r2_gold=jnp.asarray(r2[gold].astype(np.float32)),
        tm=16, tn=128, interpret=True, metric="euclidean")
    gd = S[np.arange(n1), gold]
    assert np.array_equal(np.asarray(ranks),
                          ((S > gd[:, None]) & mask).sum(1))
    assert np.array_equal(np.asarray(best), np.argmax(S, axis=1))
    gdc = Sc[np.arange(n1), gold]
    assert np.array_equal(np.asarray(ranks_c),
                          ((Sc > gdc[:, None]) & mask).sum(1))


def test_inner_rank_plain_only_and_exact_match():
    from openea_tpu.ops.pallas_kernels import inner_rank_both
    rng = np.random.RandomState(3)
    e = rng.randn(30, 24).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    ranks, best, rc, bc = inner_rank_both(
        jnp.asarray(e), jnp.asarray(e), jnp.arange(30), csls=False,
        tm=16, tn=128, interpret=True)
    assert rc is None and bc is None
    assert np.all(np.asarray(ranks) == 0)
    assert np.array_equal(np.asarray(best), np.arange(30))


@pytest.mark.parametrize("shape", [(60, 80, 13), (33, 150, 48)])
def test_manhattan_rank_both_csls_matches_naive(shape):
    from openea_tpu.ops.pallas_kernels import manhattan_rank_both
    n1, n2, d = shape
    rng = np.random.RandomState(n1 + 1)
    e1 = rng.randn(n1, d).astype(np.float32)
    e2 = rng.randn(n2, d).astype(np.float32)
    gold = rng.randint(0, n2, n1)
    k = 4
    D = np.abs(e1[:, None, :].astype(np.float64)
               - e2[None, :, :].astype(np.float64)).sum(-1)
    S = 1.0 - D
    r1 = np.sort(S, axis=1)[:, -k:].mean(1)
    r2 = np.sort(S.T, axis=1)[:, -k:].mean(1)
    Sc = 2.0 * S - r1[:, None] - r2[None, :]
    mask = np.ones((n1, n2), bool)
    mask[np.arange(n1), gold] = False

    ranks, best, ranks_c, best_c = manhattan_rank_both(
        jnp.asarray(e1), jnp.asarray(e2), jnp.asarray(gold),
        r2=jnp.asarray(r2.astype(np.float32)),
        r2_gold=jnp.asarray(r2[gold].astype(np.float32)),
        tm=16, tn=32, feat_chunk=8, interpret=True)

    gd = S[np.arange(n1), gold]
    assert np.array_equal(np.asarray(ranks),
                          ((S > gd[:, None]) & mask).sum(1))
    assert np.array_equal(np.asarray(best), np.argmax(S, axis=1))
    gdc = Sc[np.arange(n1), gold]
    assert np.array_equal(np.asarray(ranks_c),
                          ((Sc > gdc[:, None]) & mask).sum(1))
    assert np.array_equal(np.asarray(best_c), np.argmax(Sc, axis=1))


def test_manhattan_rank_gold_rank_zero_for_exact_match():
    rng = np.random.RandomState(0)
    e = rng.randn(20, 16).astype(np.float32)
    ranks, best = manhattan_rank(jnp.asarray(e), jnp.asarray(e),
                                 jnp.arange(20), tm=16, tn=32,
                                 feat_chunk=8, interpret=True)
    assert np.all(np.asarray(ranks) == 0)
    assert np.array_equal(np.asarray(best), np.arange(20))
