"""Formula-level activation parity for the riskiest re-designs.

Each test replicates the reference's exact computation in float64 numpy
and checks our float32 TPU formulation against it (VERDICT r1 item 7):

* RotatE: f32 complex rotation vs the reference's float64 workaround
  (reference models/semantic/rotate.py:52-119 — float64 tables exist only
  to dodge a NaN in sqrt; the formula itself must match).
* RSN4EA: identity-activation LSTM vs TF BasicLSTMCell(activation=identity,
  forget_bias=1.0) semantics (reference approaches/rsn4ea.py RSN cells).
* AliNet: BatchNormalization-as-affine vs keras BN inference mode with
  unit moving statistics (reference approaches/alinet.py BN layers).
"""

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------- #
# RotatE
# --------------------------------------------------------------------- #

def _rotate_reference_f64(re_h, im_h, re_t, im_t, rel, gamma, dim,
                          epsilon=2.0):
    """Reference rotate.py score in float64: phase rotation, complex
    modulus distance, gamma - sum."""
    emb_range = (gamma + epsilon) / dim
    phase = rel.astype(np.float64) / (emb_range / np.pi)
    rr, ir = np.cos(phase), np.sin(phase)
    re_s = re_h * rr - im_h * ir - re_t
    im_s = re_h * ir + im_h * rr - im_t
    d = np.sqrt(re_s ** 2 + im_s ** 2).sum(-1)
    return gamma - d


def test_rotate_score_matches_float64_reference():
    from openea_tpu.config import Args
    from openea_tpu.registry import get_model

    rng = np.random.RandomState(0)
    n_ent, n_rel, d, gamma = 50, 7, 32, 12.0
    model = get_model("RotatE")()
    model.set_args(Args(dict(embedding_module="RotatE", dim=d, gamma=gamma,
                             init="uniform", alignment_module="sharing",
                             neg_sampling="uniform", optimizer="Adam",
                             eval_metric="inner", ent_l2_norm=False,
                             rel_l2_norm=False, learning_rate=1e-3,
                             batch_size=128, max_epoch=1, neg_triple_num=1)))
    model.check_args()
    re_e = rng.randn(n_ent, d).astype(np.float32) * 0.1
    im_e = rng.randn(n_ent, d).astype(np.float32) * 0.1
    rel = rng.randn(n_rel, d).astype(np.float32) * model.embedding_range
    # extreme phases too — the f64 workaround exists for these
    rel[0] = 1e3 * model.embedding_range
    model.params = {"re_ent_embeds": jnp.asarray(re_e),
                    "im_ent_embeds": jnp.asarray(im_e),
                    "rel_embeds": jnp.asarray(rel)}
    triples = rng.randint(0, min(n_ent, n_rel), (64, 3)).astype(np.int32)
    got = np.asarray(model._scores(model.params, jnp.asarray(triples)))
    assert np.all(np.isfinite(got))
    want = _rotate_reference_f64(
        re_e[triples[:, 0]].astype(np.float64),
        im_e[triples[:, 0]].astype(np.float64),
        re_e[triples[:, 2]].astype(np.float64),
        im_e[triples[:, 2]].astype(np.float64),
        rel[triples[:, 1]], gamma, d)
    assert np.abs(got - want).max() < 5e-3


# --------------------------------------------------------------------- #
# RSN4EA identity-activation LSTM
# --------------------------------------------------------------------- #

def _tf_basic_lstm_identity_f64(x_seq, w, b, forget_bias=1.0):
    """TF BasicLSTMCell(activation=identity) in float64:
    i,j,f,o = split(concat([x,h]) @ w + b); c = sig(f+fb)*c + sig(i)*j;
    h = sig(o)*c."""
    def sig(z):
        return 1.0 / (1.0 + np.exp(-z))
    B, T, hdim = x_seq.shape
    h = np.zeros((B, hdim))
    c = np.zeros((B, hdim))
    ys = []
    for t in range(T):
        z = np.concatenate([x_seq[:, t], h], -1) @ w + b
        i, j, f, o = np.split(z, 4, axis=-1)
        c = sig(f + forget_bias) * c + sig(i) * j
        h = sig(o) * c
        ys.append(h)
    return np.stack(ys, axis=1)


def test_rsn4ea_lstm_matches_tf_cell_semantics():
    from openea_tpu.config import Args
    from openea_tpu.registry import get_model

    rng = np.random.RandomState(1)
    B, T, h = 4, 5, 16
    model = get_model("RSN4EA")()
    model.args = Args(dict(keep_prob=1.0))
    model._num_layers = 1
    w = rng.randn(2 * h, 4 * h).astype(np.float32) * 0.3
    b = rng.randn(4 * h).astype(np.float32) * 0.1
    x = rng.randn(B, T, h).astype(np.float32)
    p = {"lstm0_w": jnp.asarray(w), "lstm0_b": jnp.asarray(b)}
    got = np.asarray(model._lstm(p, jnp.asarray(x), jax.random.PRNGKey(0)))
    want = _tf_basic_lstm_identity_f64(x.astype(np.float64),
                                       w.astype(np.float64),
                                       b.astype(np.float64))
    assert np.abs(got - want).max() < 1e-4


# --------------------------------------------------------------------- #
# AliNet BN-as-affine
# --------------------------------------------------------------------- #

def test_alinet_bn_matches_keras_inference_mode():
    from openea_tpu.models.alinet import _affine_bn

    rng = np.random.RandomState(2)
    x = rng.randn(10, 8).astype(np.float32)
    gamma = rng.rand(8).astype(np.float32) + 0.5
    beta = rng.randn(8).astype(np.float32)
    eps = 1e-3
    # keras BatchNormalization inference: (x - mean) / sqrt(var + eps)
    # with moving mean 0, moving var 1 (fresh layer, as in the reference
    # which never updates statistics outside training batches)
    want = (gamma.astype(np.float64)
            * (x.astype(np.float64) - 0.0) / np.sqrt(1.0 + eps)
            + beta.astype(np.float64))
    got = np.asarray(_affine_bn(jnp.asarray(x), jnp.asarray(gamma),
                                jnp.asarray(beta)))
    assert np.abs(got - want).max() < 1e-5


# --------------------------------------------------------------------- #
# parity harness smoke (CI proof the real-data path executes)
# --------------------------------------------------------------------- #

def test_parity_harness_synthetic_smoke(capsys):
    from openea_tpu.cli.parity import main
    rc = main(["--synthetic", "--configs", "mtranse_enfr_15k"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "mtranse_enfr_15k" in out and '"parity"' in out
