"""Optimizer factory (optax) + sparse row-wise Adagrad.

Mirrors reference modules/base/optimizers.py:4-20 (TF1 Adagrad/Adadelta/
Adam/SGD).  Note on sparse-vs-dense Adagrad semantics: TF1 applies sparse
Adagrad only to looked-up rows; with dense gradients from XLA scatter-add,
untouched rows have exactly zero gradient, so their accumulators and values
are unchanged — optax.adagrad is bit-equivalent to TF's lazy behavior here.
TF Adagrad's default initial_accumulator_value=0.1 is matched explicitly.

``sparse_adagrad_apply`` is the performance form of the same update: an
embedding-training step touches O(batch) rows of an O(N)-row table, but
the dense optax step reads and rewrites the full table AND its
accumulator every step (plus the zeros+scatter to build the dense grad).
Restricting the update to the touched rows is mathematically identical
(zero-grad rows change neither accumulator nor value) at O(batch*d) HBM
traffic — the TPU equivalent of TF1's sparse Adagrad fast path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

_RSS_EPS = 1e-7   # optax scale_by_rss eps


def sparse_adagrad_apply(table: jax.Array, acc: jax.Array, idx: jax.Array,
                         row_grads: jax.Array, lr: float):
    """One Adagrad step restricted to rows ``idx`` (duplicates summed,
    matching dense scatter-add semantics).

    table [N, d], acc [N, d] (sum-of-squares state), idx [m],
    row_grads [m, d] — gradients w.r.t. the GATHERED rows.
    Returns (new_table, new_acc)."""
    m = int(idx.shape[0])
    n = table.shape[0]
    # unique touched rows at static size m; fill slots point out of
    # bounds and carry zero gradient, so mode='drop' discards them
    uniq, inv = jnp.unique(idx, return_inverse=True, size=m, fill_value=n)
    g = jax.ops.segment_sum(row_grads, inv.reshape(-1), num_segments=m)
    safe = jnp.minimum(uniq, n - 1)
    acc_rows = acc[safe] + g * g
    upd = (-lr) * g * jax.lax.rsqrt(acc_rows + _RSS_EPS)
    return (table.at[uniq].add(upd, mode="drop"),
            acc.at[uniq].set(acc_rows, mode="drop"))


def rss_state(opt_state):
    """The sum-of-squares pytree of an optax.adagrad state."""
    return opt_state[0].sum_of_squares


def replace_rss(opt_state, new_sos):
    """opt_state with its sum-of-squares pytree replaced."""
    return (opt_state[0]._replace(sum_of_squares=new_sos),) + tuple(
        opt_state[1:])


def get_optimizer(name: str, learning_rate: float) -> optax.GradientTransformation:
    if name == "Adagrad":
        return optax.adagrad(learning_rate, initial_accumulator_value=0.1)
    if name == "Adadelta":
        return optax.adadelta(learning_rate, rho=0.95, eps=1e-8)
    if name == "Adam":
        return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    if name == "SGD":
        return optax.sgd(learning_rate)
    raise ValueError(f"unknown optimizer {name!r}")
