"""Optimizer factory (optax).

Mirrors reference modules/base/optimizers.py:4-20 (TF1 Adagrad/Adadelta/
Adam/SGD).  Note on sparse-vs-dense Adagrad semantics: TF1 applies sparse
Adagrad only to looked-up rows; with dense gradients from XLA scatter-add,
untouched rows have exactly zero gradient, so their accumulators and values
are unchanged — optax.adagrad is bit-equivalent to TF's lazy behavior here.
TF Adagrad's default initial_accumulator_value=0.1 is matched explicitly.
"""

from __future__ import annotations

import optax


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
