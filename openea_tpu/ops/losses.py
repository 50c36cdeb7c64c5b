"""Alignment / KGE losses (JAX).

Formula-parity re-implementations of the reference's five losses
(modules/base/losses.py:4-80), with one addition: every loss takes an
optional per-sample weight/mask so that statically-shaped padded batches
(the TPU replacement for the reference's ragged last batch) contribute
exactly the same sums as the reference's dynamic batches.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def triple_score(h: jax.Array, r: jax.Array, t: jax.Array,
                 loss_norm: str = "L2") -> jax.Array:
    """TransE energy per sample: ||h + r - t||_1 or squared-L2 (reference
    uses sum-of-squares for 'L2', not the norm)."""
    d = h + r - t
    if loss_norm == "L1":
        return jnp.sum(jnp.abs(d), axis=-1)
    return jnp.sum(jnp.square(d), axis=-1)


def _wsum(x: jax.Array, w: Optional[jax.Array]) -> jax.Array:
    return jnp.sum(x) if w is None else jnp.sum(x * w)


def margin_loss(phs, prs, pts, nhs, nrs, nts, margin: float, loss_norm: str,
                pos_w: Optional[jax.Array] = None,
                neg_w: Optional[jax.Array] = None) -> jax.Array:
    """sum relu(margin + pos - neg).  With neg_triple_num > 1, positive
    scores must be pre-tiled by the caller to match neg shape (the
    reference feeds tiled placeholder batches)."""
    pos = triple_score(phs, prs, pts, loss_norm)
    neg = triple_score(nhs, nrs, nts, loss_norm)
    w = None
    if pos_w is not None or neg_w is not None:
        w = (pos_w if pos_w is not None else 1.0) * (neg_w if neg_w is not None else 1.0)
    return _wsum(jax.nn.relu(margin + pos - neg), w)


def positive_loss(phs, prs, pts, loss_norm: str,
                  pos_w: Optional[jax.Array] = None) -> jax.Array:
    return _wsum(triple_score(phs, prs, pts, loss_norm), pos_w)


def limited_loss(phs, prs, pts, nhs, nrs, nts, pos_margin: float,
                 neg_margin: float, loss_norm: str, balance: float = 1.0,
                 pos_w: Optional[jax.Array] = None,
                 neg_w: Optional[jax.Array] = None) -> jax.Array:
    """sum relu(pos - mu1) + balance * sum relu(mu2 - neg)."""
    pos = triple_score(phs, prs, pts, loss_norm)
    neg = triple_score(nhs, nrs, nts, loss_norm)
    pos_l = _wsum(jax.nn.relu(pos - pos_margin), pos_w)
    neg_l = _wsum(jax.nn.relu(neg_margin - neg), neg_w)
    return pos_l + balance * neg_l


def logistic_loss(phs, prs, pts, nhs, nrs, nts, loss_norm: str,
                  pos_w: Optional[jax.Array] = None,
                  neg_w: Optional[jax.Array] = None) -> jax.Array:
    """sum log(1+e^pos) + sum log(1+e^-neg), numerically via softplus."""
    pos = triple_score(phs, prs, pts, loss_norm)
    neg = triple_score(nhs, nrs, nts, loss_norm)
    return _wsum(jax.nn.softplus(pos), pos_w) + _wsum(jax.nn.softplus(-neg), neg_w)


def get_loss_func(phs, prs, pts, nhs, nrs, nts, args, pos_w=None, neg_w=None):
    if args.loss == "margin-based":
        return margin_loss(phs, prs, pts, nhs, nrs, nts, args.margin,
                           args.loss_norm, pos_w, neg_w)
    if args.loss == "logistic":
        return logistic_loss(phs, prs, pts, nhs, nrs, nts, args.loss_norm,
                             pos_w, neg_w)
    if args.loss == "limited":
        return limited_loss(phs, prs, pts, nhs, nrs, nts, args.pos_margin,
                            args.neg_margin, args.loss_norm,
                            balance=args.neg_margin_balance,
                            pos_w=pos_w, neg_w=neg_w)
    raise ValueError(f"unknown loss {args.loss!r}")


def mapping_loss(tes1: jax.Array, tes2: jax.Array, mapping: jax.Array,
                 w: Optional[jax.Array] = None) -> jax.Array:
    """||e1 M - e2||^2 + ||M M^T - I||^2 (reference losses.py:76-80)."""
    mapped = tes1 @ mapping
    sq = jnp.sum(jnp.square(tes2 - mapped), axis=-1)
    map_l = _wsum(sq, w)
    eye = jnp.eye(mapping.shape[0], dtype=mapping.dtype)
    orth_l = jnp.sum(jnp.square(mapping @ mapping.T - eye))
    return map_l + orth_l
