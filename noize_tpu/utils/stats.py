"""Small statistics helpers — Regression parity.

Reference: ``Regression`` (/root/reference/Geologic/ParticleErosion/
Regression.cs:8-48 active portion): mean, sum-of-square-differences, SXY,
MSE, log-model prediction.  Vectorized jnp one-liners; kept because the
pool-solver lineage used them and they're part of the public surface."""

from __future__ import annotations

import jax.numpy as jnp


def mean(items):
    return jnp.mean(items)


def sum_square_difference(items):
    m = jnp.mean(items)
    return jnp.sum((items - m) ** 2)


def compute_sxy(xs, ys):
    return jnp.sum((xs - jnp.mean(xs)) * (ys - jnp.mean(ys)))


def mean_square_error(pred, real):
    return jnp.mean((pred - real) ** 2)


def predict_log(x, b1, b2):
    return b1 + b2 * jnp.log(x)


def fit_log(xs, ys):
    """Least-squares fit of y = b1 + b2·log(x) (the LogRegression the
    reference sketched but left commented — Regression.cs:49+)."""
    lx = jnp.log(xs)
    b2 = compute_sxy(lx, ys) / sum_square_difference(lx)
    b1 = jnp.mean(ys) - b2 * jnp.mean(lx)
    return b1, b2
