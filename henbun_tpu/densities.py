"""Elementwise log-density functions.

Parity with `/root/reference/Henbun/densities.py:25-103` (11 densities), traced
with jnp so every density fuses into the surrounding ELBO computation under
XLA. ``bernoulli`` is fixed relative to the reference, whose version used the
TF<1.0-only ``tf.select`` and crashes under its own declared dependency
(`densities.py:35-36`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ._settings import settings
from .ops.linalg import log_sum_exp, tri_solve


def gaussian(x, mu, var):
    return -0.5 * np.log(2 * np.pi) - 0.5 * jnp.log(var) - 0.5 * jnp.square(mu - x) / var


def lognormal(x, mu, var):
    lnx = jnp.log(x)
    return gaussian(lnx, mu, var) - lnx


def bernoulli(p, y):
    return jnp.log(jnp.where(jnp.equal(y, 1), p, 1 - p))


def poisson(lamb, y):
    return y * jnp.log(lamb) - lamb - jax.lax.lgamma(y + 1.0)


def exponential(lamb, y):
    return -y / lamb - jnp.log(lamb)


def gamma(shape, scale, x):
    return (
        -shape * jnp.log(scale)
        - jax.lax.lgamma(shape)
        + (shape - 1.0) * jnp.log(x)
        - x / scale
    )


def student_t(x, mean, scale, deg_free):
    deg_free = jnp.asarray(deg_free, settings.dtypes.float_type)
    const = (
        jax.lax.lgamma((deg_free + 1.0) * 0.5)
        - jax.lax.lgamma(deg_free * 0.5)
        - 0.5 * (jnp.log(jnp.square(scale)) + jnp.log(deg_free) + np.log(np.pi))
    )
    return const - 0.5 * (deg_free + 1.0) * jnp.log(
        1.0 + (1.0 / deg_free) * (jnp.square((x - mean) / scale))
    )


def beta(alpha, beta, y):
    # clip y away from {0, 1} since log of 0 is nan (cf. densities.py:62-68)
    y = jnp.clip(y, 1e-6, 1 - 1e-6)
    return (
        (alpha - 1.0) * jnp.log(y)
        + (beta - 1.0) * jnp.log(1.0 - y)
        + jax.lax.lgamma(alpha + beta)
        - jax.lax.lgamma(alpha)
        - jax.lax.lgamma(beta)
    )


def laplace(mu, sigma, y):
    return -jnp.abs(mu - y) / sigma - jnp.log(2.0 * sigma)


def multivariate_normal(x, mu, L):
    """Multivariate normal log density given the Cholesky factor L of the
    covariance. x, mu are vectors or [n, k] matrices (independent columns);
    the row count must match the size of L (cf. densities.py:75-91)."""
    d = x - mu
    d2 = d[:, None] if d.ndim == 1 else d
    alpha = tri_solve(L, d2)
    num_col = 1 if x.ndim == 1 else x.shape[1]
    num_dims = x.shape[0]
    ret = -0.5 * num_dims * num_col * np.log(2 * np.pi)
    ret += -num_col * jnp.sum(jnp.log(jnp.diagonal(L)))
    ret += -0.5 * jnp.sum(jnp.square(alpha))
    return ret


def bimixture(fraction, logp0, logp1):
    """log(fraction*exp(logp0) + (1-fraction)*exp(logp1)), stable
    (cf. densities.py:94-103)."""
    return log_sum_exp(
        jnp.stack([logp0 + jnp.log(fraction), logp1 + jnp.log(1.0 - fraction)], axis=-1),
        axis=-1,
    )
