"""Prior distributions over (transformed) parameters.

Parity with `/root/reference/Henbun/priors.py:28-117`. Hyperparameters are
fixed numpy arrays (not trainable), as in the reference.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ._settings import settings, np_float
from .core.param import Parameterized
from . import densities


class Prior(Parameterized):
    def logp(self, x):
        """Sum of elementwise log densities of the prior at x."""
        raise NotImplementedError

    def __str__(self):
        raise NotImplementedError


class Normal(Prior):
    """Zero-mean unit-variance Gaussian prior."""

    def logp(self, x):
        return -0.5 * jnp.sum(np.log(2 * np.pi) + jnp.square(x))

    def __str__(self):
        return "N(0,1)"


class Gaussian(Prior):
    def __init__(self, mu, var):
        Prior.__init__(self)
        self.mu = np.atleast_1d(np.array(mu, np_float()))
        self.var = np.atleast_1d(np.array(var, np_float()))

    def logp(self, x):
        return jnp.sum(densities.gaussian(x, self.mu, self.var))

    def __str__(self):
        return "N(" + str(self.mu) + "," + str(self.var) + ")"


class LogNormal(Prior):
    def __init__(self, mu, var):
        Prior.__init__(self)
        self.mu = np.atleast_1d(np.array(mu, np_float()))
        self.var = np.atleast_1d(np.array(var, np_float()))

    def logp(self, x):
        return jnp.sum(densities.lognormal(x, self.mu, self.var))

    def __str__(self):
        return "logN(" + str(self.mu) + "," + str(self.var) + ")"


class Gamma(Prior):
    def __init__(self, shape, scale):
        Prior.__init__(self)
        self.shape = np.atleast_1d(np.array(shape, np_float()))
        self.scale = np.atleast_1d(np.array(scale, np_float()))

    def logp(self, x):
        return jnp.sum(densities.gamma(self.shape, self.scale, x))

    def __str__(self):
        return "Ga(" + str(self.shape) + "," + str(self.scale) + ")"


class Laplace(Prior):
    def __init__(self, mu, sigma):
        Prior.__init__(self)
        self.mu = np.atleast_1d(np.array(mu, np_float()))
        self.sigma = np.atleast_1d(np.array(sigma, np_float()))

    def logp(self, x):
        return jnp.sum(densities.laplace(self.mu, self.sigma, x))

    def __str__(self):
        return "Lap.(" + str(self.mu) + "," + str(self.sigma) + ")"


class Uniform(Prior):
    def __init__(self, lower=0, upper=1):
        Prior.__init__(self)
        self.log_height = -np.log(upper - lower)
        self.lower, self.upper = lower, upper

    def logp(self, x):
        return self.log_height * jnp.asarray(
            jnp.size(x), settings.dtypes.float_type
        )

    def __str__(self):
        return "U(" + str(self.lower) + "," + str(self.upper) + ")"
