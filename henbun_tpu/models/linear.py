"""Variational linear model — the reference's tutorial workload
(`/root/reference/notebooks/Henbun_structure2.ipynb`): y = a + b*x + eps with
Normal variational posteriors over a, b and the log-variance c.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

import henbun_tpu as hb
from henbun_tpu import densities


class VariationalLinearModel(hb.model.Model):
    def setUp(self, X, Y):
        self.X = hb.Data(X)
        self.Y = hb.Data(Y)
        self.a = hb.variationals.Normal(shape=[1])
        self.b = hb.variationals.Normal(shape=[1])
        self.c = hb.variationals.Normal(shape=[1])

    def fit(self):
        """Posterior sample of the fit (the notebook builds this op in
        tf_mode during setUp; here it is simply a traced method)."""
        return self.a + self.b * self.X

    @hb.AutoOptimize()
    def elbo(self):
        log_lik = densities.gaussian(self.Y, self.fit(), jnp.exp(self.c))
        return jnp.sum(log_lik) - self.KL()


class MAPLinearModel(hb.model.Model):
    """Point-estimate (MAP) variant, the Henbun_structure.ipynb workload:
    plain Variables, log posterior = log lik (+ implicit flat prior)."""

    def setUp(self, X, Y):
        self.X = hb.Data(X)
        self.Y = hb.Data(Y)
        self.a = hb.Variable(shape=[1])
        self.b = hb.Variable(shape=[1])
        self.c = hb.Variable(shape=[1])

    @hb.AutoOptimize()
    def logp(self):
        fit = self.a + self.b * self.X
        return jnp.sum(densities.gaussian(self.Y, fit, jnp.exp(self.c)))


def make_linear_dataset(n=100, a=1.0, b=2.0, noise=0.5, seed=0):
    rng = np.random.default_rng(seed)
    X = np.linspace(-1, 1, n).reshape(-1, 1).astype(np.float32)
    Y = (a + b * X + rng.normal(size=(n, 1)) * noise).astype(np.float32)
    return X, Y
