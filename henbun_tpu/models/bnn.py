"""Bayesian neural network regression — the HMC/NUTS workload family
(BASELINE.json config 4: NUTS/HMC posterior sampling on GP hyperparameters +
BNN weights, 256 sharded chains).

Two variants:
* ``VariationalBNN`` — SVI with Variational weights (mean-field q over every
  weight matrix), trainable by the standard ELBO driver.
* ``BNN`` — point-weight network whose ``log_posterior`` objective is the
  target density for the HMC/NUTS/SMC samplers in
  :mod:`henbun_tpu.inference`.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

import henbun_tpu as hb
from henbun_tpu import densities


class VariationalBNN(hb.model.Model):
    """Mean-field variational BNN: every weight/bias is a Normal posterior."""

    def setUp(self, X, Y, hidden=32, var=0.1):
        self.x = hb.Data(X)
        self.y = hb.Data(Y)
        self.obs_var = var
        d_in, d_out = X.shape[1], Y.shape[1]
        self.net = hb.nn.NeuralNet(
            [d_in, hidden, d_out],
            variable_types=hb.variationals.Normal,
            neuron_types=hb.nn.tanh,
            stddev=0.5,
        )

    @hb.AutoOptimize()
    def ELBO(self):
        y_fit = self.net(self.x)
        return jnp.sum(densities.gaussian(self.y, y_fit, self.obs_var)) - self.KL()


class BNN(hb.model.Model):
    """Point-weight BNN with a Gaussian weight prior; `log_posterior` is the
    HMC/NUTS target over the flattened weight vector."""

    def setUp(self, X, Y, hidden=32, var=0.1, prior_var=1.0):
        self.x = hb.Data(X)
        self.y = hb.Data(Y)
        self.obs_var = var
        self.prior_var = prior_var
        d_in, d_out = X.shape[1], Y.shape[1]
        self.net = hb.nn.NeuralNet(
            [d_in, hidden, d_out], neuron_types=hb.nn.tanh, stddev=0.5
        )

    @hb.AutoOptimize()
    def log_posterior(self):
        y_fit = self.net(self.x)
        log_lik = jnp.sum(densities.gaussian(self.y, y_fit, self.obs_var))
        log_prior = sum(
            jnp.sum(densities.gaussian(v.tensor(), 0.0, self.prior_var))
            for v in self.net.get_variables()
        )
        return log_lik + log_prior


def make_bnn_dataset(n=128, seed=0):
    rng = np.random.default_rng(seed)
    X = np.linspace(-2, 2, n).reshape(-1, 1).astype(np.float32)
    Y = (np.sin(2 * X) + rng.normal(size=(n, 1)) * 0.2).astype(np.float32)
    return X, Y
