"""Sparse variational GP regression at scale (SVGP-style).

The reference provides the pieces — `SparseGP.samples` (`gp/gp.py:53-143`),
`MinibatchData`, whitened `Normal` variational inducing values — but no
assembled large-N workload. This family assembles them: minibatch SVI over N
datapoints with m inducing points, the scalable-GP counterpart of the n^3
GPR family.

    u ~ N(0, I) whitened inducing values, q(u) = Normal(q_mu, q_sqrt)
    f_i = [Lm^-1 K(z, x_i)]^T u (+ diagonal correction noise) * sqrt(k_var)
    ELBO = N/|B| sum_{i in B} log N(y_i | f_i, var) - KL(q(u) || N(0, I))
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

import henbun_tpu as hb
from henbun_tpu import densities


class SVGPRegression(hb.model.Model):
    def setUp(self, X, Y, num_inducing=64, q_shape="fullrank"):
        self.x = hb.MinibatchData(X)
        self.y = hb.MinibatchData(Y)
        self.n_data = X.shape[0]
        # inducing locations initialized on quantiles of the data
        z = np.quantile(
            X, np.linspace(0.0, 1.0, num_inducing), axis=0
        ).astype(np.float32)
        self.gp = hb.gp.SparseGP(hb.gp.kernels.UnitRBF(), z)
        # whitened inducing-value posterior: one sample per trace, shared
        # across the minibatch (n_batch=1 broadcasting over the batch matmul)
        self.u = hb.variationals.Normal(shape=[1, num_inducing], q_shape=q_shape)
        self.k_var = hb.Variable(shape=[1], transform=hb.transforms.positive)
        self.var = hb.Variable(shape=[1], transform=hb.transforms.positive)

    def f(self, q_shape="diagonal"):
        """Posterior function samples at the current minibatch, [1, |B|]."""
        return self.gp.samples(self.x, self.u, q_shape) * jnp.sqrt(self.k_var)

    @hb.AutoOptimize()
    def ELBO(self):
        f = self.f()[0][:, None]  # [|B|, 1]
        batch = f.shape[0]
        scale = self.n_data / batch
        log_lik = jnp.sum(densities.gaussian(self.y, f, self.var))
        return scale * log_lik - self.KL()
