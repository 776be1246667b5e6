"""Full-data binary GP classification via Laplace or expectation propagation.

The GPML ch. 3 classic, TPU-shaped: the Bernoulli-sigmoid likelihood is
log-concave, so the whitened Newton mode (`inference/laplace.py`, one
static-trip-count XLA scan) IS the posterior mode, the evidence trains the
hyperparameters with no variational parameters at all, and prediction is
deterministic — latent marginals from the mode curvature, then the
predictive probability by Gauss-Hermite quadrature of the sigmoid. The EP
counterparts (`log_marginal_ep` / `predict_p_ep`, inference/ep.py) match
moments instead of curvature — GPML ch. 3.6's accuracy reference for this
model, at the cost of ~30 damped parallel sweeps instead of ~15 Newton
iterations.

Complements `SVGPClassification` (models/svgp.py — minibatched inducing
point MC-VI for large n): GPC is the exact-gram, full-batch counterpart for
n up to a few thousand per chip, with a deterministic objective. The
reference ships the (broken) `densities.bernoulli` and no classifier at all
(`/root/reference/Henbun/densities.py:35-36`).

Labels y are {0, 1} floats of shape [n, 1].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

import henbun_tpu as hb


def _bernoulli_logit(y, f):
    """Elementwise log p(y | f) = y log sigmoid(f) + (1-y) log sigmoid(-f),
    computed via log_sigmoid for stability at large |f|."""
    return y * jax.nn.log_sigmoid(f) + (1.0 - y) * jax.nn.log_sigmoid(-f)


class GPC(hb.model.Model):
    """Laplace GP binary classifier: p(y=1 | x) = sigmoid(f(x)),
    f ~ GP(0, k_var * k(x, x'))."""

    def setUp(self, X, Y, kern=None):
        self.X = hb.Data(X)
        self.Y = hb.Data(Y)
        self.kern = kern if kern is not None else hb.gp.kernels.UnitRBF()
        self.k_var = hb.Variable(shape=[1], transform=hb.transforms.positive)

    def _loglik(self):
        Y = self.Y
        return lambda f: _bernoulli_logit(Y, f)

    def _Lk(self):
        return self.kern.Cholesky(self.X) * jnp.sqrt(self.k_var)

    @hb.AutoOptimize()
    def log_marginal_laplace(self):
        """Laplace evidence — deterministic, trains kernel hyperparameters
        through the unrolled Newton loop."""
        from henbun_tpu.inference.laplace import laplace_whitened

        return laplace_whitened(self._loglik(), self._Lk()).log_marginal

    def laplace(self):
        """Full :class:`~henbun_tpu.inference.laplace.LaplaceResult` at the
        current hyperparameters (evaluate with ``m.run(GPC.laplace)``)."""
        from henbun_tpu.inference.laplace import laplace_whitened

        return laplace_whitened(self._loglik(), self._Lk())

    def predict_p(self, x_new, deg=20):
        """Posterior predictive p(y=1 | x_new) [n*, 1], deterministic:
        latent Laplace marginals, then E[sigmoid(f*)] by `deg`-point
        Gauss-Hermite quadrature (exact enough that MacKay's probit shortcut
        is unnecessary)."""
        from henbun_tpu.inference.laplace import (
            laplace_latent_marginals,
            laplace_whitened,
        )
        from henbun_tpu.ops.quadrature import gauss_hermite_expectation

        loglik = self._loglik()
        Lk = self._Lk()
        res = laplace_whitened(loglik, Lk)
        Ks = self.kern.K(self.X, x_new) * self.k_var
        kdiag = self.kern.Kdiag(x_new) * self.k_var[0]
        mean, var = laplace_latent_marginals(loglik, Lk, res, Ks, kdiag)
        p = gauss_hermite_expectation(
            lambda f: jax.nn.sigmoid(f), mean[:, 0], var[:, 0], deg=deg
        )
        return p[:, None]

    # --- expectation propagation (inference/ep.py) ------------------------
    def _K(self):
        """Scaled gram — EP's stable forms want K itself, not its factor."""
        X = self.X
        Lk = self.kern.Cholesky(X)  # reuse the jittered construction
        from henbun_tpu.ops.linalg import matmul_hp

        return matmul_hp(Lk, jnp.swapaxes(Lk, -1, -2)) * self.k_var

    @hb.AutoOptimize()
    def log_marginal_ep(self):
        """EP evidence — deterministic like the Laplace one, usually a
        tighter approximation for classification (GPML ch. 3.6); trains the
        hyperparameters through the unrolled damped sweeps."""
        from henbun_tpu.inference.ep import ep_gp

        return ep_gp(self._loglik(), self._K()).log_marginal

    def ep(self, sweeps=30, damping=0.5):
        """Full :class:`~henbun_tpu.inference.ep.EPResult` at the current
        hyperparameters (evaluate with ``m.run(GPC.ep)``)."""
        from henbun_tpu.inference.ep import ep_gp

        return ep_gp(self._loglik(), self._K(), sweeps=sweeps, damping=damping)

    def predict_p_ep(self, x_new, deg=20):
        """Posterior predictive p(y=1 | x_new) [n*, 1] under the EP
        posterior — the accuracy reference for binary GP classification
        (EP's moment matching beats Laplace's mode curvature)."""
        from henbun_tpu.inference.ep import ep_gp, ep_latent_marginals
        from henbun_tpu.ops.quadrature import gauss_hermite_expectation

        K = self._K()
        res = ep_gp(self._loglik(), K)
        Ks = self.kern.K(self.X, x_new) * self.k_var
        kdiag = self.kern.Kdiag(x_new) * self.k_var[0]
        mean, var = ep_latent_marginals(res, K, Ks, kdiag)
        p = gauss_hermite_expectation(
            lambda f: jax.nn.sigmoid(f), mean[:, 0], var[:, 0], deg=deg
        )
        return p[:, None]
