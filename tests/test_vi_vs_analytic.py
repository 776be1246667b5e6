"""The posterior-accuracy gate (BASELINE.md): VI posterior vs the analytic GP
regression posterior.

The reference shipped (disabled) exactly this check — a 40k-iteration
VI-vs-analytic GPR equivalence test (`testing/test_gp.py:181-249`). Here it
runs for real: with kernel hyperparameters FIXED (optimizing only the
variational collection, via collection-scoped compile), the fullrank Gaussian
posterior over the whitened latent must reproduce the closed-form GP
conditional mean and marginal variances within Monte-Carlo error.
"""
import numpy as np
import jax.numpy as jnp
import optax
import pytest

import henbun_tpu as hb
from henbun_tpu import densities
from henbun_tpu.ops.linalg import matmul_hp


class FixedHypGPR(hb.model.Model):
    """GPR with fixed lengthscale/k_var/noise var; only q is trainable."""

    def setUp(self, X, Y, ls, k_var, noise_var):
        self.X = hb.Data(X)
        self.Y = hb.Data(Y)
        self.q = hb.variationals.Normal(
            shape=list(X.shape), q_shape="fullrank", collections=["vi"]
        )
        self.kern = hb.gp.kernels.UnitRBF(np.array([ls], np.float32))
        self.k_var = float(k_var)
        self.noise_var = float(noise_var)

    def f(self):
        return matmul_hp(self.kern.Cholesky(self.X), self.q) * np.sqrt(self.k_var)

    @hb.AutoOptimize()
    def ELBO(self):
        return jnp.sum(
            densities.gaussian(self.Y, self.f(), self.noise_var)
        ) - self.KL()


def analytic_posterior(X, Y, ls, k_var, noise_var, jitter):
    d = (X / ls) - (X / ls).T
    K = k_var * (np.exp(-(d**2) / 2) + np.eye(len(X)) * jitter)
    S = K + noise_var * np.eye(len(X))
    mean = K @ np.linalg.solve(S, Y)
    cov = K - K @ np.linalg.solve(S, K)
    return mean, cov


@pytest.mark.slow
def test_vi_matches_analytic_gpr_posterior():
    """40k Adam steps with LR decay (the single-sample gradient estimator's
    noise floor scales with the LR, so a schedule is what makes the
    covariance converge); the *parametric* VI posterior
    N(sqrt(kv) L q_mu, kv L q_sqrt q_sqrt^T L^T) is compared matrix-to-matrix
    against the analytic GP conditional."""
    hb.set_seed(0)
    rng = np.random.default_rng(0)
    n = 30
    X = np.linspace(0, 6, n).reshape(-1, 1).astype(np.float32)
    Y = (np.sin(X) + rng.normal(size=(n, 1)) * 0.3).astype(np.float32)
    ls, k_var, noise_var = 1.0, 1.0, 0.09

    m = FixedHypGPR(seed=0, X=X, Y=Y, ls=ls, k_var=k_var, noise_var=noise_var)
    opt = m.ELBO()
    sched = optax.exponential_decay(0.01, 4000, 0.5, end_value=2e-4)
    opt.compile(optax.adam(sched), collection="vi")
    opt.optimize(maxiter=40000)

    mean_a, cov_a = analytic_posterior(
        X, Y, ls, k_var, noise_var, hb.settings.numerics.jitter_level
    )
    q_mu = np.asarray(m.q.q_mu.free_value)
    q_sqrt = np.tril(np.asarray(m.q.q_sqrt.free_value))
    d = (X / ls) - (X / ls).T
    K = np.exp(-(d**2) / 2) + np.eye(n) * hb.settings.numerics.jitter_level
    L = np.linalg.cholesky(K) * np.sqrt(k_var)
    mean_vi = L @ q_mu
    cov_vi = L @ q_sqrt @ q_sqrt.T @ L.T

    std_vi = np.sqrt(np.diag(cov_vi))
    std_a = np.sqrt(np.diag(cov_a))
    assert np.abs(mean_vi - mean_a[:, 0]).max() < 0.03
    assert np.max(np.abs(std_vi - std_a) / std_a) < 0.12

    # single-sample ELBO draws average to ~ the exact log marginal likelihood
    # (the bound is tight for this conjugate model)
    def elbo(mm):
        return jnp.sum(
            densities.gaussian(mm.Y, mm.f(), mm.noise_var)
        ) - mm.KL()

    elbos = np.asarray(m.draws(elbo, 300))
    S = k_var * np.exp(-(d**2) / 2) + noise_var * np.eye(n)
    sign, logdet = np.linalg.slogdet(S)
    lml = float(
        -0.5 * n * np.log(2 * np.pi)
        - 0.5 * logdet
        - 0.5 * Y[:, 0] @ np.linalg.solve(S, Y[:, 0])
    )
    assert abs(elbos.mean() - lml) < 1.0
