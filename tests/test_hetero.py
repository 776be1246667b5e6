"""Heteroscedastic GPR (models/hetero.py).

Gates: (1) the closed-form expected log-likelihood agrees with the MC
estimator's mean (the E[e^{-g}] lognormal identity, checked statistically);
(2) end-to-end training recovers both the mean function AND the noise
PROFILE — the learned noise std must rise across the input range the way the
generating sd(x) does; (3) predictive variance decomposes sanely (y-variance
>= latent f-variance, larger in the noisy region).
"""
import numpy as np
import jax.numpy as jnp
import optax
import pytest

import henbun_tpu as hb
from henbun_tpu.models import (
    HeteroscedasticGPR,
    HeteroSVGP,
    make_hetero_dataset,
)


@pytest.fixture(scope="module")
def fitted():
    hb.set_seed(0)
    X, Y, sd = make_hetero_dataset(n=120, seed=0)
    m = HeteroscedasticGPR(seed=0, X=X, Y=Y)
    m.ELBO_analytic().compile(optax.adam(0.02)).optimize(maxiter=3000)
    return m, X, Y, sd


def test_analytic_ell_matches_mc_mean():
    hb.set_seed(3)
    X, Y, _ = make_hetero_dataset(n=40, seed=3)
    m = HeteroscedasticGPR(seed=3, X=X, Y=Y, analytic_kl=True)
    # with analytic KLs on both posteriors, ELBO_mc - ELBO_analytic is purely
    # the MC-vs-exact expected log-likelihood gap: mean over draws ~ 0
    det = float(m.run(lambda mm: HeteroscedasticGPR.ELBO_analytic.__wrapped__(mm)))
    mc = np.asarray(
        m.draws(lambda mm: HeteroscedasticGPR.ELBO_mc.__wrapped__(mm), 4000)
    )
    se = mc.std() / np.sqrt(len(mc))
    assert abs(mc.mean() - det) < 5 * se + 0.05 * abs(det)


def test_recovers_mean_and_noise_profile(fitted):
    m, X, Y, sd = fitted
    grid = np.linspace(0.2, 5.8, 40).reshape(-1, 1).astype(np.float32)
    fmean, yvar = m.run(lambda mm: mm.predict_y(grid))
    fmean = np.asarray(fmean)[:, 0]
    rmse = np.sqrt(np.mean((fmean - np.sin(grid[:, 0])) ** 2))
    assert rmse < 0.25, rmse

    gmean, _ = m.run(lambda mm: mm.predict_g(grid))
    learned_sd = np.exp(0.5 * np.asarray(gmean)[:, 0])
    # noise profile: quiet region (x<2) vs loud region (x>4); the generating
    # sd goes 0.05-0.1 -> ~0.4, so the learned ratio must clearly exceed 1
    quiet = learned_sd[grid[:, 0] < 2.0].mean()
    loud = learned_sd[grid[:, 0] > 4.0].mean()
    assert loud / quiet > 2.0, (quiet, loud)
    assert quiet < 0.2, quiet
    assert 0.2 < loud < 0.9, loud


def test_predictive_variance_decomposition(fitted):
    m, X, Y, sd = fitted
    grid = np.linspace(0.5, 5.5, 30).reshape(-1, 1).astype(np.float32)

    def parts(mm):
        fmean, yvar = mm.predict_y(grid)
        gmean, gvar = mm.predict_g(grid)
        return fmean, yvar, jnp.exp(gmean + gvar / 2.0)

    fmean, yvar, noise = m.run(parts)
    yvar, noise = np.asarray(yvar)[:, 0], np.asarray(noise)[:, 0]
    assert (yvar >= noise - 1e-6).all()  # y-var = f-var + noise >= noise
    # the noisy region dominates the predictive variance
    assert yvar[grid[:, 0] > 4.5].mean() > 2.0 * yvar[grid[:, 0] < 1.5].mean()


def test_mc_objective_trains_too():
    """Reference-style single-sample estimator also converges (slower)."""
    hb.set_seed(1)
    X, Y, _ = make_hetero_dataset(n=60, seed=1)
    m = HeteroscedasticGPR(seed=1, X=X, Y=Y, q_shape="diagonal",
                           analytic_kl=False)
    opt = m.ELBO_mc()
    opt.compile(optax.adam(0.02))
    before = float(opt.run())
    opt.optimize(maxiter=1500)
    after = np.mean([float(opt.run()) for _ in range(20)])
    assert after > before + 10.0


class TestHeteroSVGP:
    """Inducing-point heteroscedastic regression (VERDICT r3 #4): the
    closed-form E[e^{-g}] ELBO at n=1e5 with minibatches."""

    @pytest.fixture(scope="class")
    def fitted_sparse(self):
        hb.set_seed(0)
        X, Y, sd = make_hetero_dataset(n=100_000, seed=0)
        m = HeteroSVGP(seed=0, X=X, Y=Y, num_inducing=32)
        m.ELBO_analytic().compile(optax.adam(0.02)).optimize(
            maxiter=4000, minibatch_size=512
        )
        return m

    def test_recovers_mean_and_noise_profile_at_1e5(self, fitted_sparse):
        m = fitted_sparse
        grid = np.linspace(0.2, 5.8, 40, dtype=np.float32)[:, None]
        ymean, yvar = m.run(lambda mm: mm.predict_y(grid))
        rmse = float(np.sqrt(np.mean(
            (np.asarray(ymean)[:, 0] - np.sin(grid[:, 0])) ** 2
        )))
        assert rmse < 0.05, rmse
        gmean, _ = m.run(lambda mm: mm.predict_g(grid))
        sd_pred = np.exp(np.asarray(gmean)[:, 0] / 2.0)
        quiet = sd_pred[grid[:, 0] < 1.5].mean()
        loud = sd_pred[grid[:, 0] > 4.5].mean()
        # generator: sd 0.05 rising to ~0.45
        assert loud / quiet > 3.0, (quiet, loud)
        assert quiet < 0.12, quiet
        assert 0.3 < loud < 0.7, loud

    def test_predictive_variance_decomposition(self, fitted_sparse):
        m = fitted_sparse
        grid = np.linspace(0.2, 5.8, 40, dtype=np.float32)[:, None]
        _, yvar = m.run(lambda mm: mm.predict_y(grid))
        yvar = np.asarray(yvar)[:, 0]
        assert (yvar > 0).all()
        assert yvar[grid[:, 0] > 4.5].mean() > 3.0 * yvar[grid[:, 0] < 1.5].mean()

    def test_mc_objective_trains_too(self):
        hb.set_seed(1)
        X, Y, _ = make_hetero_dataset(n=5000, seed=1)
        m = HeteroSVGP(seed=1, X=X, Y=Y, num_inducing=16)
        opt = m.ELBO_mc().compile(optax.adam(0.01))
        before = float(opt.run())
        opt.optimize(maxiter=1500, minibatch_size=256)
        after = float(opt.run())
        assert np.isfinite(after) and after > before
