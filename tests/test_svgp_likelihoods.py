"""SVGP count (Poisson) and multiclass (softmax) likelihoods
(models/svgp.py: SVGPCount, SVGPMulticlass).

Gates: the Poisson analytic ELBO equals the MC estimator's mean (lognormal
identity), training recovers the generating rate curve; the multiclass model
separates three classes with calibrated probabilities.
"""
import numpy as np
import jax.numpy as jnp
import optax
import pytest

import henbun_tpu as hb
from henbun_tpu.models import SVGPCount, SVGPMulticlass


def _count_data(n=2000, seed=0):
    rng = np.random.default_rng(seed)
    X = np.sort(rng.uniform(0, 6, size=(n, 1))).astype(np.float32)
    log_rate = np.sin(X) + 1.0
    Y = rng.poisson(np.exp(log_rate)).astype(np.float32)
    return X, Y, log_rate


def _class_data(n=1800, seed=0):
    """Three classes on alternating intervals of [0, 6]."""
    rng = np.random.default_rng(seed)
    X = np.sort(rng.uniform(0, 6, size=(n, 1))).astype(np.float32)
    labels = (np.floor(X[:, 0]) % 3).astype(np.int32)[:, None]
    return X, labels


def test_poisson_analytic_matches_mc_mean():
    hb.set_seed(7)
    X, Y, _ = _count_data(n=256, seed=7)
    m = SVGPCount(seed=7, X=X, Y=Y, num_inducing=16)
    det = float(m.run(lambda mm: SVGPCount.ELBO_analytic.__wrapped__(mm)))
    mc = np.asarray(m.draws(lambda mm: SVGPCount.ELBO.__wrapped__(mm), 3000))
    se = mc.std() / np.sqrt(len(mc))
    assert abs(mc.mean() - det) < 5 * se + 0.02 * abs(det), (mc.mean(), det)


def test_poisson_recovers_rate_curve():
    hb.set_seed(0)
    X, Y, _ = _count_data(n=2000, seed=0)
    m = SVGPCount(seed=0, X=X, Y=Y, num_inducing=32)
    m.ELBO_analytic().compile(optax.adam(0.02)).optimize(
        maxiter=3000, minibatch_size=256
    )
    grid = np.linspace(0.3, 5.7, 40).reshape(-1, 1).astype(np.float32)
    rate, rate_var = m.run(lambda mm: mm.predict_rate(grid))
    rate = np.asarray(rate)[:, 0]
    truth = np.exp(np.sin(grid[:, 0]) + 1.0)
    rel = np.abs(rate - truth) / truth
    assert np.median(rel) < 0.15, np.median(rel)
    assert (np.asarray(rate_var) > 0).all()


def test_multiclass_separates_classes():
    hb.set_seed(1)
    X, labels = _class_data(n=1800, seed=1)
    m = SVGPMulticlass(
        seed=1, X=X, Y=labels, num_classes=3, num_inducing=48
    )
    m.ELBO().compile(optax.adam(0.02)).optimize(
        maxiter=4000, minibatch_size=256
    )
    # predict at interval centers, away from the boundaries
    grid = np.array(
        [[0.5], [1.5], [2.5], [3.5], [4.5], [5.5]], np.float32
    )
    probs = np.asarray(m.draws(lambda mm: mm.predict_p(grid), 128)).mean(0)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    want = (np.floor(grid[:, 0]) % 3).astype(int)
    got = probs.argmax(-1)
    assert (got == want).all(), (got, want)
    # confident in the right class at the interval centers
    assert probs[np.arange(6), want].min() > 0.6, probs


def test_multiclass_probability_draws_vary():
    hb.set_seed(2)
    X, labels = _class_data(n=300, seed=2)
    m = SVGPMulticlass(seed=2, X=X, Y=labels, num_classes=3,
                       num_inducing=16, q_shape="diagonal")
    grid = np.array([[1.0], [4.0]], np.float32)
    draws = np.asarray(m.draws(lambda mm: mm.predict_p(grid), 32))
    assert draws.shape == (32, 2, 3)
    assert draws.std(axis=0).max() > 1e-3  # untrained posterior has spread


def test_svgp_student_quadrature_robust_to_outliers():
    """The deterministic Student-t SVGP objective shrugs off gross outliers
    that pull the Gaussian fit (large-n counterpart of the GPR robust
    variant)."""
    from henbun_tpu.models import SVGPRegression

    hb.set_seed(9)
    rng = np.random.default_rng(9)
    X = np.sort(rng.uniform(0, 6, size=(2000, 1))).astype(np.float32)
    Y = (np.sin(X) + rng.normal(size=X.shape) * 0.2).astype(np.float32)
    Y[::25] += 5.0  # 4% gross outliers

    grid = np.linspace(0.3, 5.7, 40).reshape(-1, 1).astype(np.float32)
    truth = np.sin(grid[:, 0])

    def fit(objective):
        m = SVGPRegression(seed=9, X=X, Y=Y, num_inducing=32)
        getattr(m, objective)().compile(optax.adam(0.02)).optimize(
            maxiter=3000, minibatch_size=256
        )
        mean, _ = m.run(lambda mm: mm.predict_f_marginals(grid))
        return np.sqrt(np.mean((np.asarray(mean)[:, 0] - truth) ** 2))

    rmse_robust = fit("ELBO_student_quadrature")
    rmse_gauss = fit("ELBO_analytic")
    assert rmse_robust < 0.15, rmse_robust
    assert rmse_robust < 0.6 * rmse_gauss, (rmse_robust, rmse_gauss)


def test_poisson_analytic_trains_with_natgrad():
    """The count family's deterministic (non-conjugate) ELBO follows the
    classification-quadrature pairing rule: moderate fixed gammas train
    cleanly and match Adam's solution quality."""
    from henbun_tpu import optimizers as hopt

    hb.set_seed(4)
    X, Y, _ = _count_data(n=1500, seed=4)
    m = SVGPCount(seed=4, X=X, Y=Y, num_inducing=24)
    opt = m.ELBO_analytic()
    opt.compile(hopt.natural_gradient(m, gamma=0.2, rest=optax.adam(0.02)))
    opt.optimize(maxiter=2500, minibatch_size=256)
    grid = np.linspace(0.5, 5.5, 30).reshape(-1, 1).astype(np.float32)
    rate, _ = m.run(lambda mm: mm.predict_rate(grid))
    truth = np.exp(np.sin(grid[:, 0]) + 1.0)
    rel = np.abs(np.asarray(rate)[:, 0] - truth) / truth
    assert np.median(rel) < 0.15, np.median(rel)


def test_multiclass_predict_p_mean_deterministic():
    """predict_p_mean matches the draw-averaged predict_p and is exactly
    reproducible call-to-call (fixed internal key)."""
    hb.set_seed(5)
    X, labels = _class_data(n=1200, seed=5)
    m = SVGPMulticlass(seed=5, X=X, Y=labels, num_classes=3,
                       num_inducing=32)
    m.ELBO().compile(optax.adam(0.02)).optimize(
        maxiter=1500, minibatch_size=256
    )
    grid = np.array([[0.5], [1.5], [2.5], [3.5]], np.float32)
    p1 = np.asarray(m.run(lambda mm: mm.predict_p_mean(grid)))
    p2 = np.asarray(m.run(lambda mm: mm.predict_p_mean(grid)))
    np.testing.assert_array_equal(p1, p2)  # deterministic
    np.testing.assert_allclose(p1.sum(-1), 1.0, rtol=1e-5)
    mc = np.asarray(m.draws(lambda mm: mm.predict_p(grid), 512)).mean(0)
    np.testing.assert_allclose(p1, mc, atol=0.05)  # same posterior mean
    want = (np.floor(grid[:, 0]) % 3).astype(int)
    assert (p1.argmax(-1) == want).all()
