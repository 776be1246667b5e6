"""End-to-end tests of the prebuilt model families — small-iteration versions
of the reference notebook workloads (BASELINE.md), asserting convergence
toward the known ground truth."""
import numpy as np
import jax.numpy as jnp
import optax
import pytest

import henbun_tpu as hb
from henbun_tpu import models


class TestGPR:
    def test_gpr_gaussian_converges(self):
        """Small version of GaussianProcess.ipynb cells 9-14: posterior fit
        approaches sin(x) and ELBO increases."""
        X, Y = models.make_sine_dataset(n=40)
        m = models.GPR(seed=0, X=X, Y=Y)
        opt = m.ELBO_gaussian()
        opt.compile(optax.adam(0.01))
        e0 = float(opt.run())
        opt.optimize(maxiter=6000)
        e1 = float(opt.run())
        assert e1 > e0
        # posterior mean of f over 30 draws tracks sin(x)
        draws = np.stack(
            [np.asarray(m.run(lambda mm: mm.f_sample())) for _ in range(30)]
        )
        fmean = draws.mean(0)
        rmse = np.sqrt(np.mean((fmean - np.sin(X)) ** 2))
        assert rmse < 0.3
        # learned noise variance near the generating 0.3^2
        assert 0.02 < np.asarray(m.var.value).reshape(()).item() < 0.25

    def test_gpr_student_runs(self):
        X, Y = models.make_sine_dataset(n=30)
        Y[::7] += 3.0  # outliers
        m = models.GPR(seed=0, X=X, Y=Y)
        opt = m.ELBO_student()
        opt.compile(optax.adam(0.01))
        opt.optimize(maxiter=500)
        assert np.isfinite(float(opt.run()))


class TestExpertGPR:
    def test_expert_gpr_runs_and_improves(self):
        X, Y = models.make_expert_dataset(n=60)
        m = models.ExpertGPR(seed=0, X=X, Y=Y)
        init = m.ELBO_single()
        init.compile(optax.adam(0.01))
        init.optimize(maxiter=300)
        main = m.ELBO()
        main.compile(optax.adam(0.001))
        e0 = float(main.run())
        main.optimize(maxiter=500)
        e1 = float(main.run())
        assert np.isfinite(e1) and e1 > e0
        # prediction at new inputs through the three whitened conditionals
        grid = np.linspace(-1, 1, 25)[:, None].astype(np.float32)
        bands = np.asarray(m.draws(lambda mm: mm.predict_f(grid), 20))
        assert bands.shape == (20, 25, 1)
        assert np.isfinite(bands).all()


class TestLinear:
    def test_vi_linear_recovers_coefficients(self):
        """Small version of Henbun_structure2.ipynb: posterior means of a, b
        approach the generating coefficients."""
        X, Y = models.make_linear_dataset(n=200, a=1.0, b=2.0, noise=0.3)
        m = models.VariationalLinearModel(seed=0, X=X, Y=Y)
        opt = m.elbo()
        opt.compile(optax.adam(0.05))
        opt.optimize(maxiter=2000)
        a_mean = np.asarray(m.a.q_mu.free_value).reshape(()).item()
        b_mean = np.asarray(m.b.q_mu.free_value).reshape(()).item()
        assert abs(a_mean - 1.0) < 0.2
        assert abs(b_mean - 2.0) < 0.2

    def test_map_linear(self):
        X, Y = models.make_linear_dataset(n=200, a=1.0, b=2.0, noise=0.3)
        m = models.MAPLinearModel(seed=0, X=X, Y=Y)
        opt = m.logp()
        opt.compile(optax.adam(0.05))
        opt.optimize(maxiter=2000)
        assert abs(np.asarray(m.a.value).reshape(()).item() - 1.0) < 0.15
        assert abs(np.asarray(m.b.value).reshape(()).item() - 2.0) < 0.15


class TestAmortized:
    def test_amortized_minibatch_svi(self):
        """Minibatch SVI with encoder-fed local latents improves the ELBO and
        beats predicting the data mean."""
        X, Y = models.make_synthetic_regression(n=2000, d_x=4)
        m = models.AmortizedRegression(seed=0, X=X, Y=Y, d_z=2, hidden=16)
        opt = m.ELBO()
        opt.compile(optax.adam(0.005))
        opt.optimize(maxiter=600, minibatch_size=64)
        objs = np.concatenate(opt.history) / m.n_data
        # smoothed ELBO improves over training
        assert np.mean(objs[-100:]) > np.mean(objs[:100])
        assert np.isfinite(objs).all()


class TestBNN:
    def test_variational_bnn_fits(self):
        X, Y = models.make_bnn_dataset(n=64)
        m = models.VariationalBNN(seed=0, X=X, Y=Y, hidden=8)
        opt = m.ELBO()
        opt.compile(optax.adam(0.01))
        e0 = float(opt.run())
        opt.optimize(maxiter=800)
        e1 = float(opt.run())
        assert e1 > e0

    def test_bnn_log_posterior_finite(self):
        X, Y = models.make_bnn_dataset(n=32)
        m = models.BNN(seed=0, X=X, Y=Y, hidden=8)
        lp = m.log_posterior()
        lp.compile(optax.adam(0.01))
        assert np.isfinite(float(lp.run()))


class TestSVGP:
    def test_svgp_minibatch_fits_large_n(self):
        """SVGP with 32 inducing points on N=5000 points: minibatch SVI fits
        sin(x) with RMSE well below the noise level of a zero predictor."""
        rng = np.random.default_rng(0)
        X = np.sort(rng.uniform(0, 6, size=(5000, 1)).astype(np.float32), axis=0)
        Y = (np.sin(X) + rng.normal(size=X.shape) * 0.3).astype(np.float32)
        m = models.SVGPRegression(seed=0, X=X, Y=Y, num_inducing=32)
        opt = m.ELBO()
        opt.compile(optax.adam(0.01))
        opt.optimize(maxiter=3000, minibatch_size=256)
        # predict on a grid through the traced model
        grid = np.linspace(0, 6, 100).reshape(-1, 1).astype(np.float32)
        import jax.numpy as jnp

        def fgrid(mm):
            return mm.gp.samples(jnp.asarray(grid), mm.u, "neglected") * jnp.sqrt(
                mm.k_var
            )

        draws = np.asarray(m.draws(fgrid, 50))[:, 0, :]
        rmse = np.sqrt(np.mean((draws.mean(0) - np.sin(grid[:, 0])) ** 2))
        assert rmse < 0.2
        assert np.isfinite(np.concatenate(opt.history)).all()
        # the predict_f API matches the hand-rolled conditional above
        pred = np.asarray(m.draws(lambda mm: mm.predict_f(grid), 50))[:, 0, :]
        rmse_p = np.sqrt(np.mean((pred.mean(0) - np.sin(grid[:, 0])) ** 2))
        assert rmse_p < 0.2


class TestSVGPClassification:
    def test_classification_learns_boundary(self):
        """1D two-region classification: p(y=1) = sigmoid of a smooth GP —
        after training, predictions separate the regions and predict_y-style
        probabilities are calibrated at the extremes."""
        rng = np.random.default_rng(0)
        X = np.sort(rng.uniform(-3, 3, size=(2000, 1)).astype(np.float32), axis=0)
        p_true = 1.0 / (1.0 + np.exp(-4.0 * np.sin(X[:, 0])))
        Y = (rng.uniform(size=2000) < p_true).astype(np.float32)[:, None]
        m = models.SVGPClassification(seed=0, X=X, Y=Y, num_inducing=24)
        opt = m.ELBO()
        opt.compile(optax.adam(0.02))
        opt.optimize(maxiter=2500, minibatch_size=256)
        assert np.isfinite(np.concatenate(opt.history)).all()
        grid = np.linspace(-3, 3, 120).reshape(-1, 1).astype(np.float32)
        p = np.asarray(m.draws(lambda mm: mm.predict_p(grid), 60))[:, 0, :].mean(0)
        ref = 1.0 / (1.0 + np.exp(-4.0 * np.sin(grid[:, 0])))
        # classify by thresholding: match the true boundary sign structure
        agree = np.mean((p > 0.5) == (ref > 0.5))
        assert agree > 0.9
        rmse = np.sqrt(np.mean((p - ref) ** 2))
        assert rmse < 0.15

    def test_predict_y_noise_inflation(self):
        """predict_y draws have strictly more variance than predict_f draws
        (observation noise added)."""
        rng = np.random.default_rng(1)
        X = np.sort(rng.uniform(0, 6, size=(400, 1)).astype(np.float32), axis=0)
        Y = (np.sin(X) + rng.normal(size=X.shape) * 0.3).astype(np.float32)
        m = models.SVGPRegression(seed=0, X=X, Y=Y, num_inducing=16)
        opt = m.ELBO()
        opt.compile(optax.adam(0.02))
        opt.optimize(maxiter=800, minibatch_size=128)
        grid = np.linspace(0, 6, 50).reshape(-1, 1).astype(np.float32)
        f = np.asarray(m.draws(lambda mm: mm.predict_f(grid), 200))[:, 0, :]
        y = np.asarray(m.draws(lambda mm: mm.predict_y(grid), 200))[:, 0, :]
        assert y.var(axis=0).mean() > f.var(axis=0).mean()


class TestGPRMarginalPredict:
    def test_analytic_posterior_matches_numpy_oracle(self):
        X, Y = models.make_sine_dataset(n=25)
        m = models.GPRMarginal(seed=0, X=X, Y=Y)
        m.kern.lengthscales = np.asarray([0.8], np.float32)
        m.k_var = np.asarray([1.2], np.float32)
        m.var = np.asarray([0.05], np.float32)
        m.initialize()
        grid = np.linspace(0, 6, 30).reshape(-1, 1).astype(np.float32)
        mean, var = m.run(lambda mm: mm.predict_f(grid))
        mean, var = np.asarray(mean), np.asarray(var)

        # numpy oracle
        def k(a, b):
            d2 = ((a[:, None, :] - b[None, :, :]) / 0.8) ** 2
            return 1.2 * np.exp(-0.5 * d2.sum(-1))

        jit = hb.settings.numerics.jitter_level
        S = k(X, X) + (0.05 + jit) * np.eye(25)
        Si = np.linalg.inv(S)
        Ks = k(grid, X)
        mean_ref = Ks @ Si @ Y
        var_ref = 1.2 - np.sum((Ks @ Si) * Ks, axis=1)
        assert np.allclose(mean[:, 0], mean_ref[:, 0], atol=2e-3)
        assert np.allclose(var[:, 0], var_ref, atol=2e-3)
        # posterior mean tracks the generating sin(x)
        assert np.sqrt(np.mean((mean[:, 0] - np.sin(grid[:, 0])) ** 2)) < 0.3


@pytest.mark.slow
def test_svgp_classification_quadrature_natgrad_matches_gpc_oracle():
    """Large-n deterministic non-conjugate inference (VERDICT r2 ask #5):
    SVGP classification with the QUADRATURE expected log-likelihood — fully
    deterministic given the minibatch — trains with natural gradients on
    q(u) at minibatch SVI speeds, and its predictive probabilities agree
    with the exact-gram GPC Laplace posterior trained on a subsample. The
    quadrature objective is NOT conjugate (Bernoulli), so the natgrad gamma
    is moderate (0.1), not unit. Measured on the CPU mesh at n=1e5, m=64,
    4000 steps: |p_svgp - p_gpc| mean 0.020, |p_svgp - p_true| 0.009 (the
    oracle itself sits 0.022 from the generator)."""
    import optax

    from henbun_tpu import optimizers as hopt

    n = 100_000
    rng = np.random.default_rng(0)
    X = rng.uniform(-3, 3, size=(n, 1)).astype(np.float32)
    p_true = 1.0 / (1.0 + np.exp(-3.0 * np.sin(X)))
    Y = (rng.uniform(size=X.shape) < p_true).astype(np.float32)
    grid = np.linspace(-3, 3, 60, dtype=np.float32)[:, None]
    pt = 1.0 / (1.0 + np.exp(-3.0 * np.sin(grid[:, 0])))

    # exact-gram Laplace oracle on a 400-point subsample
    idx = rng.choice(n, 400, replace=False)
    gpc = models.GPC(seed=0, X=X[idx], Y=Y[idx])
    o = gpc.log_marginal_laplace()
    o.compile(optax.adam(0.05))
    o.optimize(maxiter=500)
    p_gpc = np.asarray(gpc.run(lambda mm: mm.predict_p(grid)))[:, 0]

    hb.set_seed(0)
    m = models.SVGPClassification(seed=0, X=X, Y=Y, num_inducing=64)
    opt = m.ELBO_quadrature()
    opt.compile(
        hopt.natural_gradient(m, gamma=0.1, rest=optax.adam(0.01))
    )
    opt.optimize(maxiter=4000, minibatch_size=512, minibatch_mode="block")
    assert np.isfinite(np.concatenate(opt.history)).all()
    p_draws = np.asarray(m.draws(lambda mm: mm.predict_p(grid)[0], 200))
    p_svgp = p_draws.mean(0)
    assert np.abs(p_svgp - p_gpc).mean() < 0.05, np.abs(p_svgp - p_gpc).mean()
    assert np.abs(p_svgp - pt).mean() < 0.05, np.abs(p_svgp - pt).mean()


class TestSVGPDeterministicPrediction:
    def test_predict_f_marginals_match_draw_statistics(self):
        """The closed-form marginals must equal the mean/var of many
        predict_f draws (same posterior, sampled vs integrated)."""
        X, Y = models.make_sine_dataset(n=512, seed=0)
        m = models.SVGPRegression(seed=0, X=X, Y=Y, num_inducing=16)
        opt = m.ELBO()
        opt.compile(optax.adam(0.02))
        opt.optimize(maxiter=500, minibatch_size=128)
        grid = np.linspace(0, 6, 20, dtype=np.float32)[:, None]
        mean, var = m.run(lambda mm: mm.predict_f_marginals(grid))
        draws = np.asarray(
            m.draws(lambda mm: mm.predict_f(grid, q_shape="fullrank")[0], 4000)
        )
        assert np.allclose(np.asarray(mean)[:, 0], draws.mean(0), atol=0.05)
        assert np.allclose(
            np.asarray(var)[:, 0], draws.var(0), rtol=0.15, atol=0.01
        )

    def test_predict_p_mean_matches_draw_average(self):
        X, Y = models.make_sine_dataset(n=512, seed=1)
        Yc = (Y > 0).astype(np.float32)
        m = models.SVGPClassification(seed=0, X=X, Y=Yc, num_inducing=16)
        opt = m.ELBO_quadrature()
        opt.compile(optax.adam(0.02))
        opt.optimize(maxiter=500, minibatch_size=128)
        grid = np.linspace(0, 6, 20, dtype=np.float32)[:, None]
        p_det = np.asarray(m.run(lambda mm: mm.predict_p_mean(grid)))
        p_draws = np.asarray(
            m.draws(lambda mm: mm.predict_p(grid, q_shape="fullrank")[0], 4000)
        )
        assert p_det.shape == (20, 1)
        assert ((p_det > 0) & (p_det < 1)).all()
        assert np.allclose(p_det[:, 0], p_draws.mean(0), atol=0.02)
