"""GP / SparseGP tests mirroring `testing/test_gp.py`: no-NaN with tiny
jitter, identity checks (at x == z the effective LT equals Cholesky^T and the
sparse correction vanishes), diag == diagonal-of-full, batch/non-batch
equivalence, and gradient-flow asserts."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import henbun_tpu as hb
from henbun_tpu.gp import kernels, GP, SparseGP
from henbun_tpu.core import context as ctx_mod


RNG = np.random.default_rng(0)


def make_sparse_model(z, ls=np.ones(1)):
    m = hb.model.Model(seed=0)
    m.gp = SparseGP(kernels.UnitRBF(lengthscales=ls.astype(np.float32)), z)
    m.initialize()
    return m


class TestGP:
    def test_samples_shape_and_no_nan(self):
        m = hb.model.Model(seed=0)
        m.gp = GP(kernels.UnitRBF())
        m.initialize()
        x = np.linspace(0, 1, 10)[:, None].astype(np.float32)
        u = RNG.normal(size=(30, 10)).astype(np.float32)
        s = m.run(lambda mm: mm.gp.samples(jnp.asarray(x), jnp.asarray(u)))
        assert s.shape == (30, 10)
        assert np.isfinite(np.asarray(s)).all()

    def test_samples_match_numpy(self):
        """samples = u @ L^T with L = chol(K + jitter). The oracle Cholesky is
        computed in float32 like the device path — a float64 oracle diverges
        in the trailing columns for this ill-conditioned RBF gram matrix."""
        m = hb.model.Model(seed=0)
        m.gp = GP(kernels.UnitRBF(lengthscales=np.array([0.3])))
        m.initialize()
        x = np.linspace(0, 1, 8)[:, None].astype(np.float32)
        u = RNG.normal(size=(5, 8)).astype(np.float32)
        s = np.asarray(
            m.run(lambda mm: mm.gp.samples(jnp.asarray(x), jnp.asarray(u)))
        )
        ls = m.gp.kern.lengthscales.value
        d = (x / ls) - (x / ls).T
        K = (np.exp(-(d**2) / 2) + np.eye(8) * hb.settings.numerics.jitter_level
             ).astype(np.float32)
        L = np.linalg.cholesky(K)
        assert np.allclose(s, u @ L.T, atol=1e-3)

    def test_gradient_flow(self):
        m = hb.model.Model(seed=0)
        m.gp = GP(kernels.UnitRBF())
        m.initialize()
        x = np.linspace(0, 1, 6)[:, None].astype(np.float32)
        u = RNG.normal(size=(3, 6)).astype(np.float32)
        params = m.param_dict()

        def loss(p):
            with ctx_mod.trace(m, p, {}, jax.random.PRNGKey(0)):
                return jnp.sum(m.gp.samples(jnp.asarray(x), jnp.asarray(u)) ** 2)

        g = jax.grad(loss)(params)
        assert np.any(np.abs(np.asarray(g["gp.kern.lengthscales"])) > 0)


class TestSparseGP:
    def test_no_nans_small_jitter(self):
        """cf. testing/test_gp.py:10-29."""
        z = np.linspace(-1, 1, 5)[:, None].astype(np.float32)
        m = make_sparse_model(z)
        x = np.linspace(-1, 1, 20)[:, None].astype(np.float32)
        u = RNG.normal(size=(10, 5)).astype(np.float32)
        for q_shape in ["neglected", "diagonal", "fullrank"]:
            s = m.run(
                lambda mm: mm.gp.samples(jnp.asarray(x), jnp.asarray(u), q_shape)
            )
            assert s.shape == (10, 20)
            assert np.isfinite(np.asarray(s)).all(), q_shape

    def test_effective_LT_at_z_equals_choleskyT(self):
        """At x == z: Lm^-1 Kmm == Lm^T (cf. testing/test_gp.py:68-113)."""
        z = RNG.normal(size=(6, 2)).astype(np.float32)
        m = make_sparse_model(z)
        LnT = np.asarray(m.run(lambda mm: mm.gp._effective_LT(jnp.asarray(z))))
        L = np.asarray(m.run(lambda mm: mm.gp.kern.Cholesky(jnp.asarray(z))))
        assert np.allclose(LnT, L.T, atol=1e-3)

    def test_correction_vanishes_at_z(self):
        """Knn - Knm Kmm^-1 Kmn ~ 0 at x == z."""
        z = RNG.normal(size=(6, 2)).astype(np.float32)
        m = make_sparse_model(z)

        def fn(mm):
            LnT = mm.gp._effective_LT(jnp.asarray(z))
            return mm.gp._additional_cov(jnp.asarray(z), LnT, "diagonal")

        diag = np.asarray(m.run(fn))
        assert np.allclose(diag, 0.0, atol=1e-3)

    def test_diag_equals_diagonal_of_full(self):
        """cf. testing/test_gp.py:115-131."""
        z = np.linspace(-1, 1, 4)[:, None].astype(np.float32)
        m = make_sparse_model(z)
        x = np.linspace(-1.5, 1.5, 9)[:, None].astype(np.float32)

        def fn(mm):
            LnT = mm.gp._effective_LT(jnp.asarray(x))
            return (
                mm.gp._additional_cov(jnp.asarray(x), LnT, "diagonal"),
                mm.gp._additional_cov(jnp.asarray(x), LnT, "fullrank"),
            )

        diag, full = m.run(fn)
        assert np.allclose(np.asarray(diag), np.diag(np.asarray(full)), atol=1e-5)

    def test_batch_nonbatch_equivalence(self):
        """[N, n, d] batched path equals the [n, d] path per batch entry
        (cf. testing/test_gp.py:77-91)."""
        z = np.linspace(-1, 1, 4)[:, None].astype(np.float32)
        m = make_sparse_model(z)
        x = np.linspace(-1.5, 1.5, 7)[:, None].astype(np.float32)
        xb = np.tile(x[None], (3, 1, 1))

        LnT = np.asarray(m.run(lambda mm: mm.gp._effective_LT(jnp.asarray(x))))
        LnTb = np.asarray(m.run(lambda mm: mm.gp._effective_LT(jnp.asarray(xb))))
        for b in range(3):
            assert np.allclose(LnTb[b], LnT, atol=1e-4)

    def test_batched_samples_shapes(self):
        z = np.linspace(-1, 1, 4)[:, None].astype(np.float32)
        m = make_sparse_model(z)
        N = 5
        xb = np.tile(
            np.linspace(-1, 1, 7)[:, None].astype(np.float32)[None], (N, 1, 1)
        )
        u = RNG.normal(size=(N, 4)).astype(np.float32)
        for q_shape in ["neglected", "diagonal"]:
            s = m.run(
                lambda mm: mm.gp.samples(jnp.asarray(xb), jnp.asarray(u), q_shape)
            )
            assert s.shape == (N, 7)

    def test_gradient_flow_through_samples(self):
        """cf. testing/test_gp.py:139-169."""
        z = np.linspace(-1, 1, 4)[:, None].astype(np.float32)
        m = make_sparse_model(z)
        x = np.linspace(-1, 1, 10)[:, None].astype(np.float32)
        u = RNG.normal(size=(3, 4)).astype(np.float32)
        params = m.param_dict()

        def loss(p):
            with ctx_mod.trace(m, p, {}, jax.random.PRNGKey(0)):
                return jnp.sum(
                    m.gp.samples(jnp.asarray(x), jnp.asarray(u), "diagonal") ** 2
                )

        g = jax.grad(loss)(params)
        assert np.any(np.abs(np.asarray(g["gp.z"])) > 0)
        assert np.any(np.abs(np.asarray(g["gp.kern.lengthscales"])) > 0)


class TestWhitenedConditional:
    def test_at_training_points_equals_samples(self):
        """At x_new == x the conditional (neglected) reduces to u @ L^T."""
        m = hb.model.Model(seed=0)
        m.gp = GP(kernels.UnitRBF(lengthscales=np.array([0.5], np.float32)))
        m.initialize()
        x = np.linspace(0, 2, 9)[:, None].astype(np.float32)
        u = RNG.normal(size=(4, 9)).astype(np.float32)

        def fn(mm):
            return (
                mm.gp.samples(jnp.asarray(x), jnp.asarray(u)),
                mm.gp.conditional_samples(
                    jnp.asarray(x), jnp.asarray(x), jnp.asarray(u), "neglected"
                ),
            )

        s, c = m.run(fn)
        # float32 triangular solve through an ill-conditioned K: ~1e-2
        assert np.allclose(np.asarray(s), np.asarray(c), atol=2e-2)

    def test_conditional_mean_matches_analytic(self):
        """For fixed u, E[f*] = K*^T K^-1 (L u) — check against numpy."""
        m = hb.model.Model(seed=0)
        m.gp = GP(kernels.UnitRBF(lengthscales=np.array([0.7], np.float32)))
        m.initialize()
        x = np.linspace(0, 2, 8)[:, None].astype(np.float32)
        xs = np.linspace(-0.5, 2.5, 15)[:, None].astype(np.float32)
        u = RNG.normal(size=(1, 8)).astype(np.float32)
        cond = np.asarray(
            m.run(
                lambda mm: mm.gp.conditional_samples(
                    jnp.asarray(xs), jnp.asarray(x), jnp.asarray(u), "neglected"
                )
            )
        )
        jit = hb.settings.numerics.jitter_level
        d = (x / 0.7) - (x / 0.7).T
        K = np.exp(-(d**2) / 2) + np.eye(8) * jit
        Ks = np.exp(-(((x / 0.7) - (xs / 0.7).T) ** 2) / 2)  # [n, n*]
        L = np.linalg.cholesky(K.astype(np.float32))
        f = (u @ L.T)[0]
        analytic = Ks.T @ np.linalg.solve(K, f)
        assert np.allclose(cond[0], analytic, atol=2e-2)

    def test_gpr_predict_f_bands(self):
        """End-to-end: trained GPR predicts at a grid; the posterior band
        tracks sin(x) inside the data range."""
        from henbun_tpu import models

        X, Y = models.make_sine_dataset(n=40)
        import optax

        m = models.GPR(seed=0, X=X, Y=Y)
        opt = m.ELBO_gaussian()
        opt.compile(optax.adam(0.01))
        opt.optimize(maxiter=4000)
        grid = np.linspace(0.3, 5.7, 50)[:, None].astype(np.float32)
        bands = np.asarray(m.draws(lambda mm: mm.predict_f(grid), 60))[:, :, 0]
        mean = bands.mean(0)
        rmse = np.sqrt(np.mean((mean - np.sin(grid[:, 0])) ** 2))
        assert rmse < 0.3
        # uncertainty grows outside data... at least stays positive
        assert bands.std(0).min() > 0
