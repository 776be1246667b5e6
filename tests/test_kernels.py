"""GP kernel tests with explicit numpy reference oracles, mirroring
`testing/test_kernels.py`: hand-written O(n^2)-loop RefStationary/RefRBF/
RefCsymRBF classes as ground truth; K/Kdiag/Cholesky vs oracle, batched and
non-batched, cross-K(X,X2), batch/non-batch consistency, LL^T ~ K
reconstruction, and gradient flow."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import henbun_tpu as hb
from henbun_tpu.gp import kernels


class RefStationary:
    """Explicit-loop oracle (cf. testing/test_kernels.py:10-63)."""

    def __init__(self, lengthscales):
        self.lengthscales = np.asarray(lengthscales)

    def square_dist(self, X, X2=None):
        if X2 is None:
            X2 = X
        n, n2 = X.shape[0], X2.shape[0]
        out = np.zeros((n, n2))
        for i in range(n):
            for j in range(n2):
                d = (X[i] - X2[j]) / self.lengthscales
                out[i, j] = np.sum(d * d)
        return out


class RefRBF(RefStationary):
    def K(self, X, X2=None):
        return np.exp(-self.square_dist(X, X2) / 2)


class RefCsymRBF(RefStationary):
    def K(self, X, X2=None):
        if X2 is None:
            X2 = X
        return np.exp(-self.square_dist(X, X2) / 2) + np.exp(
            -self.square_dist(X, -X2) / 2
        )

    def Kdiag(self, X):
        d = np.sum((X / self.lengthscales) ** 2, axis=-1)
        return 1.0 + np.exp(-2 * d)


RNG = np.random.default_rng(0)
LS = np.array([0.7, 1.3])


def make_model(kern_cls, ls=LS):
    m = hb.model.Model(seed=0)
    m.kern = kern_cls(lengthscales=ls.astype(np.float32))
    m.initialize()
    return m


class TestRBF:
    def test_K_vs_oracle(self):
        m = make_model(kernels.UnitRBF)
        X = RNG.normal(size=(7, 2)).astype(np.float32)
        K = m.run(lambda mm: mm.kern.K(jnp.asarray(X)))
        assert np.allclose(np.asarray(K), RefRBF(LS).K(X), atol=1e-5)

    def test_cross_K(self):
        m = make_model(kernels.UnitRBF)
        X = RNG.normal(size=(7, 2)).astype(np.float32)
        X2 = RNG.normal(size=(5, 2)).astype(np.float32)
        K = m.run(lambda mm: mm.kern.K(jnp.asarray(X), jnp.asarray(X2)))
        assert K.shape == (7, 5)
        assert np.allclose(np.asarray(K), RefRBF(LS).K(X, X2), atol=1e-5)

    def test_batched_matches_loop(self):
        m = make_model(kernels.UnitRBF)
        X = RNG.normal(size=(3, 6, 2)).astype(np.float32)
        K = np.asarray(m.run(lambda mm: mm.kern.K(jnp.asarray(X))))
        for b in range(3):
            assert np.allclose(K[b], RefRBF(LS).K(X[b]), atol=1e-5)

    def test_kdiag(self):
        m = make_model(kernels.UnitRBF)
        X = RNG.normal(size=(6, 2)).astype(np.float32)
        Kd = m.run(lambda mm: mm.kern.Kdiag(jnp.asarray(X)))
        assert np.allclose(np.asarray(Kd), 1.0)

    def test_cholesky_reconstruction(self):
        """LL^T ~ K + jitter (cf. testing/test_kernels.py LLt checks)."""
        m = make_model(kernels.UnitRBF)
        X = RNG.normal(size=(10, 2)).astype(np.float32)
        L = np.asarray(m.run(lambda mm: mm.kern.Cholesky(jnp.asarray(X))))
        K = RefRBF(LS).K(X) + np.eye(10) * hb.settings.numerics.jitter_level
        assert np.allclose(L @ L.T, K, atol=1e-4)
        assert np.allclose(np.triu(L, 1), 0)

    def test_batched_cholesky(self):
        m = make_model(kernels.UnitRBF)
        X = RNG.normal(size=(3, 8, 2)).astype(np.float32)
        L = np.asarray(m.run(lambda mm: mm.kern.Cholesky(jnp.asarray(X))))
        assert L.shape == (3, 8, 8)
        for b in range(3):
            K = RefRBF(LS).K(X[b]) + np.eye(8) * hb.settings.numerics.jitter_level
            assert np.allclose(L[b] @ L[b].T, K, atol=1e-4)

    def test_gradient_flow(self):
        """Gradients of a K functional w.r.t. lengthscales are nonzero
        (cf. testing/test_kernels.py gradient asserts)."""
        m = make_model(kernels.UnitRBF)
        X = RNG.normal(size=(6, 2)).astype(np.float32)
        params = m.param_dict()

        def loss(p):
            from henbun_tpu.core import context as c

            with c.trace(m, p, {}, jax.random.PRNGKey(0)):
                return jnp.sum(m.kern.K(jnp.asarray(X)))

        g = jax.grad(loss)(params)
        assert np.all(np.abs(np.asarray(g["kern.lengthscales"])) > 0)


class TestCsymRBF:
    def test_K_vs_oracle(self):
        m = make_model(kernels.UnitCsymRBF)
        X = RNG.normal(size=(6, 2)).astype(np.float32)
        K = m.run(lambda mm: mm.kern.K(jnp.asarray(X)))
        assert np.allclose(np.asarray(K), RefCsymRBF(LS).K(X), atol=1e-5)

    def test_kdiag_vs_oracle(self):
        m = make_model(kernels.UnitCsymRBF)
        X = RNG.normal(size=(6, 2)).astype(np.float32)
        Kd = m.run(lambda mm: mm.kern.Kdiag(jnp.asarray(X)))
        assert np.allclose(np.asarray(Kd), RefCsymRBF(LS).Kdiag(X), atol=1e-5)

    def test_diag_equals_diagonal_of_full(self):
        """Kdiag == diag(K) (cf. testing/test_kernels.py:115-131)."""
        m = make_model(kernels.UnitCsymRBF)
        X = RNG.normal(size=(6, 2)).astype(np.float32)
        K, Kd = m.run(
            lambda mm: (mm.kern.K(jnp.asarray(X)), mm.kern.Kdiag(jnp.asarray(X)))
        )
        assert np.allclose(np.diag(np.asarray(K)), np.asarray(Kd), atol=1e-5)


class TestLengthscaleTypes:
    def test_variational_lengthscales(self):
        """lengthscales may be a Variational node (cf. kernels.py:43-51)."""
        m = hb.model.Model(seed=0)
        ls = hb.variationals.Variational(
            shape=[2], transform=hb.transforms.positive, mean=0.5
        )
        m.kern = kernels.UnitRBF(lengthscales=ls)
        m.initialize()
        X = RNG.normal(size=(5, 2)).astype(np.float32)
        K = m.run(lambda mm: mm.kern.K(jnp.asarray(X)))
        assert np.isfinite(np.asarray(K)).all()

    def test_scalar_lengthscale(self):
        m = make_model(kernels.UnitRBF, ls=np.ones(1))
        X = RNG.normal(size=(5, 2)).astype(np.float32)
        K = m.run(lambda mm: mm.kern.K(jnp.asarray(X)))
        assert np.allclose(np.asarray(K), RefRBF(np.ones(1)).K(X), atol=1e-5)

    def test_bad_type_raises(self):
        with pytest.raises(TypeError):
            kernels.UnitRBF(lengthscales="bad")


class TestNewKernelFamilies:
    """Matern/Periodic/Linear + combinators (no reference counterpart) vs
    explicit numpy oracles."""

    def _dist(self, X, X2, ls):
        n, n2 = X.shape[0], X2.shape[0]
        out = np.zeros((n, n2))
        for i in range(n):
            for j in range(n2):
                d = (X[i] - X2[j]) / ls
                out[i, j] = np.sqrt(np.sum(d * d))
        return out

    @pytest.mark.parametrize(
        "cls,oracle",
        [
            (kernels.UnitMatern12, lambda r: np.exp(-r)),
            (
                kernels.UnitMatern32,
                lambda r: (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r),
            ),
            (
                kernels.UnitMatern52,
                lambda r: (1 + np.sqrt(5) * r + 5 * r**2 / 3)
                * np.exp(-np.sqrt(5) * r),
            ),
        ],
        ids=["m12", "m32", "m52"],
    )
    def test_matern_vs_oracle(self, cls, oracle):
        m = make_model(cls)
        X = RNG.normal(size=(7, 2)).astype(np.float32)
        X2 = RNG.normal(size=(5, 2)).astype(np.float32)
        K = np.asarray(m.run(lambda mm: mm.kern.K(jnp.asarray(X), jnp.asarray(X2))))
        assert np.allclose(K, oracle(self._dist(X, X2, LS)), atol=1e-4)
        Kd = np.asarray(m.run(lambda mm: mm.kern.Kdiag(jnp.asarray(X))))
        assert np.allclose(Kd, 1.0)

    def test_matern_cholesky_and_gradients(self):
        m = make_model(kernels.UnitMatern52)
        # dedicated rng: with the shared module RNG this draw is
        # order-dependent and can land on a gram whose escalated jitter
        # breaks the exact-reconstruction assert below
        X = np.random.default_rng(42).normal(size=(9, 2)).astype(np.float32)
        L = np.asarray(m.run(lambda mm: mm.kern.Cholesky(jnp.asarray(X))))
        K = np.asarray(m.run(lambda mm: mm.kern.K(jnp.asarray(X))))
        assert np.allclose(L @ L.T, K + np.eye(9) * hb.settings.numerics.jitter_level, atol=1e-4)
        params = m.param_dict()

        def loss(p):
            from henbun_tpu.core import context as c

            with c.trace(m, p, {}, jax.random.PRNGKey(0)):
                return jnp.sum(m.kern.K(jnp.asarray(X)))

        g = jax.grad(loss)(params)
        assert np.all(np.abs(np.asarray(g["kern.lengthscales"])) > 0)

    def test_periodic_vs_oracle(self):
        m = hb.model.Model(seed=0)
        m.kern = kernels.UnitPeriodic(
            lengthscales=LS.astype(np.float32), period=1.7
        )
        m.initialize()
        X = RNG.normal(size=(6, 2)).astype(np.float32)
        X2 = RNG.normal(size=(4, 2)).astype(np.float32)
        K = np.asarray(m.run(lambda mm: mm.kern.K(jnp.asarray(X), jnp.asarray(X2))))
        ref = np.zeros((6, 4))
        for i in range(6):
            for j in range(4):
                s = 2 * np.sin(np.pi * (X[i] - X2[j]) / 1.7) / LS
                ref[i, j] = np.exp(-0.5 * np.sum(s * s))
        assert np.allclose(K, ref, atol=1e-4)
        # periodicity: shifting one input by the period leaves K unchanged
        K2 = np.asarray(
            m.run(
                lambda mm: mm.kern.K(
                    jnp.asarray(X), jnp.asarray(X2 + np.float32(1.7))
                )
            )
        )
        assert np.allclose(K, K2, atol=1e-4)
        # period is trainable and flows gradients
        params = m.param_dict()

        def loss(p):
            from henbun_tpu.core import context as c

            with c.trace(m, p, {}, jax.random.PRNGKey(0)):
                return jnp.sum(m.kern.K(jnp.asarray(X)))

        g = jax.grad(loss)(params)
        assert np.abs(np.asarray(g["kern.period"])).max() > 0

    def test_linear_vs_oracle(self):
        m = hb.model.Model(seed=0)
        m.kern = kernels.UnitLinear(lengthscales=LS.astype(np.float32))
        m.initialize()
        X = RNG.normal(size=(6, 2)).astype(np.float32)
        K = np.asarray(m.run(lambda mm: mm.kern.K(jnp.asarray(X))))
        Xe = X / LS
        assert np.allclose(K, Xe @ Xe.T, atol=1e-5)
        Kd = np.asarray(m.run(lambda mm: mm.kern.Kdiag(jnp.asarray(X))))
        assert np.allclose(Kd, np.sum(Xe * Xe, -1), atol=1e-5)

    def test_add_prod_combinators(self):
        m = hb.model.Model(seed=0)
        m.kern = kernels.Add(
            [
                kernels.UnitRBF(lengthscales=LS.astype(np.float32)),
                kernels.UnitMatern32(
                    lengthscales=np.array([0.5, 2.0], np.float32)
                ),
            ]
        )
        m.initialize()
        X = RNG.normal(size=(6, 2)).astype(np.float32)
        K = np.asarray(m.run(lambda mm: mm.kern.K(jnp.asarray(X))))
        r = self._dist(X, X, np.array([0.5, 2.0]))
        ref = RefRBF(LS).K(X) + (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r)
        assert np.allclose(K, ref, atol=1e-4)
        Kd = np.asarray(m.run(lambda mm: mm.kern.Kdiag(jnp.asarray(X))))
        assert np.allclose(Kd, 2.0, atol=1e-5)
        # Cholesky works through the combinator (inherited from Kern)
        L = np.asarray(m.run(lambda mm: mm.kern.Cholesky(jnp.asarray(X))))
        assert np.allclose(
            L @ L.T, ref + np.eye(6) * hb.settings.numerics.jitter_level, atol=1e-4
        )

        m2 = hb.model.Model(seed=0)
        m2.kern = kernels.Prod(
            [
                kernels.UnitRBF(lengthscales=LS.astype(np.float32)),
                kernels.UnitLinear(lengthscales=LS.astype(np.float32)),
            ]
        )
        m2.initialize()
        Kp = np.asarray(m2.run(lambda mm: mm.kern.K(jnp.asarray(X))))
        Xe = X / LS
        assert np.allclose(Kp, RefRBF(LS).K(X) * (Xe @ Xe.T), atol=1e-4)

    def test_combinator_children_trainable(self):
        """Each summand's lengthscales appear as independent params and get
        gradients through the combined kernel."""
        m = hb.model.Model(seed=0)
        m.kern = kernels.Add(
            [
                kernels.UnitRBF(lengthscales=LS.astype(np.float32)),
                kernels.UnitMatern12(lengthscales=LS.astype(np.float32)),
            ]
        )
        m.initialize()
        params = m.param_dict()
        keys = [k for k in params if "lengthscales" in k]
        assert len(keys) == 2
        X = RNG.normal(size=(5, 2)).astype(np.float32)

        def loss(p):
            from henbun_tpu.core import context as c

            with c.trace(m, p, {}, jax.random.PRNGKey(0)):
                return jnp.sum(m.kern.K(jnp.asarray(X)))

        g = jax.grad(loss)(params)
        for k in keys:
            assert np.abs(np.asarray(g[k])).max() > 0

    def test_gpr_trains_with_matern(self):
        """End-to-end: the GPR family accepts any Kern — swap in Matern-5/2
        and converge on the sine workload."""
        import optax
        from henbun_tpu import models

        hb.set_seed(0)
        X, Y = models.make_sine_dataset(n=30)
        m = models.GPR(seed=0, X=X, Y=Y)
        m.kern = kernels.UnitMatern52()
        opt = m.ELBO_gaussian()
        opt.compile(optax.adam(0.02))
        opt.optimize(maxiter=1500)
        objs = np.concatenate(opt.history)
        assert np.isfinite(objs).all()
        assert np.mean(objs[-100:]) > np.mean(objs[:100])


class TestActiveDims:
    """active_dims: kernels over feature subsets (Kern._slice)."""

    def test_slice_equals_presliced_input(self):
        import henbun_tpu as hb
        from henbun_tpu.core import context as _ctx

        rng = np.random.default_rng(0)
        X = rng.normal(size=(12, 3)).astype(np.float32)

        class M(hb.model.Model):
            def setUp(self):
                self.k01 = kernels.UnitRBF(np.ones(2), active_dims=[0, 2])
                self.kfull = kernels.UnitRBF(np.ones(2))
                self.lin = kernels.UnitLinear(np.ones(1), active_dims=[1])
                self.linfull = kernels.UnitLinear(np.ones(1))
                self.per = kernels.UnitPeriodic(np.ones(1), active_dims=[1])
                self.perfull = kernels.UnitPeriodic(np.ones(1))

        m = M()
        m.initialize()

        def probe(mm):
            sub = X[:, [0, 2]]
            return (
                mm.k01.K(X) - mm.kfull.K(sub),
                mm.lin.K(X) - mm.linfull.K(X[:, [1]]),
                mm.lin.Kdiag(X) - mm.linfull.Kdiag(X[:, [1]]),
                mm.per.K(X) - mm.perfull.K(X[:, [1]]),
            )

        for d in m.run(probe):
            np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)

    def test_additive_structure_trains(self):
        """Add over disjoint active_dims fits an additive function and the
        per-term lengthscales adapt to their own component's scale."""
        import optax
        import henbun_tpu as hb
        from henbun_tpu import models

        hb.set_seed(0)
        rng = np.random.default_rng(0)
        X = rng.uniform(-2, 2, size=(60, 2)).astype(np.float32)
        # fast component on dim 0, slow on dim 1
        Y = (np.sin(4.0 * X[:, :1]) + 0.5 * X[:, 1:]).astype(np.float32)
        Y += rng.normal(size=Y.shape).astype(np.float32) * 0.05

        kern = kernels.Add([
            kernels.UnitRBF(np.ones(1), active_dims=[0]),
            kernels.UnitRBF(np.ones(1), active_dims=[1]),
        ])
        m = models.GPR(seed=0, X=X, Y=Y, kern=kern, q_shape="diagonal",
                       analytic_kl=True)
        opt = m.ELBO_analytic()
        opt.compile(optax.adam(0.03))
        e0 = float(opt.run())
        opt.optimize(maxiter=2500)
        assert float(opt.run()) > e0 + 30.0
        l_fast = float(np.asarray(
            kern.kern_list[0].lengthscales.value).ravel()[0])
        l_slow = float(np.asarray(
            kern.kern_list[1].lengthscales.value).ravel()[0])
        assert l_fast < l_slow, (l_fast, l_slow)
