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
