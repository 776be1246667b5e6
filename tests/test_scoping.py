"""NameScoped decorator and scoped_keys coverage (reference scoping.py +
param.py:368-370): scoped functions still compute correctly under jit, and a
CsymRBF model trains end-to-end (the one kernel family not yet exercised in
a training loop)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

import henbun_tpu as hb
from henbun_tpu.scoping import NameScoped


def test_namescoped_preserves_semantics():
    @NameScoped("my.scope")
    def f(x):
        return x * 2 + 1

    assert float(f(jnp.asarray(3.0))) == 7.0
    assert float(jax.jit(f)(jnp.asarray(3.0))) == 7.0
    assert f.__name__ == "f"


def test_scoped_keys_wrap_in_trace():
    m = hb.model.Model(seed=0)
    m.kern = hb.gp.kernels.UnitRBF()
    m.initialize()
    X = np.linspace(0, 1, 5)[:, None].astype(np.float32)
    # K is in scoped_keys; it must still compute correctly through the wrap
    K = m.run(lambda mm: mm.kern.K(jnp.asarray(X)))
    assert np.allclose(np.diag(np.asarray(K)), 1.0, atol=1e-5)


def test_csym_rbf_model_trains():
    """Cylindrically-symmetric kernel in a real GPR fit of an even function
    (its symmetry prior matches f(x) = f(-x))."""
    rng = np.random.default_rng(0)
    X = np.linspace(-2, 2, 40)[:, None].astype(np.float32)
    Y = (np.cos(2 * X) + rng.normal(size=X.shape) * 0.2).astype(np.float32)

    class CsymGPR(hb.model.Model):
        def setUp(self):
            self.X = hb.Data(X)
            self.Y = hb.Data(Y)
            self.q = hb.variationals.Gaussian(shape=list(X.shape))
            self.kern = hb.gp.kernels.UnitCsymRBF(np.ones(1, np.float32))
            self.k_var = hb.Variable([1], transform=hb.transforms.positive)
            self.var = hb.Variable([1], transform=hb.transforms.positive)

        @hb.AutoOptimize()
        def ELBO(self):
            from henbun_tpu.ops.linalg import matmul_hp

            f = matmul_hp(self.kern.Cholesky(self.X), self.q) * jnp.sqrt(
                self.k_var
            )
            return jnp.sum(hb.densities.gaussian(self.Y, f, self.var)) - self.KL()

    m = CsymGPR(seed=0)
    opt = m.ELBO()
    opt.compile(optax.adam(0.01))
    e0 = float(opt.run())
    opt.optimize(maxiter=3000)
    e1 = float(opt.run())
    assert np.isfinite(e1) and e1 > e0
    fit = np.asarray(
        m.draws(
            lambda mm: jnp.matmul(mm.kern.Cholesky(mm.X), mm.q)
            * jnp.sqrt(mm.k_var),
            30,
        )
    ).mean(0)
    rmse = np.sqrt(np.mean((fit - np.cos(2 * X)) ** 2))
    assert rmse < 0.35
