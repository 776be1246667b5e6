"""Mixture-of-experts GP regression — the reference's second workload
(`/root/reference/notebooks/Expert_GPR.ipynb`): two latent GPs with short and
long lengthscales mixed by a third sigmoid-gated GP.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

import henbun_tpu as hb
from henbun_tpu import densities
from henbun_tpu.ops.linalg import matmul_hp


class ExpertGPR(hb.model.Model):
    """f = (sigmoid(f_r) * f_s + (1 - sigmoid(f_r)) * f_l) * k_var with
    f_s, f_l, f_r whitened GP samples (cf. Expert_GPR.ipynb cell 8)."""

    def setUp(self, X, Y):
        self.X = hb.Data(X)
        self.Y = hb.Data(Y)
        self.q_s = hb.variationals.Gaussian(shape=list(Y.shape), q_shape="fullrank")
        self.q_l = hb.variationals.Gaussian(shape=list(Y.shape), q_shape="fullrank")
        self.q_r = hb.variationals.Gaussian(shape=list(Y.shape), q_shape="fullrank")
        self.kern_s = hb.gp.kernels.UnitRBF(np.ones(1, np.float32) * 0.2)
        self.kern_l = hb.gp.kernels.UnitRBF(np.ones(1, np.float32) * 1.0)
        self.kern_r = hb.gp.kernels.UnitRBF(np.ones(1, np.float32) * 1.0)
        self.k_var = hb.Variable(shape=[1], transform=hb.transforms.positive)
        self.k_var_r = hb.Variable(shape=[1], transform=hb.transforms.positive)
        self.var = hb.Variable(shape=[1], transform=hb.transforms.positive)

    def f_mixture(self):
        f_s = matmul_hp(self.kern_s.Cholesky(self.X), self.q_s)
        f_l = matmul_hp(self.kern_l.Cholesky(self.X), self.q_l)
        f_r = matmul_hp(self.kern_r.Cholesky(self.X), self.q_r) * jnp.sqrt(
            self.k_var_r
        )
        fraction = jax.nn.sigmoid(f_r)
        return (fraction * f_s + (1 - fraction) * f_l) * self.k_var

    def predict_f(self, x_new):
        """Posterior mixture samples at new inputs: each latent GP is
        conditioned through its whitened representation (no reference
        counterpart — the notebook only draws at training X)."""
        from henbun_tpu.gp.gp import whitened_conditional

        def cond(kern, q):
            u = jnp.swapaxes(q, -1, -2)  # [1, n]
            out = whitened_conditional(kern, x_new, self.X, u, "diagonal")
            return jnp.swapaxes(out, -1, -2)  # [n*, 1]

        f_s = cond(self.kern_s, self.q_s)
        f_l = cond(self.kern_l, self.q_l)
        f_r = cond(self.kern_r, self.q_r) * jnp.sqrt(self.k_var_r)
        fraction = jax.nn.sigmoid(f_r)
        return (fraction * f_s + (1 - fraction) * f_l) * self.k_var

    @hb.AutoOptimize()
    def ELBO(self):
        f = self.f_mixture()
        return jnp.sum(densities.gaussian(self.Y, f, self.var)) - self.KL()

    @hb.AutoOptimize()
    def ELBO_single(self):
        """Plain single-GP fit used as the notebook's initial estimate
        (Expert_GPR.ipynb cells 12-14, Adam(0.01), jitter 3e-4)."""
        f_l = matmul_hp(self.kern_l.Cholesky(self.X), self.q_l) * self.k_var
        return jnp.sum(densities.gaussian(self.Y, f_l, self.var)) - self.KL()


def make_expert_dataset(n=150, seed=0):
    """Synthetic dataset in the spirit of the notebook: a signal that switches
    between rough and smooth regimes."""
    rng = np.random.default_rng(seed)
    X = np.linspace(-1, 1, n).reshape(-1, 1).astype(np.float32)
    rough = np.sin(14 * X) * 0.6
    smooth = 0.8 * X
    gate = 1.0 / (1.0 + np.exp(-8 * X))
    Y = (gate * rough + (1 - gate) * smooth + rng.normal(size=(n, 1)) * 0.1).astype(
        np.float32
    )
    return X, Y
