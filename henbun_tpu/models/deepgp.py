"""Doubly-stochastic Deep GP regression (two SparseGP layers).

A composition of sparse GP layers trained by reparameterized minibatch SVI
(Salimbeni & Deisenroth-style): each layer carries its own whitened inducing
posterior q(u_l), a function sample propagates THROUGH the layers per trace
(the correction noise of each layer is drawn inside `SparseGP.samples`), and
the ELBO is

    N/|B| sum_i E_q[log N(y_i | f2(f1(x_i)), var)] - KL(u1) - KL(u2).

The reference has the ingredients (SparseGP sampling, whitened Normal
posteriors, minibatching — `/root/reference/Henbun/gp/gp.py:53-143`) but no
composition. TPU notes: the hidden width is a leading batch axis on layer 1's
variational node (`n_layers=[d_hidden]` — batched solves, one kernel gram),
and the whole two-layer forward is straight-line code inside the jitted scan
step, so depth costs two small matmul chains, not extra dispatches.

Layer 1 gets the standard linear (identity) mean function: without it, the
zero-mean prior over h wipes out the input ordering at initialization and
the model funnels through a constant — the known DGP pathology.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

import henbun_tpu as hb
from henbun_tpu import densities


class DeepGPRegression(hb.model.Model):
    """Two-layer deep GP: x -> h (d_hidden dims) -> f -> y."""

    def setUp(self, X, Y, num_inducing=32, d_hidden=None, q_shape="fullrank"):
        n, d_in = np.shape(X)
        d_hidden = int(d_hidden) if d_hidden is not None else d_in
        self._d_hidden = d_hidden
        self.x = hb.MinibatchData(X)
        self.y = hb.MinibatchData(Y)
        self.n_data = n
        m = int(num_inducing)

        z1 = np.quantile(X, np.linspace(0.0, 1.0, m), axis=0).astype(
            np.float32
        )
        self.gp1 = hb.gp.SparseGP(hb.gp.kernels.UnitRBF(), z1)
        self.u1 = hb.variationals.Normal(
            shape=[1, m], n_layers=[d_hidden], q_shape=q_shape,
            analytic_kl=True,
        )
        # linear mean function for layer 1 (identity-padded, fixed): the
        # zero-mean alternative starts every hidden unit at noise and the
        # composition collapses to a constant function (the classic DGP
        # pathology); a fixed skip keeps h ordered like x at init.
        W = np.zeros((d_in, d_hidden), np.float32)
        W[: min(d_in, d_hidden), : min(d_in, d_hidden)] = np.eye(
            min(d_in, d_hidden), dtype=np.float32
        )
        self._mean_W = W

        # layer 2 lives in hidden space; init its inducing inputs on the
        # mean-function image of the data (where h starts)
        z2 = (z1 @ W).astype(np.float32)
        self.gp2 = hb.gp.SparseGP(hb.gp.kernels.UnitRBF(), z2)
        self.u2 = hb.variationals.Normal(
            shape=[1, m], q_shape=q_shape, analytic_kl=True
        )
        if q_shape == "fullrank":
            # prior-matched identity init (see SVGPRegression.setUp: the
            # dense mean=stddev init is near-singular at m >= ~50)
            eye = np.eye(m, dtype=np.float32)
            self.u1.q_sqrt = np.broadcast_to(eye, (d_hidden, m, m)).copy()
            self.u2.q_sqrt = eye.copy()
        self.k_var1 = hb.Variable(shape=[1], transform=hb.transforms.positive)
        self.k_var2 = hb.Variable(shape=[1], transform=hb.transforms.positive)
        self.var = hb.Variable(shape=[1], transform=hb.transforms.positive)

    # -------------------------------------------------------------- forward
    def hidden(self, x):
        """One posterior sample of the hidden layer at x: [B, d_hidden]."""
        u1 = jnp.reshape(self.u1, (self._d_hidden, -1))  # [d_h, m]
        h = self.gp1.samples(x, u1, "diagonal") * jnp.sqrt(self.k_var1)
        return jnp.swapaxes(h, -1, -2) + x @ jnp.asarray(self._mean_W)

    def f(self, x):
        """One posterior sample of the output function at x: [B, 1]."""
        h = self.hidden(x)
        f = self.gp2.samples(h, self.u2, "diagonal") * jnp.sqrt(self.k_var2)
        return jnp.swapaxes(f, -1, -2)  # [B, 1]

    def predict_f(self, x_new):
        """Posterior function samples at new inputs (use with Model.draws)."""
        return self.f(jnp.asarray(x_new))

    def predict_y(self, x_new):
        """Predictive samples of y (adds observation noise)."""
        from henbun_tpu.core import context as _ctx

        f = self.predict_f(x_new)
        eps = jax.random.normal(
            _ctx.current().tagged_key("deepgp_predict_y"), f.shape,
            dtype=f.dtype,
        )
        return f + jnp.sqrt(self.var) * eps

    # ------------------------------------------------------------ objective
    @hb.AutoOptimize()
    def ELBO(self):
        f = self.f(self.x)  # [B, 1]
        scale = self.n_data / f.shape[0]
        return scale * jnp.sum(
            densities.gaussian(self.y, f, self.var)
        ) - self.KL()


def make_step_dataset(n=400, noise=0.05, seed=0):
    """The canonical DGP test bed: a sharp step, y = 1[x > 0] + eps —
    a stationary single-layer GP must trade off the jump against the flat
    regions; the composition warps x instead."""
    rng = np.random.default_rng(seed)
    X = np.sort(rng.uniform(-1, 1, size=(n, 1))).astype(np.float32)
    Y = (X > 0).astype(np.float32) + rng.normal(size=(n, 1)).astype(
        np.float32
    ) * noise
    return X, Y
