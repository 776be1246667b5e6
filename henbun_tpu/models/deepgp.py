"""Doubly-stochastic Deep GP regression (arbitrary depth).

A composition of sparse GP layers trained by reparameterized minibatch SVI
(Salimbeni & Deisenroth-style): each layer carries its own whitened inducing
posterior q(u_l), a function sample propagates THROUGH the layers per trace
(the correction noise of each layer is drawn inside `SparseGP.samples`), and
the ELBO is

    N/|B| sum_i E_q[log N(y_i | f_L(...f_1(x_i)), var)] - sum_l KL(u_l).

The reference has the ingredients (SparseGP sampling, whitened Normal
posteriors, minibatching — `/root/reference/Henbun/gp/gp.py:53-143`) but no
composition. TPU notes: each hidden layer's width is a leading batch axis on
its variational node (`n_layers=[width]` — batched solves, one kernel gram
per layer), and the whole multi-layer forward is straight-line code inside
the jitted scan step, so depth costs a chain of small matmuls, not extra
dispatches.

Every hidden layer gets the standard linear (identity-padded, fixed) mean
function: without it, the zero-mean prior over h wipes out the input
ordering at initialization and the composition funnels through a constant —
the known DGP pathology. The output layer is zero-mean. Layer l+1's
inducing inputs start on the mean-function image of layer l's (where the
hidden units sit at init).

Layers live in a ParamList of per-layer Parameterized nodes
(``model.layers[l].gp / .u / .k_var``), so the tree machinery — KL
aggregation, collections, checkpoint paths, natural-gradient pairing over
layered ``n_layers`` nodes — applies per layer with no special casing.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

import henbun_tpu as hb
from henbun_tpu import densities


class DeepGPRegression(hb.model.Model):
    """Deep GP of ``depth`` SparseGP layers: x -> h_1 -> ... -> f -> y.

    depth=2 (default) is the classic two-layer DGP; any depth >= 1 works
    (depth=1 degenerates to a zero-mean SVGP). Hidden widths are
    ``d_hidden`` (default: the input dimension); the output layer is 1-D.
    """

    def setUp(self, X, Y, num_inducing=32, d_hidden=None, q_shape="fullrank",
              depth=2):
        n, d_in = np.shape(X)
        depth = int(depth)
        if depth < 1:
            raise ValueError("depth must be >= 1, got %d" % depth)
        d_hidden = int(d_hidden) if d_hidden is not None else d_in
        self._widths = [d_hidden] * (depth - 1) + [1]
        self.x = hb.MinibatchData(X)
        self.y = hb.MinibatchData(Y)
        self.n_data = n
        m = int(num_inducing)

        z = np.quantile(X, np.linspace(0.0, 1.0, m), axis=0).astype(
            np.float32
        )
        eye_m = np.eye(m, dtype=np.float32)
        layers = []
        mean_Ws = []
        in_dim = d_in
        for i, width in enumerate(self._widths):
            lay = hb.Parameterized()
            lay.gp = hb.gp.SparseGP(hb.gp.kernels.UnitRBF(), z)
            lay.u = hb.variationals.Normal(
                shape=[1, m], n_layers=[width], q_shape=q_shape,
                analytic_kl=True,
            )
            if q_shape == "fullrank":
                # prior-matched identity init (see SVGPRegression.setUp: the
                # dense mean=stddev init is near-singular at m >= ~50)
                lay.u.q_sqrt = np.broadcast_to(eye_m, (width, m, m)).copy()
            lay.k_var = hb.Variable(
                shape=[1], transform=hb.transforms.positive
            )
            if i < len(self._widths) - 1:
                # identity-padded fixed skip for the hidden layer; the next
                # layer's inducing inputs start on its image of z
                W = np.zeros((in_dim, width), np.float32)
                k = min(in_dim, width)
                W[:k, :k] = np.eye(k, dtype=np.float32)
                mean_Ws.append(W)
                z = (z @ W).astype(np.float32)
            else:
                mean_Ws.append(None)  # zero-mean output layer
            in_dim = width
            layers.append(lay)
        self.layers = hb.ParamList(layers)
        self._mean_Ws = mean_Ws
        self.var = hb.Variable(shape=[1], transform=hb.transforms.positive)

    # -------------------------------------------------------------- forward
    def _propagate(self, x, upto=None):
        """One posterior sample through layers [0, upto): [B, width]."""
        h = jnp.asarray(x)
        stop = len(self._widths) if upto is None else int(upto)
        for i in range(stop):
            lay = self.layers[i]
            u = jnp.reshape(lay.u, (self._widths[i], -1))  # [width, m]
            s = lay.gp.samples(h, u, "diagonal") * jnp.sqrt(lay.k_var)
            out = jnp.swapaxes(s, -1, -2)  # [B, width]
            W = self._mean_Ws[i]
            if W is not None:
                out = out + h @ jnp.asarray(W)
            h = out
        return h

    def hidden(self, x):
        """One posterior sample of the FIRST hidden layer at x:
        [B, d_hidden] (the warp the composition learns)."""
        return self._propagate(x, upto=1)

    def f(self, x):
        """One posterior sample of the output function at x: [B, 1]."""
        return self._propagate(x)

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
