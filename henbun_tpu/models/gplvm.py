"""Amortized Bayesian GP-LVM: unsupervised latent variable model with a
GP decoder.

    t_i ~ N(0, I)^{d_z}                 (latent coordinates, UNOBSERVED)
    f_d ~ GP(0, k)  for each of d_y outputs (shared kernel, sparse)
    y_i ~ N(F(t_i), var I)
    q(t_i) fed by an encoder from y_i     (amortized recognition network)
    q(u_d) whitened inducing posteriors   (layered n_layers=[d_y] axis)

This joins the framework's two halves the reference could not: the
encoder-fed LOCAL machinery (`/root/reference/Henbun/param.py:291-304`, the
README's amortization pitch) and the SparseGP decoder
(`/root/reference/Henbun/gp/gp.py:53-143`) — a GP-decoder VAE trained by
minibatch SVI, one XLA program per scan chunk. MC over both t and u
(doubly reparameterized); the local KL is closed-form and minibatch-scaled,
the inducing KL is global.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

import henbun_tpu as hb
from henbun_tpu import densities


class GPLVM(hb.model.Model):
    """Amortized sparse GP-LVM (Y [n, d_y] -> latents [n, d_z])."""

    def setUp(self, Y, d_z=1, num_inducing=16, hidden=32,
              q_local="diagonal"):
        n, d_y = np.shape(Y)
        self._d_y, self._d_z = int(d_y), int(d_z)
        self.y = hb.MinibatchData(Y)
        self.n_data = n

        # recognition network: y_i -> feed slab of q(t_i)
        self.t = hb.variationals.Normal(
            shape=[d_z], q_shape=q_local, collections=hb.graph_key.LOCAL,
            analytic_kl=True,
        )
        self.encoder = hb.nn.NeuralNet(
            [d_y, hidden, self.t.feed_size],
            neuron_types=hb.nn.relu, stddev=0.3,
        )
        # packed (correlated) locals need the identity-biased, 0.1x-scaled
        # slab conditioning (models/_slab.py: a raw slab starts every local
        # near-singular — measured collapse in the amortized family)
        if q_local == "fullrank_packed":
            from henbun_tpu.models._slab import packed_slab_conditioning

            self._slab_bias, self._slab_scale = packed_slab_conditioning(
                d_z, self.t.feed_size
            )
        else:
            self._slab_bias = None
            self._slab_scale = None

        # GP decoder over the latent space; inducing inputs where the N(0,I)
        # prior puts the latents
        m = int(num_inducing)
        rng = np.random.default_rng(0)
        if d_z == 1:
            z = np.linspace(-2.2, 2.2, m).reshape(-1, 1).astype(np.float32)
        else:
            z = rng.normal(size=(m, d_z)).astype(np.float32)
        self.gp = hb.gp.SparseGP(hb.gp.kernels.UnitRBF(), z)
        self.u = hb.variationals.Normal(
            shape=[1, m], n_layers=[d_y], q_shape="fullrank",
            analytic_kl=True,
        )
        eye = np.eye(m, dtype=np.float32)
        self.u.q_sqrt = np.broadcast_to(eye, (d_y, m, m)).copy()
        self.k_var = hb.Variable(shape=[1], transform=hb.transforms.positive)
        self.var = hb.Variable(shape=[1], transform=hb.transforms.positive)

    # -------------------------------------------------------------- internals
    def _decode(self, t):
        """One GP-decoder sample at latent coordinates t [B, d_z]: [B, d_y]."""
        u = jnp.reshape(self.u, (self._d_y, -1))
        F = self.gp.samples(t, u, "diagonal") * jnp.sqrt(self.k_var)
        return jnp.swapaxes(F, -1, -2)

    def _slab(self, y):
        from henbun_tpu.models._slab import condition_slab

        return condition_slab(
            self.encoder(y), self._slab_bias, self._slab_scale
        )

    def latent_mean(self, y):
        """The encoder's posterior mean over latents for rows y [B, d_y]:
        [B, d_z] — deterministic (the slab's first d_z slots are q_mu; LOCAL
        children pack name-sorted, q_mu before q_sqrt)."""
        return self._slab(jnp.asarray(y))[..., : self._d_z]

    def reconstruct(self, y):
        """One posterior reconstruction sample of rows y: encode, sample
        q(t), decode. Use with Model.draws for means/bands."""
        self.t = self._slab(jnp.asarray(y))  # feed
        return self._decode(self.t)

    # ------------------------------------------------------------- objective
    @hb.AutoOptimize()
    def ELBO(self):
        self.t = self._slab(self.y)  # feed: unpack slab + sample q(t)
        t = self.t  # [B, d_z] reparameterized sample
        y_fit = self._decode(t)
        batch = y_fit.shape[0]
        scale = self.n_data / batch
        log_lik = jnp.sum(densities.gaussian(self.y, y_fit, self.var))
        # local KL sums over the batch -> minibatch-scaled; the inducing
        # posterior's KL is global -> unscaled
        local_kl = self.KL(hb.graph_key.LOCAL)
        global_kl = self.KL(hb.graph_key.VARIABLES)
        return scale * (log_lik - local_kl) - global_kl


def make_curve_dataset(n=1000, noise=0.05, seed=0):
    """Observations on a smooth 1D curve embedded in 3D:
    y(t) = [sin(t), cos(t), t/2] + eps, t ~ U(-2, 2). The GP-LVM must
    recover t up to sign/monotone reparameterization."""
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(-2.0, 2.0, size=n)).astype(np.float32)
    Y = np.stack(
        [np.sin(t), np.cos(t), 0.5 * t], axis=1
    ) + rng.normal(size=(n, 3)).astype(np.float32) * noise
    return Y.astype(np.float32), t
