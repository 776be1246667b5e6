"""Amortized stochastic VI — the framework's flagship scale workload
(BASELINE.json config 3: encoder -> local variational params, minibatch SVI
on a synthetic 1e6-point regression).

This is the capability Henbun's README sells (`/root/reference/README.md:14-21`):
per-datapoint latent variables whose variational parameters are not stored but
*fed* by an encoder network, so model state is O(globals) and training is
minibatch SGD. Here the whole step — encoder forward, slab unpack,
reparameterized sample, decoder forward, ELBO, gradients, Adam update and the
minibatch gather — is one fused XLA program scanned over steps on device.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

import henbun_tpu as hb
from henbun_tpu import densities


class AmortizedRegression(hb.model.Model):
    """VAE-style heteroscedastic regression with a per-datapoint latent:

        z_i ~ N(0, 1)^d_z          (prior)
        y_i ~ N(decoder(x_i, z_i), var)
        q(z_i) = Normal(mu_i, sig_i) with (mu_i, log sig_i) = encoder(x_i, y_i)

    The local posterior q(z) is a LOCAL hb.variationals.Normal fed by the
    encoder slab (assignment = feeding idiom, cf. reference param.py:384-394).
    """

    def setUp(self, X, Y, d_z=4, hidden=64, analytic_kl=True,
              q_local="diagonal"):
        self.x = hb.MinibatchData(X)
        self.y = hb.MinibatchData(Y)
        self.n_data = X.shape[0]
        d_x = X.shape[1]
        # local latent: one per minibatch element, fed by the encoder.
        # analytic_kl: the local KL is exactly computable from the fed
        # (mu, log sigma) slab — zero-variance vs the reference's 1-sample
        # estimate, at the cost of one exp over the slab (free next to the
        # decoder matmuls). Set False for the reference-parity estimator.
        # q_local: the local posterior family — 'diagonal' (the reference's
        # encoder contract) or 'fullrank_packed' (correlated d_z-dim locals;
        # the packed layout keeps the slab at d_z + d_z(d_z+1)/2 columns —
        # half the dense d_z + d_z^2 — and unpacks scatter-free per step,
        # SURVEY.md hard part (a)).
        self.z = hb.variationals.Normal(
            shape=[d_z], q_shape=q_local, collections=hb.graph_key.LOCAL,
            analytic_kl=analytic_kl,
        )
        # packed locals: the slab feeds FACTOR entries directly (no log
        # transform like the diagonal family), so a fresh encoder's ~0
        # outputs would start every local near-singular — logdet ~ -46 per
        # latent dim dominates the KL and wrecks early training (measured
        # on the v5e: tail ELBO/n -6.8 vs -0.32 for diagonal locals at
        # d_z=8, n=1e6). Bias the slab's diagonal slots by +1 so the fed
        # factor starts at ~identity, the prior-matched init the non-LOCAL
        # packed family also uses (variationals.py).
        # (identity-bias + 0.1x factor scaling; the measured failure modes
        # and the contract live in models/_slab.py, shared by every
        # amortized family)
        if q_local == "fullrank_packed":
            from henbun_tpu.models._slab import packed_slab_conditioning

            self._slab_bias, self._slab_scale = packed_slab_conditioning(
                d_z, self.z.feed_size
            )
        else:
            self._slab_bias = None
            self._slab_scale = None
        # encoder emits the feed slab [N, feed_size] = [N, 2*d_z]
        # small init stddev: the encoder's raw output feeds log-sigma of the
        # local posterior; O(1) weights would give exp(~50) sigmas at init
        self.encoder = hb.nn.NeuralNet(
            [d_x + 1, hidden, self.z.feed_size],
            neuron_types=hb.nn.relu,
            stddev=0.3,
        )
        self.decoder = hb.nn.NeuralNet(
            [d_x + d_z, hidden, 1], neuron_types=hb.nn.relu, stddev=0.3
        )
        self.var = hb.Variable(shape=[1], transform=hb.transforms.positive)

    @hb.AutoOptimize()
    def ELBO(self):
        from henbun_tpu.models._slab import condition_slab

        xy = jnp.concatenate([self.x, self.y], axis=-1)
        slab = condition_slab(
            self.encoder(xy), self._slab_bias, self._slab_scale
        )
        self.z = slab                      # feed: unpack slab + sample
        z = self.z                          # [N, d_z] posterior sample
        xz = jnp.concatenate([self.x, z], axis=-1)
        y_fit = self.decoder(xz)
        batch = xy.shape[0]
        # unbiased minibatch scaling: likelihood and local KL both sum over
        # the batch, so scale to the full dataset for correct global gradients
        scale = self.n_data / batch
        log_lik = jnp.sum(densities.gaussian(self.y, y_fit, self.var))
        return scale * (log_lik - self.KL())


def make_synthetic_regression(n=1_000_000, d_x=8, seed=0):
    """Synthetic nonlinear heteroscedastic regression at the north-star size."""
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d_x)).astype(np.float32)
    w = rng.normal(size=(d_x,)).astype(np.float32)
    f = np.tanh(X @ w) + 0.3 * np.sin(2.0 * X[:, 0])
    noise = 0.1 + 0.2 * (1 + np.tanh(X[:, 1]))
    Y = (f + rng.normal(size=n) * noise).astype(np.float32)[:, None]
    return X, Y
