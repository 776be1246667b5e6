"""Variational posteriors with reparameterized single-sample KL estimation.

Capability parity with `/root/reference/Henbun/variationals.py` (381 LoC):
``Variational`` (diagonal / fullrank Gaussian q), predefined ``Normal``,
``Gaussian``, ``OffsetGaussian``, ``Beta``.

TPU-native redesign:
  * Reparameterization noise ``u`` is drawn from an explicit PRNG key derived
    from the node's tree path (stable across mesh shapes), once per trace, and
    cached in the trace context so ``KL()`` uses the same noise as the sample
    — the single-sample estimator of `variationals.py:100-110,198-209`.
  * The fullrank sample uses a batched ``einsum('...ij,...j->...i')`` over the
    band-parted square-root — the path the reference left commented out in
    favor of expand/squeeze matmuls (`variationals.py:144-176`); XLA maps it
    straight onto the MXU with leading axes batched.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ._settings import settings, np_float
from . import transforms, priors, densities
from .core import context as _ctx
from .core.param import Variable, graph_key, Parameterized, _in_collections
from .ops.linalg import clip, fill_triangular, fill_triangular_diag_indices


def _packed_diag_indices(s):
    """Indices of the diagonal within the packed lower triangle. The packed
    layout is :func:`ops.linalg.fill_triangular`'s (scatter-free to unpack on
    TPU), not row-major."""
    return fill_triangular_diag_indices(s)


def _float_type():
    return settings.dtypes.float_type


class Variational(Parameterized):
    """Multivariate-Gaussian variational posterior over a flattened `shape`.

    q covariance (cf. reference variationals.py:84-96):
      'diagonal'        — log-std stored in q_sqrt;
      'fullrank'        — dense [size, size] matrix, lower triangle used
                          (the reference's layout);
      'fullrank_packed' — the lower triangle packed into size*(size+1)/2
                          free params: same posterior family at half the
                          parameters and encoder slab width.
    """

    def __init__(
        self,
        shape,
        n_layers=[],
        n_batch=None,
        q_shape="diagonal",
        mean=0.0,
        stddev=1.0,
        prior=None,
        transform=None,
        collections=None,
    ):
        Parameterized.__init__(self)
        collections = collections if collections is not None else [graph_key.VARIABLES]
        self._shape = [shape] if isinstance(shape, int) else list(shape)
        self.n_layers = [n_layers] if isinstance(n_layers, int) else list(n_layers)
        self.n_batch = n_batch
        self.size = int(np.prod(self._shape))
        self.collections = collections
        assert q_shape in ["diagonal", "fullrank", "fullrank_packed"]
        self.q_shape = q_shape
        self.q_mu = Variable(
            self.size,
            n_layers=n_layers,
            n_batch=self.n_batch,
            mean=mean,
            stddev=0.1 * stddev,
            collections=collections,
        )
        if self.q_shape == "diagonal":
            # log(q_sqrt) is stored — a manual positivity transform
            self.q_sqrt = Variable(
                self.size,
                n_layers=n_layers,
                n_batch=self.n_batch,
                mean=np.log(stddev),
                stddev=0.1,
                collections=collections,
            )
        elif self.q_shape == "fullrank_packed":
            # lower triangle packed into size*(size+1)/2 free params — half
            # the parameters of the reference's dense [s, s] storage, whose
            # upper triangle is dead weight the optimizer still updates
            # (cf. reference variationals.py:93-96,144-146). Layout is
            # fill-triangular order (ops/linalg.fill_triangular): unpacking is
            # concat+flip+reshape, no scatter, so the per-step cost matches
            # the dense layout on TPU (benchmarks/packed_bench.py).
            # Diagonal entries init ~stddev, off-diag ~0.
            tri_init = np.zeros(self.size * (self.size + 1) // 2, np_float())
            tri_init[_packed_diag_indices(self.size)] = stddev
            self.q_sqrt = Variable(
                self.size * (self.size + 1) // 2,
                n_layers=n_layers,
                n_batch=self.n_batch,
                mean=0.0,
                stddev=0.1 * stddev,
                collections=collections,
            )
            if collections not in graph_key.not_parameters:
                self.q_sqrt.set_free_value(
                    np.asarray(self.q_sqrt.free_value) + tri_init
                )
        else:
            self.q_sqrt = Variable(
                [self.size, self.size],
                n_layers=n_layers,
                n_batch=self.n_batch,
                mean=stddev,
                stddev=0.1 * stddev,
                collections=collections,
            )
        self.transform = transform if transform is not None else transforms.Identity()
        self.prior = prior

    # --- sampling -----------------------------------------------------------
    def _state(self):
        """The per-trace sample state {u, raw, transformed}; draws it lazily
        for non-LOCAL nodes (LOCAL nodes get theirs in feed())."""
        ctx = _ctx.current()
        if ctx is None:
            raise RuntimeError(
                "Variational samples only exist inside a traced objective."
            )
        path = self.path_to(ctx.root)
        if path in ctx.samples:
            return ctx.samples[path]
        if self.collections is graph_key.LOCAL:
            raise ValueError(
                "local variational parameter " + self.long_name + " is not fed."
            )
        if self.n_batch is None:
            sample_shape = tuple(self.n_layers) + (self.size,)
        else:
            sample_shape = tuple(self.n_layers) + (self.n_batch, self.size)
        u = jax.random.normal(ctx.node_key(path), sample_shape, dtype=_float_type())
        raw = self._sample(u)
        state = {
            "u": u,
            "raw": raw,
            "transformed": self.transform.tf_forward(raw),
        }
        ctx.samples[path] = state
        return state

    def _sample(self, u):
        """Reparameterized draw from q given i.i.d. noise u
        (cf. variationals.py:131-153)."""
        if self.q_shape == "diagonal":
            return self.q_mu + jnp.exp(self.q_sqrt) * u
        if self.q_shape == "fullrank_packed":
            sqrt = fill_triangular(self.q_sqrt, self.size)
        else:
            sqrt = jnp.tril(self.q_sqrt)
        return self.q_mu + jnp.einsum("...ij,...j->...i", sqrt, u)

    def tensor(self):
        """Inside a trace this node *is* a posterior sample, reshaped to
        [*n_layers, (N,) *shape] and clipped (cf. variationals.py:112-119)."""
        s = self._state()
        if self.collections is not graph_key.LOCAL and self.n_batch is None:
            return clip(
                jnp.reshape(s["transformed"], tuple(self.n_layers) + tuple(self._shape))
            )
        return clip(
            jnp.reshape(
                s["transformed"], tuple(self.n_layers) + (-1,) + tuple(self._shape)
            )
        )

    def feed(self, x):
        """LOCAL case: unpack the encoder slab into q_mu/q_sqrt, then draw
        fresh noise with the fed batch size (cf. variationals.py:121-129)."""
        Parameterized.feed(self, x)
        if self.collections is graph_key.LOCAL:
            ctx = _ctx.current()
            path = self.path_to(ctx.root)
            sample_shape = tuple(self.n_layers) + (x.shape[-2], self.size)
            u = jax.random.normal(ctx.node_key(path), sample_shape, dtype=_float_type())
            raw = self._sample(u)
            ctx.samples[path] = {
                "u": u,
                "raw": raw,
                "transformed": self.transform.tf_forward(raw),
            }

    # --- KL -----------------------------------------------------------------
    @property
    def logdet(self):
        """Log-determinant of the posterior covariance's square root factor
        per element (cf. variationals.py:178-186)."""
        if self.q_shape == "diagonal":
            return 2.0 * self.q_sqrt
        # epsilon keeps the barrier (and its gradient) finite when an Adam
        # step pushes a diagonal entry across zero; an exact log(d^2) emits an
        # infinite gradient there and one such step NaNs the training state
        if self.q_shape == "fullrank_packed":
            diag = self.q_sqrt[..., _packed_diag_indices(self.size)]
        else:
            diag = jnp.diagonal(self.q_sqrt, axis1=-2, axis2=-1)
        return jnp.log(jnp.square(diag) + 1e-20)

    def KL(self, collection=None):
        if collection is None or _in_collections(collection, self.collections):
            return self._KL()
        return jnp.zeros([], _float_type())

    def _KL(self):
        """Single-sample estimate of KL[q || p]
        (cf. variationals.py:198-209)."""
        s = self._state()
        kl = -0.5 * jnp.sum(np.log(2.0 * np.pi) + self.logdet + jnp.square(s["u"]))
        if self.prior is not None:
            kl -= jnp.sum(self.prior.logp(s["transformed"]))
            kl -= jnp.sum(self.transform.tf_log_jacobian(s["raw"]))
        return kl


# --- predefined variational parameters --------------------------------------


class Normal(Variational):
    """Variational parameter with N(0,1) prior and identity transform; its
    _KL is the reference's reduced closed-form-ish single-sample estimate
    (variationals.py:225-230).

    analytic_kl=True replaces the estimator with the exact Gaussian KL
    0.5 (|mu|^2 + tr Sigma - m - logdet Sigma) — valid because this family
    pins the prior to N(0, I) with an identity transform. Zero-variance KL
    gradients; required for stable natural-gradient training
    (optimizers.natural_gradient) and a variance reduction for Adam too.
    """

    def __init__(
        self,
        shape,
        n_layers=[],
        n_batch=None,
        q_shape="diagonal",
        mean=0.0,
        stddev=1.0,
        collections=None,
        analytic_kl=False,
    ):
        Variational.__init__(
            self,
            shape,
            q_shape=q_shape,
            n_layers=n_layers,
            n_batch=n_batch,
            mean=mean,
            stddev=stddev,
            prior=priors.Normal(),
            transform=transforms.Identity(),
            collections=collections,
        )
        self.analytic_kl = bool(analytic_kl)

    def _KL(self):
        if self.analytic_kl:
            mu = self.q_mu
            sq = self.q_sqrt
            if self.q_shape == "diagonal":
                tr = jnp.sum(jnp.exp(2.0 * sq))
            elif self.q_shape == "fullrank_packed":
                # every packed entry is a factor entry: tr LL^T = sum L_ij^2
                tr = jnp.sum(jnp.square(sq))
            else:
                tr = jnp.sum(jnp.square(jnp.tril(sq)))
            total = int(np.prod(mu.shape))
            return 0.5 * (
                jnp.sum(jnp.square(mu)) + tr - total - jnp.sum(self.logdet)
            )
        s = self._state()
        return -0.5 * jnp.sum(
            self.logdet + jnp.square(s["u"]) - jnp.square(s["raw"])
        )


class Gaussian(Normal):
    """Normal posterior scaled by a trainable positive `scale` Variable;
    initialization splits mean/stddev between the scale and q
    (cf. variationals.py:264-288)."""

    def __init__(
        self,
        shape,
        n_layers=[],
        n_batch=None,
        q_shape="diagonal",
        mean=0.0,
        stddev=1.0,
        collections=None,
        scale_shape=None,
        scale_n_layers=None,
        analytic_kl=False,
    ):
        if np.abs(mean) < stddev:
            scale_mean = stddev
            q_mean = mean / stddev
            q_std = 1.0
        else:
            scale_mean = np.abs(mean)
            q_mean = 1.0
            q_std = stddev / np.abs(mean)
        Variational.__init__(
            self,
            shape,
            q_shape=q_shape,
            n_layers=n_layers,
            n_batch=n_batch,
            mean=q_mean,
            stddev=q_std,
            prior=priors.Normal(),
            transform=transforms.Identity(),
            collections=collections,
        )
        self.analytic_kl = bool(analytic_kl)
        scale_shape = scale_shape or [1 for _ in self._shape]
        scale_layer = scale_n_layers or [1 for _ in self.n_layers]
        self.scale = Variable(
            scale_shape,
            n_layers=scale_layer,
            n_batch=n_batch,
            mean=scale_mean,
            stddev=0.1 * scale_mean,
            transform=transforms.positive,
            collections=collections,
        )

    def tensor(self):
        return self.scale * Normal.tensor(self)


class OffsetGaussian(Gaussian):
    """Gaussian posterior plus a trainable offset (variationals.py:293-314)."""

    def __init__(
        self,
        shape,
        n_layers=[],
        n_batch=None,
        q_shape="diagonal",
        mean=0.0,
        stddev=1.0,
        collections=None,
        scale_shape=None,
        scale_n_layers=None,
        analytic_kl=False,
    ):
        Gaussian.__init__(
            self,
            shape=shape,
            n_layers=n_layers,
            n_batch=n_batch,
            q_shape=q_shape,
            mean=0.0,
            stddev=stddev,
            collections=collections,
            scale_shape=scale_shape,
            scale_n_layers=scale_n_layers,
            analytic_kl=analytic_kl,
        )
        offset_shape = scale_shape or [1 for _ in self._shape]
        offset_layer = scale_n_layers or [1 for _ in self.n_layers]
        self.offset = Variable(
            offset_shape,
            n_layers=offset_layer,
            n_batch=n_batch,
            mean=mean,
            stddev=0.1 * mean,
            collections=collections,
        )

    def tensor(self):
        return Gaussian.tensor(self) + self.offset


class Beta(Variational):
    """Posterior mapped to (0,1) by a Logistic transform, with a Beta prior
    whose alpha/beta hyperparameters are trainable positive Variables
    (variationals.py:316-381)."""

    def __init__(
        self,
        shape,
        n_layers=[],
        n_batch=None,
        q_shape="diagonal",
        mean=0.0,
        stddev=1.0,
        collections=None,
        scale_shape=None,
        scale_n_layers=None,
    ):
        Variational.__init__(
            self,
            shape,
            q_shape=q_shape,
            n_layers=n_layers,
            n_batch=n_batch,
            mean=mean,
            stddev=stddev,
            transform=transforms.Logistic(),
            collections=collections,
        )
        scale_shape = scale_shape or [1 for _ in self._shape]
        scale_layer = scale_n_layers or [1 for _ in self.n_layers]
        self.alpha = Variable(
            scale_shape,
            n_layers=scale_layer,
            n_batch=n_batch,
            mean=1.0,
            stddev=0.1,
            transform=transforms.positive,
            collections=collections,
        )
        self.beta = Variable(
            scale_shape,
            n_layers=scale_layer,
            n_batch=n_batch,
            mean=1.0,
            stddev=0.1,
            transform=transforms.positive,
            collections=collections,
        )

    def _KL(self):
        s = self._state()
        kl = -0.5 * jnp.sum(np.log(2.0 * np.pi) + self.logdet + jnp.square(s["u"]))
        kl -= jnp.sum(densities.beta(self.alpha, self.beta, s["transformed"]))
        kl -= jnp.sum(self.transform.tf_log_jacobian(s["raw"]))
        return kl
