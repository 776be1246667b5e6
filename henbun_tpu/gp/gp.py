"""Whitened (sparse) GP posterior sampling.

Parity with `/root/reference/Henbun/gp/gp.py:9-192`: ``GP`` (samples =
u @ Cholesky(K(x))^T) and ``SparseGP`` (inducing points z; samples =
u @ (Lm^-1 Kmn) plus an 'additional covariance' correction in
{'diagonal','neglected','fullrank'} flavors).

TPU-native notes: triangular solves and Cholesky batch natively over leading
axes; the batched branch broadcasts z against [N, n, d] in a single batched
matmul rather than the reference's tile+matmul (`gp.py:167-172`); correction
noise draws an explicit PRNG key from the trace context.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core import context as _ctx
from ..core.param import Variable, Parameterized, graph_key
from .._settings import settings
from ..ops.linalg import eye, matmul_hp, tri_solve


def _float_type():
    return settings.dtypes.float_type


def _safe_corr_std(diag_cov):
    """sqrt of the correction variance with a jitter floor.

    The raw ``sqrt(abs(diag_cov))`` is forward-safe but GRADIENT-unsafe: at a
    training input that (nearly) coincides with an inducing point the
    explained variance cancels diag_cov to ~0 and d/dx sqrt(|x|) -> inf — one
    such minibatch row NaNs the whole training state (measured: multiclass
    SVGP at n=5000, m=64 died stochastically around step 3-4k; the quantile
    z-init guarantees near-coincident points). The floor bounds the gradient
    at 1/(2 sqrt(jitter)) and zeroes it in the negative-cancellation region,
    at the cost of jitter-sized extra correction variance — the same jitter
    already added to every gram."""
    jitter = settings.numerics.jitter_level
    return jnp.sqrt(jnp.maximum(diag_cov, 0.0) + jitter)


def whitened_conditional(kern, x_new, x, u, q_shape="diagonal"):
    """Exact GP conditional through the whitened representation.

    With f = L u (L = chol(K(x))), f* = K(x, x*)^T L^-T u +
    N(0, K** - K*^T K^-1 K*) — the same math as SparseGP.samples with x as
    the inducing set. u: [N, n]; returns [N, n*]. q_shape in
    {'neglected','diagonal','fullrank'} controls the residual-variance term.
    """
    assert q_shape in ["neglected", "diagonal", "fullrank"]
    ctx = _ctx.current()
    Lm = kern.Cholesky(x)  # [n, n]
    LnT = tri_solve(Lm, kern.K(x, x_new))  # [n, n*]
    samples = matmul_hp(u, LnT)  # [N, n] @ [n, n*] -> [N, n*]
    if q_shape == "neglected":
        return samples
    if q_shape == "diagonal":
        diag_cov = kern.Kdiag(x_new) - jnp.sum(jnp.square(LnT), -2)
        noise = jax.random.normal(
            ctx.tagged_key("gp_cond_diag"), samples.shape, dtype=_float_type()
        )
        return samples + _safe_corr_std(diag_cov) * noise
    from ..ops.linalg import safe_cholesky

    cov = kern.K(x_new) - matmul_hp(jnp.swapaxes(LnT, -1, -2), LnT)
    chol = safe_cholesky(cov, settings.numerics.jitter_level)
    noise = jax.random.normal(
        ctx.tagged_key("gp_cond_full"), samples.shape, dtype=_float_type()
    )
    return samples + matmul_hp(noise, jnp.swapaxes(chol, -1, -2))


class GP(Parameterized):
    """Sample from the whitened GP posterior: mean L*u.q_mu, covariance
    (L*u.q_sqrt)(L*u.q_sqrt)^T, with L = chol(K(x,x)) (cf. gp.py:9-50).

    Typical usage:
    >>> gp = hb.gp.GP(hb.gp.kernels.UnitRBF())
    >>> u = hb.variationals.Normal(shape=[N, n])
    >>> samples = gp.samples(x, u)   # inside a traced objective
    """

    def __init__(self, kern):
        Parameterized.__init__(self)
        self.kern = kern

    def samples(self, x, u):
        """x: [n, d] coordinates; u: whitened variational sample [N, n].
        Returns posterior samples sized [N, n]."""
        L = self.kern.Cholesky(x)  # [n, n]
        return matmul_hp(u, jnp.swapaxes(L, -1, -2))

    def conditional_samples(self, x_new, x, u, q_shape="diagonal"):
        """Posterior samples at NEW points x_new [n*, d], conditioned through
        the whitened representation at the reference points x [n, d] — the
        prediction-at-new-inputs API the reference lacks (its notebooks only
        sample at training X). See :func:`whitened_conditional`."""
        return whitened_conditional(self.kern, x_new, x, u, q_shape)


class SparseGP(GP):
    """Sparse (inducing-point) approximation of the GP posterior
    (cf. gp.py:53-192). Posterior: N(Knm Lm^-T q_mu,
    (Knn - Knm Kmm^-1 Kmn) + (Knm Lm^-T q_sqrt)^2)."""

    def __init__(self, kern, z, collections=None, z_scale=None):
        """z: [m, d] np.array of initial inducing point locations.

        z_scale: optional free-space rescaling (`transforms.Scale`) so a
        TRAINABLE z moves ~lr * z_scale per Adam step instead of ~lr — the
        evidence families pass a spacing-derived scale under train_z=True
        (an unscaled z random-walks over its own inter-point spacing at
        typical learning rates; docs/PERF.md §train_z)."""
        GP.__init__(self, kern)
        collections = collections if collections is not None else [graph_key.VARIABLES]
        from ..transforms import Scale

        self.z = Variable(
            shape=z.shape,
            collections=collections,
            transform=None if z_scale is None else Scale(z_scale),
        )
        self.z = z  # deferred assign of the initial value
        self.m = len(z)

    def samples(self, x, u, q_shape="diagonal"):
        """x: [n, d] or batched [N, n, d]; u: whitened inducing values [N, m].
        q_shape: how to treat Knn - Knm Kmm^-1 Kmn
        ('diagonal' default / 'neglected' / 'fullrank')."""
        assert q_shape in ["diagonal", "neglected", "fullrank"]
        jitter = settings.numerics.jitter_level
        N = u.shape[0]
        ctx = _ctx.current()

        LnT = self._effective_LT(x)  # [m, n] or [N, m, n]
        if x.ndim == 2:
            samples = matmul_hp(u, LnT)  # [N, m] @ [m, n] -> [N, n]
        elif x.ndim == 3:
            # [N, 1, m] @ [N, m, n] -> [N, n]
            samples = jnp.squeeze(matmul_hp(u[:, None, :], LnT), -2)
        else:
            raise ValueError("x must be [n, d] or [N, n, d]")

        if q_shape == "neglected":
            return samples
        elif q_shape == "diagonal":
            diag_cov = self._additional_cov(x, LnT, "diagonal")
            noise = jax.random.normal(
                ctx.tagged_key("sparse_gp_diag"), x.shape[:-1], dtype=_float_type()
            )
            return samples + _safe_corr_std(diag_cov) * noise
        else:  # fullrank
            jitterI = eye(x.shape[-2]) * jitter
            chol = jnp.linalg.cholesky(
                self._additional_cov(x, LnT, "fullrank") + jitterI
            )
            if x.ndim == 2:
                noise = jax.random.normal(
                    ctx.tagged_key("sparse_gp_full"), (N, x.shape[0]),
                    dtype=_float_type(),
                )
                return samples + matmul_hp(noise, jnp.swapaxes(chol, -1, -2))
            # batched: [N, 1, n] @ [N, n, n]^T -> [N, n]
            noise = jax.random.normal(
                ctx.tagged_key("sparse_gp_full"), (N, 1, x.shape[1]),
                dtype=_float_type(),
            )
            return jnp.squeeze(
                matmul_hp(noise, jnp.swapaxes(chol, -1, -2)), -2
            ) + samples

    def _effective_LT(self, x):
        """Lm^-1 Kmn with Lm Lm^T = Kmm (cf. gp.py:146-174).
        x: [n, d] -> [m, n]; x: [N, n, d] -> [N, m, n]."""
        Lm = self.kern.Cholesky(self.z)  # [m, m]
        if x.ndim == 2:
            return tri_solve(Lm, self.kern.K(self.z, x))
        if x.ndim == 3:
            Lminv = tri_solve(Lm, eye(self.m))
            # broadcast z against the batch axis: [1,m,d] vs [N,n,d] -> [N,m,n]
            Kmn = self.kern.K(self.z[None, :, :], x)
            return matmul_hp(Lminv[None, :, :], Kmn)
        raise ValueError("shape is not specified for tensor x")

    def _additional_cov(self, x, LnT, q_shape):
        """Knn - Knm Kmm^-1 Kmn, diagonal or full (cf. gp.py:177-192)."""
        if q_shape == "diagonal":
            return self.kern.Kdiag(x) - jnp.sum(jnp.square(LnT), -2)
        Knn = self.kern.K(x)
        return Knn - matmul_hp(jnp.swapaxes(LnT, -1, -2), LnT)


def z_min_spacing(z):
    """Smallest positive pairwise Euclidean distance among inducing points
    (host-side numpy; used at setUp time to size the repulsion barrier).
    Returns 0.0 if every pair coincides."""
    z = np.asarray(z, np.float64)
    d2 = np.sum((z[:, None, :] - z[None, :, :]) ** 2, axis=-1)
    iu = np.triu_indices(len(z), k=1)
    vals = d2[iu]
    pos = vals[vals > 0]
    return float(np.sqrt(pos.min())) if pos.size else 0.0


def z_repulsion(z, d0, weight):
    """Inducing-point collision barrier: EXACTLY zero while every pairwise
    distance exceeds d0, growing like weight * (d0/d - 1)^2 -> infinity as a
    pair approaches coincidence.

    Why: evidence training of z (the reference trains z as a plain Variable,
    /root/reference/Henbun/gp/gp.py:86-97) drives neighboring inducing
    points into collision — measured on the multiclass evidence at n=1e5,
    m=128, Adam 0.05: min spacing 0.047 -> 5.6e-4 by step 115, Cholesky-
    gradient NaN at 119 (coincident z makes Kmm rank-deficient past any
    jitter rescue). A colliding pair adds no capacity, so an inverse-square
    hinge barrier costs nothing when inactive and halts any finite
    attraction at a spacing O(d0) (a log barrier's halt point scales
    linearly with the attraction strength instead — too soft). C^1 at the
    hinge; subtract from the evidence objective.

    z: [m, d]; d0: barrier onset distance (static float, typically half the
    init min spacing); weight: barrier scale (typically n_data — evidence
    gradients are O(n))."""
    m = z.shape[-2]
    d2 = jnp.sum((z[..., :, None, :] - z[..., None, :, :]) ** 2, axis=-1)
    # self-pairs: push beyond the hinge so they contribute exactly zero
    d2 = d2 + jnp.eye(m, dtype=z.dtype) * (4.0 * d0 * d0)
    # tiny floor keeps the sqrt gradient finite at an exactly-coincident
    # pair (the barrier value there is ~weight/tiny — effectively infinite)
    r = jnp.sqrt(d2 / (d0 * d0) + 1e-12)
    pen = jnp.square(jax.nn.relu(1.0 / r - 1.0))
    return 0.5 * weight * jnp.sum(pen)  # each pair appears twice
