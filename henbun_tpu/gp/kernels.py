"""GP kernels.

Parity with `/root/reference/Henbun/gp/kernels.py:28-131`: ``Kern``,
``UnitStationary`` (trainable positive lengthscales, batched square/euclid
distances, jittered Cholesky), ``UnitRBF``, ``UnitCsymRBF``.

TPU notes: the kernel matrix is built from one batched matmul pinned to
float32 MXU precision (``matmul_hp``) — bf16 accumulation upstream of a
Cholesky loses enough digits to break the factorization at float32. Batched
[N, n, d] inputs map to a single batched matmul, replacing the reference's
expand/tile dance.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import transforms
from .._settings import settings
from ..core.param import Variable, Parameterized, ParamList, graph_key
from ..variationals import Variational
from ..ops.linalg import eye, matmul_hp, safe_cholesky


def _float_type():
    return settings.dtypes.float_type


class Kern(Parameterized):
    """The basic kernel class; K and Kdiag run under named scopes.

    active_dims: optional static sequence of input-column indices this
    kernel sees (None = all). The `Add`/`Prod` combinators plus per-term
    active_dims express additive/ANOVA structure over feature subsets —
    e.g. ``Add([UnitRBF(active_dims=[0]), UnitLinear(active_dims=[1])])``.
    (No reference counterpart; GPflow-lineage convention.)"""

    def __init__(self, active_dims=None):
        Parameterized.__init__(self)
        self.scoped_keys.extend(["K", "Kdiag", "Cholesky"])
        self._active_dims = (
            None if active_dims is None else tuple(int(i) for i in active_dims)
        )

    def _slice(self, X):
        if self._active_dims is None or X is None:
            return X
        return jnp.take(X, jnp.asarray(self._active_dims), axis=-1)

    def Cholesky(self, X):
        """Lower Cholesky factor of K(X) + jitter*I; batched if X is
        [N, n, d] (cf. kernels.py:93-101). Uses the NaN-retry escalating
        jitter of :func:`safe_cholesky`, with the base jitter scaled by the
        matrix size: float32 factorization error grows with n, and the
        *gradient* NaNs before the forward pass does (n=512 RBF grams
        diverge at flat 1e-4; the reference itself needed 3e-4 at n=150,
        Expert_GPR.ipynb cells 11-14 — this scale reproduces that choice)."""
        n = X.shape[-2]
        jitter = settings.numerics.jitter_level * max(1.0, n / 96.0)
        return safe_cholesky(self.K(X), jitter)


class UnitStationary(Kern):
    def __init__(self, lengthscales=np.ones(1), n_batch=None, collections=None,
                 active_dims=None):
        """lengthscales: scalar/1d np.array initial value, or an existing
        Variable/Variational node (cf. kernels.py:37-51). With active_dims,
        lengthscales apply to the SLICED columns."""
        Kern.__init__(self, active_dims)
        collections = collections if collections is not None else [graph_key.VARIABLES]
        if isinstance(lengthscales, np.ndarray):
            self.lengthscales = Variable(
                lengthscales.shape,
                transform=transforms.positive,
                collections=collections,
            )
            self.lengthscales = lengthscales  # deferred assign of initial values
        elif isinstance(lengthscales, (Variable, Variational)):
            self.lengthscales = lengthscales
        else:
            raise TypeError
        self.scoped_keys.extend(["square_dist", "euclid_dist"])

    def square_dist(self, X, X2=None):
        """Squared distance matrix in lengthscale units.

        X: [n, d] (returns [n, n2]) or batched [N, n, d] (returns [N, n, n2]),
        cf. kernels.py:54-84. One batched matmul; float32 MXU precision.
        """
        X, X2 = self._slice(X), self._slice(X2)
        Xeff = X / self.lengthscales
        Xs = jnp.sum(jnp.square(Xeff), -1)
        if X2 is None:
            return (
                -2 * matmul_hp(Xeff, jnp.swapaxes(Xeff, -1, -2))
                + Xs[..., :, None]
                + Xs[..., None, :]
            )
        X2eff = X2 / self.lengthscales
        X2s = jnp.sum(jnp.square(X2eff), -1)
        return (
            -2 * matmul_hp(Xeff, jnp.swapaxes(X2eff, -1, -2))
            + Xs[..., :, None]
            + X2s[..., None, :]
        )

    def euclid_dist(self, X, X2):
        # matmul-form square distances cancel catastrophically near zero and
        # can come out slightly NEGATIVE on the diagonal — unclamped, the
        # sqrt NaNs the whole gram; the epsilon keeps the gradient finite at
        # exactly zero
        r2 = self.square_dist(X, X2)
        return jnp.sqrt(jnp.maximum(r2, 0.0) + 1e-12)

    def Kdiag(self, X):
        return jnp.ones(X.shape[:-1], dtype=_float_type())


class UnitRBF(UnitStationary):
    """Unit-variance RBF: K(x,x2) = exp(-(x-x2)^2 / (2 l^2))."""

    def K(self, X, X2=None):
        return jnp.exp(-self.square_dist(X, X2) / 2)


class UnitMatern12(UnitStationary):
    """Unit-variance Matern-1/2 (exponential / Ornstein-Uhlenbeck):
    K = exp(-r), r the lengthscale-scaled euclidean distance. No reference
    counterpart (the reference ships only RBF variants); unit-variance
    convention matches — scale externally like the notebooks' k_var."""

    def K(self, X, X2=None):
        return jnp.exp(-self.euclid_dist(X, X2))


class UnitMatern32(UnitStationary):
    """Unit-variance Matern-3/2: K = (1 + sqrt(3) r) exp(-sqrt(3) r)."""

    def K(self, X, X2=None):
        r = self.euclid_dist(X, X2) * np.sqrt(3.0)
        return (1.0 + r) * jnp.exp(-r)


class UnitMatern52(UnitStationary):
    """Unit-variance Matern-5/2: K = (1 + sqrt(5) r + 5 r^2/3) exp(-sqrt(5) r)."""

    def K(self, X, X2=None):
        r = self.euclid_dist(X, X2) * np.sqrt(5.0)
        return (1.0 + r + jnp.square(r) / 3.0) * jnp.exp(-r)


class UnitPeriodic(UnitStationary):
    """Unit-variance periodic kernel (MacKay):
    K = exp(-0.5 * sum_d (2 sin(pi (x_d - x2_d) / period) / l_d)^2).

    Builds the pairwise difference tensor [.., n, n2, d] — elementwise, not a
    matmul, so it is VPU/HBM-bound; fine at GP-scale n. `period` is a
    trainable positive scalar."""

    def __init__(self, lengthscales=np.ones(1), period=1.0, n_batch=None,
                 collections=None, active_dims=None):
        UnitStationary.__init__(self, lengthscales, n_batch, collections,
                                active_dims)
        cols = collections if collections is not None else [graph_key.VARIABLES]
        self.period = Variable(
            [1], transform=transforms.positive, collections=cols
        )
        self.period = np.asarray([period], dtype=np.float64)

    def K(self, X, X2=None):
        X = self._slice(X)
        X2 = X if X2 is None else self._slice(X2)
        d = X[..., :, None, :] - X2[..., None, :, :]
        s = 2.0 * jnp.sin(np.pi * d / self.period) / self.lengthscales
        return jnp.exp(-0.5 * jnp.sum(jnp.square(s), -1))


class UnitLinear(Kern):
    """Dot-product kernel K = (X/l) (X2/l)^T — non-stationary, so Kdiag is
    the row norm, not 1. `lengthscales` plays the per-dimension inverse
    weight role."""

    def __init__(self, lengthscales=np.ones(1), collections=None,
                 active_dims=None):
        Kern.__init__(self, active_dims)
        cols = collections if collections is not None else [graph_key.VARIABLES]
        if isinstance(lengthscales, np.ndarray):
            self.lengthscales = Variable(
                lengthscales.shape, transform=transforms.positive,
                collections=cols,
            )
            self.lengthscales = lengthscales
        elif isinstance(lengthscales, (Variable, Variational)):
            self.lengthscales = lengthscales
        else:
            raise TypeError

    def K(self, X, X2=None):
        Xeff = self._slice(X) / self.lengthscales
        X2eff = (
            Xeff if X2 is None else self._slice(X2) / self.lengthscales
        )
        return matmul_hp(Xeff, jnp.swapaxes(X2eff, -1, -2))

    def Kdiag(self, X):
        return jnp.sum(jnp.square(self._slice(X) / self.lengthscales), -1)


class Combination(Kern):
    """Base for kernel arithmetic; children live in a ParamList so each
    summand's parameters stay independently trainable and checkpointable."""

    def __init__(self, kern_list):
        Kern.__init__(self)
        self.kern_list = ParamList(list(kern_list))

    def _terms(self, X, X2):
        return [self.kern_list[i].K(X, X2) for i in range(len(self.kern_list))]

    def _diag_terms(self, X):
        return [self.kern_list[i].Kdiag(X) for i in range(len(self.kern_list))]


class Add(Combination):
    """K = sum of child kernels."""

    def K(self, X, X2=None):
        return sum(self._terms(X, X2))

    def Kdiag(self, X):
        return sum(self._diag_terms(X))


class Prod(Combination):
    """K = elementwise product of child kernels."""

    def K(self, X, X2=None):
        out = None
        for t in self._terms(X, X2):
            out = t if out is None else out * t
        return out

    def Kdiag(self, X):
        out = None
        for t in self._diag_terms(X):
            out = t if out is None else out * t
        return out


class UnitCsymRBF(UnitStationary):
    """Cylindrically-symmetric RBF: K(x,x2) = rbf(x,x2) + rbf(x,-x2),
    correlating points across the x=0 axis (cf. kernels.py:113-131)."""

    def K(self, X, X2=None):
        if X2 is None:
            X2 = X
        return jnp.exp(-self.square_dist(X, X2) / 2) + jnp.exp(
            -self.square_dist(X, -X2) / 2
        )

    def Kdiag(self, X):
        Xeff = self._slice(X) / self.lengthscales
        Xs = jnp.sum(jnp.square(Xeff), -1)
        return jnp.ones_like(Xs) + jnp.exp(-2 * Xs)
