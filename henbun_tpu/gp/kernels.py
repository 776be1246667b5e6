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
from ..core.param import Variable, Parameterized, graph_key
from ..variationals import Variational
from ..ops.linalg import eye, matmul_hp, safe_cholesky


def _float_type():
    return settings.dtypes.float_type


class Kern(Parameterized):
    """The basic kernel class; K and Kdiag run under named scopes."""

    def __init__(self):
        Parameterized.__init__(self)
        self.scoped_keys.extend(["K", "Kdiag"])


class UnitStationary(Kern):
    def __init__(self, lengthscales=np.ones(1), n_batch=None, collections=None):
        """lengthscales: scalar/1d np.array initial value, or an existing
        Variable/Variational node (cf. kernels.py:37-51)."""
        Kern.__init__(self)
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
        self.scoped_keys.extend(["square_dist", "euclid_dist", "Cholesky"])

    def square_dist(self, X, X2=None):
        """Squared distance matrix in lengthscale units.

        X: [n, d] (returns [n, n2]) or batched [N, n, d] (returns [N, n, n2]),
        cf. kernels.py:54-84. One batched matmul; float32 MXU precision.
        """
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
        r2 = self.square_dist(X, X2)
        return jnp.sqrt(r2 + 1e-12)

    def Kdiag(self, X):
        return jnp.ones(X.shape[:-1], dtype=_float_type())

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


class UnitRBF(UnitStationary):
    """Unit-variance RBF: K(x,x2) = exp(-(x-x2)^2 / (2 l^2))."""

    def K(self, X, X2=None):
        return jnp.exp(-self.square_dist(X, X2) / 2)


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
        Xeff = X / self.lengthscales
        Xs = jnp.sum(jnp.square(Xeff), -1)
        return jnp.ones_like(Xs) + jnp.exp(-2 * Xs)
