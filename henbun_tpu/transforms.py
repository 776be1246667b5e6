"""Bijective transforms mapping free (unconstrained) space to variable space.

Capability parity with `/root/reference/Henbun/transforms.py:27-271`: each
transform provides ``forward``/``backward`` (host/numpy), ``tf_forward`` —
kept under its reference name but implemented with jnp so it traces under jit —
and a hand-written ``tf_log_jacobian``.

Additions over the reference:
  * ``LowerTriangular`` is live (the reference's version was commented out
    because it needed a missing C++ op, `transforms.py:182-269`); ours uses the
    native :func:`henbun_tpu.ops.linalg.vec_to_tri` gather.
  * ``forward``/``backward`` accept jnp arrays as well as numpy.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ._settings import settings, np_float
from .ops import linalg


def _float_type():
    """The configured float dtype, canonicalized for the ACTIVE jax config:
    requesting float64 zeros under the default x64-disabled runtime emits a
    truncation UserWarning on every trace — canonicalize first so the dtype
    we ask for is the dtype we can get."""
    import jax

    return jax.dtypes.canonicalize_dtype(settings.dtypes.float_type)


class Transform:
    def forward(self, x):
        """Map from the free-space to the variable space (host-side)."""
        raise NotImplementedError

    def backward(self, y):
        """Map from the variable-space to the free space (host-side)."""
        raise NotImplementedError

    def tf_forward(self, x):
        """Map from the free-space to the variable space, traced (jnp)."""
        raise NotImplementedError

    def tf_log_jacobian(self, x):
        """log|det d tf_forward(x) / dx| as a scalar sum over elements."""
        raise NotImplementedError

    def free_state_size(self, variable_shape):
        return int(np.prod(variable_shape))

    def __str__(self):
        raise NotImplementedError


class Identity(Transform):
    def tf_forward(self, x):
        return jnp.asarray(x)

    def forward(self, x):
        return x

    def backward(self, y):
        return y

    def tf_log_jacobian(self, x):
        return jnp.zeros((1,), _float_type())

    def __str__(self):
        return "(none)"


class Exp(Transform):
    def __init__(self, lower=1e-6):
        self._lower = lower

    def tf_forward(self, x):
        return jnp.exp(x) + self._lower

    def forward(self, x):
        return np.exp(x) + self._lower

    def backward(self, y):
        return np.log(y - self._lower)

    def tf_log_jacobian(self, x):
        return jnp.sum(x)

    def __str__(self):
        return "+ve"


class Log1pe(Transform):
    """Softplus: y = log(1 + exp(x)) + lower. Alias ``positive``."""

    def __init__(self, lower=1e-6):
        self._lower = lower

    def forward(self, x):
        # overflow-safe softplus on host
        return np.logaddexp(0.0, x) + self._lower

    def tf_forward(self, x):
        return jnp.logaddexp(0.0, x) + self._lower

    def tf_log_jacobian(self, x):
        # d/dx softplus = sigmoid(x); log sigmoid(x) = -softplus(-x)
        return -jnp.sum(jnp.logaddexp(0.0, -x))

    def backward(self, y):
        # inverse softplus, stable for large y
        ys = np.maximum(y - self._lower, 1e-12)
        return ys + np.log(-np.expm1(-ys))

    def __str__(self):
        return "+ve"


class Logistic(Transform):
    def __init__(self, a=0.0, b=1.0):
        Transform.__init__(self)
        assert b > a
        self.a, self.b = a, b

    def tf_forward(self, x):
        ex = jnp.exp(-x)
        return self.a + (self.b - self.a) / (1.0 + ex)

    def forward(self, x):
        ex = np.exp(-x)
        return self.a + (self.b - self.a) / (1.0 + ex)

    def backward(self, y):
        return -np.log((self.b - self.a) / (y - self.a) - 1.0)

    def tf_log_jacobian(self, x):
        return jnp.sum(x - 2.0 * jnp.logaddexp(0.0, x) + np.log(self.b - self.a))

    def __str__(self):
        return "[" + str(self.a) + ", " + str(self.b) + "]"


class Scale(Transform):
    """y = a * x: a fixed linear rescaling of the free space.

    Used to give a parameter an EFFECTIVE learning-rate under adaptive
    optimizers: Adam moves every free coordinate ~lr per step regardless of
    gradient magnitude, so a parameter whose natural length scale is much
    smaller than its siblings' (inducing-point locations vs kernel
    log-hyperparameters — z spacings are ~0.04 while lr is ~0.05) random-
    walks destructively. Scale(a) makes one optimizer step move y by
    lr * a instead of lr. Measured motivation in docs/PERF.md §train_z."""

    def __init__(self, a):
        self.a = float(a)
        assert self.a > 0

    def forward(self, x):
        return np.asarray(x) * self.a

    def backward(self, y):
        return np.asarray(y) / self.a

    def tf_forward(self, x):
        return x * self.a

    def tf_log_jacobian(self, x):
        return jnp.full((1,), x.size * np.log(self.a), _float_type())

    def __str__(self):
        return "*%g" % self.a


class LowerTriangular(Transform):
    """Free vector of length n(n+1)/2 <-> [n, n] lower-triangular matrix.

    Live replacement for the reference's disabled C++-backed version
    (`transforms.py:182-269`); volume-preserving on the triangle, so the log
    Jacobian is zero.
    """

    def __init__(self, n):
        self.n = int(n)

    def free_state_size(self, variable_shape):
        return self.n * (self.n + 1) // 2

    def forward(self, x):
        return np.asarray(linalg.vec_to_tri(jnp.asarray(x), self.n))

    def backward(self, y):
        return np.asarray(linalg.tri_to_vec(jnp.asarray(y)))

    def tf_forward(self, x):
        return linalg.vec_to_tri(x, self.n)

    def tf_log_jacobian(self, x):
        return jnp.zeros((1,), _float_type())

    def __str__(self):
        return "LoTri->vec"


positive = Log1pe()
