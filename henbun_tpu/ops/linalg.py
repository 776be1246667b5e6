"""Numeric helper ops.

TPU-native replacements for the reference's TF wrapper layer
(`/root/reference/Henbun/tf_wraps.py:26-71`):

* ``eye``, ``clip``, ``log_sum_exp`` — thin jnp versions.
* ``vec_to_tri`` / ``tri_to_vec`` — the reference shipped these only as a
  *disabled* custom C++ TF op (`tf_wraps.py:50-71`, the ``.so`` is absent from
  the tree). Here they are first-class, implemented with static index maps so
  XLA lowers them to a single gather/scatter; they are differentiable for free
  and enable the ``LowerTriangular`` transform that the reference had to
  comment out (`transforms.py:182-269`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .._settings import settings


def eye(n, dtype=None):
    """Identity matrix at the configured float type (cf. tf_wraps.py:26-30)."""
    dtype = dtype or settings.dtypes.float_type
    return jnp.eye(n, dtype=dtype)


def clip(x):
    """Settings-gated value clipping to protect against over/underflow
    (cf. tf_wraps.py:33-39). A no-op unless ``settings.numerics.clip_by_value``."""
    if settings.numerics.clip_by_value:
        return jnp.clip(
            x,
            settings.numerics.clip_value_min,
            settings.numerics.clip_value_max,
        )
    return x


def log_sum_exp(x, axis=None):
    """Numerically stable log-sum-exp (cf. tf_wraps.py:42-48)."""
    return jax.scipy.special.logsumexp(x, axis=axis)


@functools.lru_cache(maxsize=None)
def _tril_indices(n):
    rows, cols = np.tril_indices(n)
    return rows.astype(np.int32), cols.astype(np.int32)


def vec_to_tri(vec, n=None):
    """Pack the last axis (length n(n+1)/2) into an [n, n] lower-triangular
    matrix, row-major over the triangle. Leading axes are preserved.

    The inverse of :func:`tri_to_vec`.
    """
    m = vec.shape[-1]
    if n is None:
        n = int((np.sqrt(8 * m + 1) - 1) / 2)
    if n * (n + 1) // 2 != m:
        raise ValueError("last axis %d is not a triangular number" % m)
    rows, cols = _tril_indices(n)
    out = jnp.zeros(vec.shape[:-1] + (n, n), dtype=vec.dtype)
    return out.at[..., rows, cols].set(vec)


def tri_to_vec(mat):
    """Extract the lower triangle of the trailing [n, n] axes into a vector,
    row-major. The inverse of :func:`vec_to_tri`."""
    n = mat.shape[-1]
    if mat.shape[-2] != n:
        raise ValueError("trailing axes must be square, got %r" % (mat.shape,))
    rows, cols = _tril_indices(n)
    return mat[..., rows, cols]


@functools.lru_cache(maxsize=None)
def _fill_triangular_layout(n):
    """Slot map of the fill-triangular packing: a probe vector 0..m-1 run
    through the concat/flip/reshape construction, giving at (i, j) the packed
    index stored there. Also returns the packed positions of the diagonal and
    the (row, col) slot of each packed index (for the inverse gather)."""
    m = n * (n + 1) // 2
    probe = np.arange(m)
    mat = np.concatenate([probe[n:], probe[::-1]]).reshape(n, n)
    rows, cols = np.tril_indices(n)
    vec_index_at_slot = mat[rows, cols]
    inv_rows = np.empty(m, np.int32)
    inv_cols = np.empty(m, np.int32)
    inv_rows[vec_index_at_slot] = rows
    inv_cols[vec_index_at_slot] = cols
    diag = mat[np.arange(n), np.arange(n)].astype(np.int32)
    return diag, inv_rows, inv_cols


def fill_triangular_diag_indices(n):
    """Packed positions of the diagonal under the fill-triangular layout."""
    return _fill_triangular_layout(n)[0]


def fill_triangular(vec, n=None):
    """Pack the last axis (length n(n+1)/2) into an [n, n] lower-triangular
    matrix — scatter-free, so it is MXU/VPU-cheap on TPU.

    Uses the fill-triangular construction (concat the tail with the reversed
    vector, reshape, mask): pure data movement, no gather or scatter in either
    the forward or the backward pass. Measured on a v5e at n=1024 this is
    ~65x faster than the row-major scatter of :func:`vec_to_tri` inside a
    grad-of-matmul step (`benchmarks/packed_bench.py`). The entry ORDER within
    the triangle differs from :func:`vec_to_tri`'s row-major contract; use
    :func:`fill_triangular_inverse` / :func:`fill_triangular_diag_indices` to
    address entries. Leading axes are preserved.
    """
    m = vec.shape[-1]
    if n is None:
        n = int((np.sqrt(8 * m + 1) - 1) / 2)
    if n * (n + 1) // 2 != m:
        raise ValueError("last axis %d is not a triangular number" % m)
    x = jnp.concatenate([vec[..., n:], jnp.flip(vec, axis=-1)], axis=-1)
    x = jnp.reshape(x, vec.shape[:-1] + (n, n))
    return jnp.tril(x)


def fill_triangular_inverse(mat):
    """Packed vector such that ``fill_triangular(vec) == tril(mat)``.

    Gather-based (its gradient is a scatter-add) — meant for initialization
    and checkpoint import, not for per-step compute paths."""
    n = mat.shape[-1]
    if mat.shape[-2] != n:
        raise ValueError("trailing axes must be square, got %r" % (mat.shape,))
    _, rows, cols = _fill_triangular_layout(n)
    return mat[..., rows, cols]


@jax.custom_batching.custom_vmap
def _cholesky_dispatch(A):
    """Factorization primitive behind safe_cholesky: single matrices use
    XLA's Cholesky (measured at the latency floor for n <= 128,
    docs/PERF.md); BATCHED calls — i.e. this function under vmap, which is
    what a BatchedOptimizer trace produces — dispatch to the Pallas
    vectorized-batch kernel when `[tpu] use_pallas` is on (measured 2.1-2.6x
    faster than XLA's batched factorization at B=16, n=40-128 on v5e).

    Large SINGLE matrices deliberately stay on XLA: a blocked
    right-looking alternative (`ops/blocked.py`, Pallas panel solves + MXU
    Schur updates) was built and measured in round 5 — its chol ratio vs
    XLA scattered 0.73x-1.45x across v5e sessions at n=4096 and the
    end-to-end exact-gram evidence step never beat the XLA path, so the
    dispatch was KILLED (docs/PERF.md §Roofline has the full numbers; the
    module and its tests remain for future attempts)."""
    return jnp.linalg.cholesky(A)


@_cholesky_dispatch.def_vmap
def _cholesky_dispatch_vmap(axis_size, in_batched, A):
    (a_batched,) = in_batched
    use_pallas = (
        a_batched
        and bool(settings.tpu.use_pallas)
        and A.ndim == 3
        and A.dtype == jnp.float32
        and A.shape[-1] <= 128
        and axis_size * 128 * 128 * 4 * 2 <= 12 * 2**20
        and jax.devices()[0].platform == "tpu"
    )
    if use_pallas:
        from .pallas_chol import cholesky128_vbatched

        return cholesky128_vbatched(A), True
    return jnp.linalg.cholesky(A), a_batched


@jax.custom_batching.custom_vmap
def _tri_solve_T_dispatch(L, B):
    """X with L^T X = B (L lower triangular) — the solve shape reverse-mode
    Cholesky gradients produce, twice per factorization. Single systems use
    XLA's triangular_solve; BATCHED calls (a BatchedOptimizer trace, or a
    vmapped model) dispatch to the Pallas vectorized-batch back-substitution
    kernel when `[tpu] use_pallas` is on (measured 3.2-4.4x faster than
    XLA's batched solve at B=16, n=40-128 on v5e; benchmarks/solve_bench.py).
    """
    return jax.scipy.linalg.solve_triangular(L, B, lower=True, trans=1)


def _solve_vmap_rule(axis_size, in_batched, L, B, transpose):
    """Shared batching rule for the solve dispatches: broadcast any unbatched
    operand, then take the Pallas vectorized-batch kernel when eligible."""
    l_batched, b_batched = in_batched
    if not l_batched:
        L = jnp.broadcast_to(L[None], (axis_size,) + L.shape)
    if not b_batched:
        B = jnp.broadcast_to(B[None], (axis_size,) + B.shape)
    use_pallas = (
        bool(settings.tpu.use_pallas)
        and L.ndim == 3
        and L.dtype == jnp.float32
        and L.shape[-1] <= 128
        and B.shape[-1] <= 128
        and axis_size * 128 * 128 * 4 * 3 <= 12 * 2**20
        and jax.devices()[0].platform == "tpu"
    )
    if use_pallas:
        from .pallas_solve import tri_solve128_vbatched

        return tri_solve128_vbatched(L, B, transpose=transpose), True
    return (
        jax.scipy.linalg.solve_triangular(
            L, B, lower=True, trans=1 if transpose else 0
        ),
        True,
    )


@_tri_solve_T_dispatch.def_vmap
def _tri_solve_T_dispatch_vmap(axis_size, in_batched, L, B):
    return _solve_vmap_rule(axis_size, in_batched, L, B, True)


@jax.custom_batching.custom_vmap
def _tri_solve_L_dispatch(L, B):
    """X with L X = B (forward substitution) — same dispatch contract as
    `_tri_solve_T_dispatch` with the non-transposed kernel."""
    return jax.scipy.linalg.solve_triangular(L, B, lower=True)


@_tri_solve_L_dispatch.def_vmap
def _tri_solve_L_dispatch_vmap(axis_size, in_batched, L, B):
    return _solve_vmap_rule(axis_size, in_batched, L, B, False)


@jax.custom_vjp
def tri_solve(L, B):
    """X = L^-1 B for lower-triangular L — the library-wide solve.

    Reads only L's lower triangle. Under vmap with `[tpu] use_pallas` on,
    both the forward solve and the two solves of its gradient take the
    Pallas vectorized-batch kernels (3.2-4.4x over XLA's batched solve,
    benchmarks/solve_bench.py) — this is what makes batched SVGP / natgrad /
    GP-prediction traces fast, not just the Cholesky itself. Reverse-mode
    only, like `safe_cholesky` (nothing in the library forward-differentiates
    a solve)."""
    return _tri_solve_L_dispatch(L, B)


def _tri_solve_fwd(L, B):
    X = _tri_solve_L_dispatch(L, B)
    return X, (L, X)


def _tri_solve_bwd(res, Xbar):
    """Bbar = L^-T Xbar; Lbar = -tril(Bbar X^T) (the solve reads only the
    lower triangle, so the cotangent lands only there — matching XLA's
    triangular_solve gradient)."""
    L, X = res
    Bbar = _tri_solve_T_dispatch(L, Xbar)
    Lbar = -jnp.tril(matmul_hp(Bbar, jnp.swapaxes(X, -1, -2)))
    return Lbar, Bbar


tri_solve.defvjp(_tri_solve_fwd, _tri_solve_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def safe_cholesky(A, jitter=None):
    """Lower Cholesky of A + jitter*I with NaN-retry jitter escalation.

    float32 on TPU loses enough digits on ill-conditioned RBF gram matrices
    that `cholesky` can produce NaN mid-optimization (e.g. when a lengthscale
    drifts large and K approaches rank one). A NaN factor poisons the whole
    training state through one Adam step. Escalate jitter x100 (twice) when
    the factorization fails.

    The escalation is a masked `lax.while_loop` (zero iterations on the
    common path) hidden behind a custom differentiation rule — the earlier
    `lax.cond` retry chain lowered to `select` under `vmap`, making every
    BatchedOptimizer step pay all three factorizations AND their gradients
    for every model; the custom rule differentiates only the ONE factor that
    was returned. Reverse-mode only (custom_vjp): the hand-written backward
    lets batched traces route both L^T solves through the Pallas kernel
    (`_tri_solve_T_dispatch`); nothing in the library forward-differentiates
    through a factorization.
    """
    if jitter is None:
        jitter = settings.numerics.jitter_level
    n = A.shape[-1]
    I = jnp.eye(n, dtype=A.dtype)
    L0 = _cholesky_dispatch(A + jitter * I)

    def cond(carry):
        L, j, t = carry
        return jnp.any(jnp.isnan(L)) & (t < 2)

    def body(carry):
        L, j, t = carry
        j = j * 100.0
        L2 = _cholesky_dispatch(A + j * I)
        # keep an already-good factor (per-element under vmap)
        L = jnp.where(jnp.any(jnp.isnan(L)), L2, L)
        return (L, j, t + 1)

    L, _, _ = jax.lax.while_loop(
        cond, body, (L0, jnp.asarray(jitter, A.dtype), jnp.zeros((), jnp.int32))
    )
    return L


def _safe_cholesky_fwd(A, jitter):
    L = safe_cholesky(A, jitter)
    return L, L


def _safe_cholesky_bwd(jitter, L, Lbar):
    """Abar = 0.5 (S + S^T), S = L^-T (c ∘ (L^T Lbar)) L^-1 with c = lower
    mask, diagonal halved (Murray 2016) — the exact transpose of the tangent
    map dL = L phi(L^-1 dA_sym L^-T) the previous custom JVP used, so
    gradients are bitwise-identical to round 2's on the XLA path. The
    strictly-upper part of Lbar is ignored automatically (L^T Lbar's lower
    triangle only reads Lbar's lower triangle); the escalated jitter adds c*I
    whose cotangent contribution is zero."""
    n = L.shape[-1]
    c = jnp.tril(jnp.ones((n, n), L.dtype)) - 0.5 * jnp.eye(n, dtype=L.dtype)
    Y = c * matmul_hp(jnp.swapaxes(L, -1, -2), Lbar)
    Z = _tri_solve_T_dispatch(L, Y)  # L^-T Y
    W = _tri_solve_T_dispatch(L, jnp.swapaxes(Z, -1, -2))  # S^T = L^-T Z^T
    Abar = 0.5 * (W + jnp.swapaxes(W, -1, -2))
    return (Abar,)


safe_cholesky.defvjp(_safe_cholesky_fwd, _safe_cholesky_bwd)


def matmul_hp(a, b, **kwargs):
    """Matmul pinned to the configured MXU precision.

    TPU matmuls default to bfloat16 accumulation passes; kernels feeding a
    Cholesky need full float32 precision or the factorization loses digits.
    """
    prec = settings.tpu.matmul_precision
    return jnp.matmul(a, b, precision=prec, **kwargs)
