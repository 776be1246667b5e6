"""Blocked Cholesky / triangular solve for LARGE single matrices (n >= ~2k).

The exact-gram evidence paths (`GPRMarginal`, `GPC`, dense Laplace/EP) are
the library's one compute-bound family: their cost center is one [n, n]
factorization plus the two [n, n]-RHS triangular solves reverse mode puts in
the Cholesky backward (the reference's cost center too — one `tf.cholesky`,
`/root/reference/Henbun/gp/kernels.py:93-101`). XLA's own Cholesky/trsm on
TPU pay a generic while-loop + dynamic-slice panel pipeline at percent-level
MFU (docs/PERF.md §Roofline) while the trailing updates are pure MXU work.

Blocked right-looking algorithms with the O(n^3) terms as XLA matmuls and
the serial substitution confined to the Pallas vectorized-batch solve
(`pallas_solve.tri_solve128_vbatched` — RHS column blocks ride the batch
axis, one in-VMEM chain per 128-panel; the alternative single-block
wide-RHS kernels in `ops/pallas_wide.py` measured slower, see
`_diag_solve`):

* `blocked_cholesky` — right-looking; the SYMMETRY of the input provides
  the panel right-hand side A21^T for free as the row slice
  T[:128, 128:] of the trailing matrix, and each trailing Schur update is
  one MXU matmul on the shrinking remainder (see the function docstring
  for the measured layout verdicts).
* `blocked_tri_solve` — forward (L X = B) or transposed (L^T X = B)
  substitution over 128-row blocks: wide-RHS diagonal solves + one MXU
  GEMM correction per step. The transposed variant hoists ONE full
  transpose of L outside the loop (per-step transposes measured 2x slower
  than XLA's trsm).

Static Python loops over blocks (n is static under jit), float32, TPU; on
CPU (the test mesh) the panel solves fall back to XLA's solve_triangular so
the same code path is testable everywhere.

STATUS: a measured EXPERIMENT, not a dispatch — `safe_cholesky` was
briefly routed here for n >= 2048 and reverted the same round: the chol
speedup vs XLA scattered 0.73x-1.45x across v5e sessions and the
end-to-end exact-gram evidence step never won (full numbers in
docs/PERF.md §Roofline's kill verdict). Kept with its tests for future
attempts; call directly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .._settings import settings

_NB = 128


def _use_pallas_panels():
    return (
        bool(settings.tpu.use_pallas)
        and jax.devices()[0].platform == "tpu"
    )


def _matmul(a, b):
    return jnp.matmul(a, b, precision=settings.tpu.matmul_precision)


def _diag_solve(L128, Bwide, transpose):
    """X [128, m] with L128 X = Bwide (or L128^T X = Bwide) for a LOWER
    [128, 128] factor. On TPU the m columns chunk into 128-wide blocks that
    ride the Pallas vectorized-batch solve as its batch axis — one in-VMEM
    substitution chain for the whole panel. (A dedicated wide-RHS kernel
    keeping all m columns in one [128, m] block was ALSO built and measured
    (`ops/pallas_wide.py`): a wash at n<=2048 and 2x SLOWER at n=4096 than
    this chunked layout — Mosaic handles the [B, 8, 128] batch tiles better
    than 8 x m lane rows; docs/PERF.md §Roofline.) Elsewhere XLA."""
    m = Bwide.shape[-1]
    if _use_pallas_panels() and m % _NB == 0 and 0 < m // _NB <= 64:
        from .pallas_solve import tri_solve128_vbatched

        nc = m // _NB
        chunks = jnp.swapaxes(Bwide.reshape(_NB, nc, _NB), 0, 1)
        Lb = jnp.broadcast_to(L128[None], (nc, _NB, _NB))
        X = tri_solve128_vbatched(Lb, chunks, transpose=transpose)
        return jnp.swapaxes(X, 0, 1).reshape(_NB, m)
    return jax.scipy.linalg.solve_triangular(
        L128, Bwide, lower=True, trans=1 if transpose else 0
    )


def blocked_cholesky(A):
    """Lower Cholesky of a single [n, n] SPD float32 matrix (n a multiple
    of 128; the dispatch call sites guarantee it or fall back to XLA). NaN
    propagates from a failed diagonal block exactly like
    `jnp.linalg.cholesky`, so `safe_cholesky`'s escalation composes.

    Structure notes (both alternatives measured on v5e, docs/PERF.md
    §Roofline): the panel right-hand side A21^T reads as the ROW slice
    T[:128, 128:] of the symmetric trailing matrix (free — no transpose);
    the Schur update is a plain [R, 128] @ [128, R] matmul after one
    explicit panel transpose, and the factor assembles column-block-wise.
    An 'upper-world' variant that avoided the per-panel transpose by
    contracting dim 0 of the [128, R] panel with itself and assembling U
    rows measured 1.8x SLOWER at n=4096 (the contract-dim-0 dot_general /
    row assembly lower badly); don't switch it back."""
    n = A.shape[-1]
    nblk = n // _NB
    T = A
    cols = []
    for j in range(nblk):
        j0 = j * _NB
        Ljj = jnp.linalg.cholesky(T[:_NB, :_NB])
        if j < nblk - 1:
            # symmetry: A21^T is the row slice T[:128, 128:]
            L21T = _diag_solve(Ljj, T[:_NB, _NB:], False)  # [128, R]
            L21 = jnp.swapaxes(L21T, -1, -2)  # [R, 128]
            T = T[_NB:, _NB:] - _matmul(L21, L21T)
            col = jnp.concatenate(
                [jnp.zeros((j0, _NB), A.dtype), Ljj, L21], axis=0
            )
        else:
            col = jnp.concatenate(
                [jnp.zeros((j0, _NB), A.dtype), Ljj], axis=0
            )
        cols.append(col)
    return jnp.concatenate(cols, axis=1)


def blocked_tri_solve(L, B, transpose=False):
    """X with L X = B (or L^T X = B) for a single lower-triangular [n, n]
    float32 L and [n, m] B; n a multiple of 128. One Pallas wide-RHS
    diagonal solve + one MXU GEMM correction per 128-row block."""
    n = L.shape[-1]
    nblk = n // _NB
    outs = [None] * nblk
    if not transpose:
        Bcur = B
        for j in range(nblk):
            j0, j1 = j * _NB, (j + 1) * _NB
            Xj = _diag_solve(L[j0:j1, j0:j1], Bcur[:_NB], False)
            outs[j] = Xj
            if j < nblk - 1:
                Bcur = Bcur[_NB:] - _matmul(L[j1:, j0:j1], Xj)
    else:
        # hoist the ONE transpose; all per-step reads are then natural
        # row/column slices of the upper factor
        UT = jnp.swapaxes(L, -1, -2)
        Bcur = B
        for j in range(nblk - 1, -1, -1):
            j0, j1 = j * _NB, (j + 1) * _NB
            Xj = _diag_solve(L[j0:j1, j0:j1], Bcur[j0:], True)
            outs[j] = Xj
            if j > 0:
                Bcur = Bcur[:j0] - _matmul(UT[:j0, j0:j1], Xj)
    return jnp.concatenate(outs, axis=0)
