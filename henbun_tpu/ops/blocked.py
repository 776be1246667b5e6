"""Blocked Cholesky / triangular solve for LARGE single matrices (n >= ~1k).

The exact-gram evidence paths (`GPRMarginal`, `GPC`, dense Laplace/EP) are
the library's one compute-bound family: their cost center is one [n, n]
factorization plus the two [n, n]-RHS triangular solves reverse mode puts in
the Cholesky backward (the reference's cost center too — one `tf.cholesky`,
`/root/reference/Henbun/gp/kernels.py:93-101`). XLA's own Cholesky/trsm on
TPU pay a generic while-loop + dynamic-slice panel pipeline; measured on v5e
(docs/PERF.md §Roofline): chol 2.5 TF/s at n=2048, trsm 8.6 TF/s — percent-
level MFU while the trailing updates are pure MXU work.

The blocked algorithms here put every O(n^3) term into plain XLA matmuls
(MXU at the measured 150 TF/s peak) and confine the serial substitution
chains to 128-wide panels handled by the Pallas vectorized-batch kernels
(`pallas_solve.tri_solve128_vbatched` — the RHS column blocks BECOME the
batch axis, so one kernel invocation runs the whole panel's substitution
chain once for all columns):

* `blocked_cholesky` — right-looking: XLA cholesky on the 128 diagonal
  block (latency-floor at that size), Pallas wide-RHS panel solve, one MXU
  syrk per step for the trailing update. The trailing matrix SHRINKS each
  step (no full-size scatter updates — measured to cost ~20% when the
  update wrote into the full [n, n] buffer instead).
* `blocked_tri_solve` — forward (L X = B) or transposed (L^T X = B)
  substitution over 128-row blocks: Pallas diagonal solves + one MXU GEMM
  correction per step on the shrinking remainder.

Static Python loops over blocks (n is static under jit), float32, TPU; on
CPU (the test mesh) the panel solves fall back to XLA's solve_triangular so
the same code path is testable everywhere. Gated behind size thresholds in
`ops.linalg`'s dispatches — small matrices keep XLA, which is at the
latency floor there.
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


def _panel_lsolve(Ljj, Bwide, transpose):
    """X [128, m] with Ljj X = Bwide (or Ljj^T X = Bwide): the panel's
    substitution chain. On TPU the m columns are chunked into 128-wide
    blocks that ride the Pallas vectorized-batch solve as its batch axis
    (one in-VMEM chain for the whole panel); elsewhere XLA."""
    m = Bwide.shape[-1]
    if _use_pallas_panels() and m % _NB == 0 and 0 < m // _NB <= 64:
        from .pallas_solve import tri_solve128_vbatched

        nc = m // _NB
        chunks = jnp.swapaxes(Bwide.reshape(_NB, nc, _NB), 0, 1)
        Lb = jnp.broadcast_to(Ljj[None], (nc, _NB, _NB))
        X = tri_solve128_vbatched(Lb, chunks, transpose=transpose)
        return jnp.swapaxes(X, 0, 1).reshape(_NB, m)
    return jax.scipy.linalg.solve_triangular(
        Ljj, Bwide, lower=True, trans=1 if transpose else 0
    )


def blocked_cholesky(A):
    """Lower Cholesky of a single [n, n] SPD float32 matrix, right-looking
    over 128-wide panels; every trailing (Schur) update is one MXU matmul
    on the shrinking remainder. n must be a multiple of 128 (the dispatch
    call sites guarantee it or fall back to XLA). NaN propagates from a
    failed diagonal block exactly like `jnp.linalg.cholesky`, so
    `safe_cholesky`'s escalation composes."""
    n = A.shape[-1]
    nblk = n // _NB
    T = A
    cols = []
    for j in range(nblk):
        j0 = j * _NB
        Ljj = jnp.linalg.cholesky(T[:_NB, :_NB])
        if j < nblk - 1:
            A21 = T[_NB:, :_NB]  # [R, 128]
            # L21 = A21 Ljj^-T  <=>  L21^T = Ljj^-1 A21^T
            L21T = _panel_lsolve(Ljj, jnp.swapaxes(A21, -1, -2), False)
            L21 = jnp.swapaxes(L21T, -1, -2)
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
            Xj = _panel_lsolve(L[j0:j1, j0:j1], Bcur[:_NB], False)
            outs[j] = Xj
            if j < nblk - 1:
                Bcur = Bcur[_NB:] - _matmul(L[j1:, j0:j1], Xj)
    else:
        # transpose ONCE: per-step transposes of growing L slices measured
        # 2x slower than XLA's trsm (relayout per block step)
        LT = jnp.swapaxes(L, -1, -2)
        Bcur = B
        for j in range(nblk - 1, -1, -1):
            j0, j1 = j * _NB, (j + 1) * _NB
            Xj = _panel_lsolve(L[j0:j1, j0:j1], Bcur[j0:], True)
            outs[j] = Xj
            if j > 0:
                # (L^T)[k<j, j] X_j = LT[:j0, j0:j1] X_j
                Bcur = Bcur[:j0] - _matmul(LT[:j0, j0:j1], Xj)
    return jnp.concatenate(outs, axis=0)
