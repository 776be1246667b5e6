"""Vectorized-batch Pallas triangular solves for small systems (n <= 128).

Companion to `pallas_chol.cholesky128_vbatched` and aimed at the same
workload: `BatchedOptimizer` traces where B independent small models step in
one program. After the batched Cholesky win (2.1-2.6x, docs/PERF.md §Pallas)
the next-largest cost in the batched GPR step is XLA's batched
`triangular_solve` in the Cholesky *backward* (73-76 us at B=16, n=40):
reverse mode through the factorization lowers to two solves against L^T per
step. XLA's batched solve has the same disease as its batched Cholesky — the
sequential substitution chain re-pays generic while-loop/dynamic-slice
machinery per panel — so the same cure applies: keep the whole [B, 128, 128]
batch in one VMEM block, run the substitution chain ONCE for the batch with
8-row panels (static sublane slices, iota masks, no dynamic indexing), and
make each trailing update a K=8 batched MXU matmul.

Kernels (all float32, n <= 128, RHS up to 128 columns):

* `_lsolve_kernel_vbatch` — forward substitution, solves L X = B for lower
  triangular L (top-down panels).
* `_usolve_kernel_vbatch` — back substitution, solves U X = B for upper
  triangular U (bottom-up panels). `L^T X = B` is this kernel on
  `swapaxes(L)` — one cheap XLA transpose outside the kernel instead of
  lane<->sublane transposes inside it.

In-kernel numerics rules (measured in round 2, docs/PERF.md §Pallas): exact
`/` + `jnp.sqrt` (TPU rsqrt/reciprocal are approximate), MXU matmuls at
`precision=HIGHEST` (default bf16 passes cost ~1e-4), and reductions one
axis at a time (fused axis=(1,2) keepdims reductions create rank-1
intermediates that crash Mosaic's v5e vector-layout inference).

The reference has no counterpart (its solves ride TF's generic C++ kernels,
`/root/reference/Henbun/gp/gp.py:146-174`); this is the TPU-native answer to
the same linear algebra.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 128


def _panel_masks():
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 8, _TILE), 2)
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, _TILE), 1)
    rowsF = jax.lax.broadcasted_iota(jnp.int32, (1, _TILE, 8), 1)
    return cols, rows8, rowsF


def _pivot(mask, panel):
    """[B,1,1] masked scalar extract; two-step reduction (see module doc)."""
    return jnp.sum(
        jnp.sum(jnp.where(mask, panel, 0.0), axis=2, keepdims=True),
        axis=1,
        keepdims=True,
    )


def _trailing_matmul(A, M, S):
    """A - M @ S with batch dim 0, contracting M's 8-lane axis with S's
    8-sublane axis, full f32 MXU precision."""
    return A - jax.lax.dot_general(
        M,
        S,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _lsolve_kernel_vbatch(n, l_ref, b_ref, out_ref):
    """Forward substitution on all B systems at once: panel p solves rows
    [8p, 8p+8) of X, then one batched MXU matmul folds those rows into every
    remaining RHS row (the right-looking update)."""
    B = l_ref.shape[0]
    cols, rows8, rowsF = _panel_masks()
    out_ref[:] = jnp.zeros((B, _TILE, _TILE), jnp.float32)
    A = b_ref[:]
    L = l_ref[:]
    for p in range((n + 7) // 8):
        r0 = 8 * p
        S = A[:, r0 : r0 + 8, :]
        Lp = L[:, r0 : r0 + 8, :]
        for i in range(min(8, n - r0)):
            c = r0 + i
            colmask = cols == c
            pivot = _pivot((rows8 == i) & colmask, Lp)
            xrow = (
                jnp.sum(jnp.where(rows8 == i, S, 0.0), axis=1, keepdims=True)
                / pivot
            )  # [B, 1, 128] solved row i
            colv = jnp.sum(
                jnp.where(colmask, Lp, 0.0), axis=2, keepdims=True
            )  # [B, 8, 1] = L[r0:r0+8, c]
            S = jnp.where(rows8 > i, S - colv * xrow, S)
            S = jnp.where(rows8 == i, jnp.broadcast_to(xrow, S.shape), S)
        out_ref[:, r0 : r0 + 8, :] = S
        if r0 + 8 < n:
            M = jnp.where(rowsF > r0 + 7, L[:, :, r0 : r0 + 8], 0.0)
            A = _trailing_matmul(A, M, S)


def _usolve_kernel_vbatch(n, u_ref, b_ref, out_ref):
    """Back substitution (upper triangular U), panels bottom-up."""
    B = u_ref.shape[0]
    cols, rows8, rowsF = _panel_masks()
    out_ref[:] = jnp.zeros((B, _TILE, _TILE), jnp.float32)
    A = b_ref[:]
    U = u_ref[:]
    npanels = (n + 7) // 8
    for p in reversed(range(npanels)):
        r0 = 8 * p
        S = A[:, r0 : r0 + 8, :]
        Up = U[:, r0 : r0 + 8, :]
        for i in reversed(range(min(8, n - r0))):
            c = r0 + i
            colmask = cols == c
            pivot = _pivot((rows8 == i) & colmask, Up)
            xrow = (
                jnp.sum(jnp.where(rows8 == i, S, 0.0), axis=1, keepdims=True)
                / pivot
            )
            colv = jnp.sum(jnp.where(colmask, Up, 0.0), axis=2, keepdims=True)
            S = jnp.where(rows8 < i, S - colv * xrow, S)
            S = jnp.where(rows8 == i, jnp.broadcast_to(xrow, S.shape), S)
        out_ref[:, r0 : r0 + 8, :] = S
        if r0 > 0:
            M = jnp.where(rowsF < r0, U[:, :, r0 : r0 + 8], 0.0)
            A = _trailing_matmul(A, M, S)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _solve128_vbatched_padded(t, b, n, upper, interpret):
    B = t.shape[0]
    kernel = _usolve_kernel_vbatch if upper else _lsolve_kernel_vbatch
    return pl.pallas_call(
        functools.partial(kernel, n),
        out_shape=jax.ShapeDtypeStruct((B, _TILE, _TILE), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(t, b)


def tri_solve128_vbatched(L, B, transpose=False, interpret=False):
    """Batched triangular solve of [Bt, n, n] lower-triangular systems
    against [Bt, n, m] right-hand sides (n, m <= 128), the batch vectorized
    INSIDE one kernel invocation.

    ``transpose=False`` solves ``L X = B`` (forward substitution);
    ``transpose=True`` solves ``L^T X = B`` (back substitution on the
    transposed factor — the shape reverse-mode Cholesky gradients produce).
    Only the relevant triangle of ``L`` is read.
    """
    if L.ndim != 3 or L.shape[-1] != L.shape[-2]:
        raise ValueError("need [Bt, n, n] triangular factors; got %s" % (L.shape,))
    n = L.shape[-1]
    Bt = L.shape[0]
    if B.ndim != 3 or B.shape[0] != Bt or B.shape[1] != n:
        raise ValueError(
            "rhs must be [Bt=%d, n=%d, m]; got %s" % (Bt, n, B.shape)
        )
    m = B.shape[-1]
    if n > _TILE or m > _TILE:
        raise ValueError("tri_solve128_vbatched needs n, m <= 128")
    if Bt * _TILE * _TILE * 4 * 3 > 12 * 2**20:
        raise ValueError("batch too large for VMEM")
    L = L.astype(jnp.float32)
    B = B.astype(jnp.float32)
    if transpose:
        # one XLA transpose outside the kernel; the kernel then works on
        # natural row panels of the UPPER factor
        T = jnp.swapaxes(L, -1, -2)
        T = jnp.triu(T)
    else:
        T = jnp.tril(L)
    padn, padm = _TILE - n, _TILE - m
    if padn or padm:
        T = jnp.pad(T, ((0, 0), (0, padn), (0, padn)))
        B = jnp.pad(B, ((0, 0), (0, padn), (0, padm)))
    X = _solve128_vbatched_padded(T, B, n, transpose, interpret)
    return X[:, :n, :m] if (padn or padm) else X
