"""Wide-RHS Pallas triangular solves: one [128, 128] factor vs [128, m] RHS.

The building block of the blocked large-matrix algorithms (`ops/blocked.py`):
a blocked Cholesky's panel solve and a blocked trsm's diagonal solve are both
"one small triangular factor against a WIDE right-hand side". The
substitution chain runs along sublanes (8-row panels, like
`pallas_solve._lsolve_kernel_vbatch`) while the m RHS columns fill the lane
axis — so the chain executes ONCE, fully vectorized over every column, with
no chunking, no broadcast factor materialization, and no relayouts (the
round-5 chunked-vbatch wiring paid a [128, m] -> [m/128, 128, 128]
transpose per panel; measured in docs/PERF.md §Roofline).

Kernels (float32; m a multiple of 128, VMEM-capped at m <= 8192):
* `wide_lsolve128(L, B)`  — X with L X = B, L lower triangular.
* `wide_usolve128(U, B)`  — X with U X = B, U upper triangular (callers
  hoist the ONE transpose of a lower factor outside their block loop).

In-kernel numerics rules as everywhere (docs/PERF.md §Pallas): exact `/`,
MXU updates at HIGHEST, one-axis-at-a-time reductions, static shapes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 128


def _masks(m):
    colsL = jax.lax.broadcasted_iota(jnp.int32, (8, _TILE), 1)
    rows8L = jax.lax.broadcasted_iota(jnp.int32, (8, _TILE), 0)
    rows8S = jax.lax.broadcasted_iota(jnp.int32, (8, m), 0)
    rowsF = jax.lax.broadcasted_iota(jnp.int32, (_TILE, 8), 0)
    return colsL, rows8L, rows8S, rowsF


def _pivot(mask, panel):
    """[1, 1] masked scalar; two-step reduction (Mosaic layout rule)."""
    return jnp.sum(
        jnp.sum(jnp.where(mask, panel, 0.0), axis=1, keepdims=True),
        axis=0,
        keepdims=True,
    )


def _update(A, M, S):
    """A - M @ S at full f32 MXU precision: [128, 8] @ [8, m]."""
    return A - jax.lax.dot_general(
        M,
        S,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _wide_lsolve_kernel(l_ref, b_ref, out_ref):
    """Forward substitution, 8-row panels top-down, all m columns at once."""
    m = b_ref.shape[-1]
    colsL, rows8L, rows8S, rowsF = _masks(m)
    A = b_ref[:]
    L = l_ref[:]
    for p in range(_TILE // 8):
        r0 = 8 * p
        S = A[r0 : r0 + 8, :]  # [8, m]
        Lp = L[r0 : r0 + 8, :]  # [8, 128]
        for i in range(8):
            c = r0 + i
            colmask = colsL == c
            pivot = _pivot((rows8L == i) & colmask, Lp)
            xrow = (
                jnp.sum(jnp.where(rows8S == i, S, 0.0), axis=0, keepdims=True)
                / pivot
            )  # [1, m] solved row
            colv = jnp.sum(
                jnp.where(colmask, Lp, 0.0), axis=1, keepdims=True
            )  # [8, 1] = L[r0:r0+8, c]
            S = jnp.where(rows8S > i, S - colv * xrow, S)
            S = jnp.where(rows8S == i, jnp.broadcast_to(xrow, S.shape), S)
        out_ref[r0 : r0 + 8, :] = S
        if r0 + 8 < _TILE:
            M = jnp.where(rowsF > r0 + 7, L[:, r0 : r0 + 8], 0.0)
            A = _update(A, M, S)


def _wide_usolve_kernel(u_ref, b_ref, out_ref):
    """Back substitution (upper factor), panels bottom-up."""
    m = b_ref.shape[-1]
    colsL, rows8L, rows8S, rowsF = _masks(m)
    A = b_ref[:]
    U = u_ref[:]
    for p in reversed(range(_TILE // 8)):
        r0 = 8 * p
        S = A[r0 : r0 + 8, :]
        Up = U[r0 : r0 + 8, :]
        for i in reversed(range(8)):
            c = r0 + i
            colmask = colsL == c
            pivot = _pivot((rows8L == i) & colmask, Up)
            xrow = (
                jnp.sum(jnp.where(rows8S == i, S, 0.0), axis=0, keepdims=True)
                / pivot
            )
            colv = jnp.sum(
                jnp.where(colmask, Up, 0.0), axis=1, keepdims=True
            )
            S = jnp.where(rows8S < i, S - colv * xrow, S)
            S = jnp.where(rows8S == i, jnp.broadcast_to(xrow, S.shape), S)
        out_ref[r0 : r0 + 8, :] = S
        if r0 > 0:
            M = jnp.where(rowsF < r0, U[:, r0 : r0 + 8], 0.0)
            A = _update(A, M, S)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _wide_solve_call(t, b, upper, interpret):
    kernel = _wide_usolve_kernel if upper else _wide_lsolve_kernel
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(b.shape, jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(t, b)


def _check(T, B):
    if T.shape != (_TILE, _TILE):
        raise ValueError("factor must be [128, 128]; got %s" % (T.shape,))
    if B.ndim != 2 or B.shape[0] != _TILE:
        raise ValueError("rhs must be [128, m]; got %s" % (B.shape,))
    m = B.shape[-1]
    if m % _TILE or not (0 < m <= 8192):
        raise ValueError(
            "m must be a positive multiple of 128 and <= 8192; got %d" % m
        )


def wide_lsolve128(L, B, interpret=False):
    """X [128, m] with L X = B; L [128, 128] lower triangular (only the
    lower triangle is read)."""
    _check(L, B)
    return _wide_solve_call(
        jnp.tril(L.astype(jnp.float32)), B.astype(jnp.float32), False,
        interpret,
    )


def wide_usolve128(U, B, interpret=False):
    """X [128, m] with U X = B; U [128, 128] upper triangular (only the
    upper triangle is read)."""
    _check(U, B)
    return _wide_solve_call(
        jnp.triu(U.astype(jnp.float32)), B.astype(jnp.float32), True,
        interpret,
    )
