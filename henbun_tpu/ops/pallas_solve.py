"""Vectorized-batch triangular solve (lower), n <= 128, batch in one VMEM
block.

Companion to `pallas_chol.cholesky128_vbatched` and built for the same
reason: XLA's batched `triangular_solve` re-pays generic while-loop overhead
per panel (measured 73-76 us at B=16, n=40 on v5e — as slow as its batched
Cholesky), while a hand kernel pays the sequential substitution chain once
for the whole batch:

* forward substitution in 8-row panels; within a panel the 8 eliminations
  are fully unrolled with STATIC slices (the [B, 8, 8] diagonal block is a
  static slice of L, each row a static sublane slice);
* after each panel, the trailing residual update is ONE batched MXU
  contraction ([B, 128, 8] x [B, 8, K]);
* all shapes keep >= 2 trailing dims — a rank-1 [B] intermediate crashes
  Mosaic's vector-layout inference on v5e (see pallas_chol).

Transposed solves (L^T X = B) use the flip identity: reversing both axes of
an upper-triangular matrix yields a lower-triangular one, so
``L^T X = B  <=>  rev(X) = solve_lower(rev2(L^T), rev(B))`` where rev flips
the row axis and rev2 flips both; the flips are pure data movement, done
outside the kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 128


def _trisolve_kernel_vbatch(n, l_ref, b_ref, out_ref):
    B = l_ref.shape[0]
    K = b_ref.shape[-1]
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, K), 1)
    ACC = b_ref[:]  # [B, 128, K] residual right-hand side
    out_ref[:] = jnp.zeros((B, _TILE, K), jnp.float32)
    for p in range((n + 7) // 8):
        r0 = 8 * p
        S = ACC[:, r0 : r0 + 8, :]  # [B, 8, K]
        Lsub = l_ref[:, r0 : r0 + 8, r0 : r0 + 8]  # [B, 8, 8] static slice
        X = jnp.zeros_like(S)
        for i in range(min(8, n - r0)):
            c = S[:, i : i + 1, :]  # [B, 1, K]
            for j in range(i):
                c = c - Lsub[:, i : i + 1, j : j + 1] * X[:, j : j + 1, :]
            xi = c / Lsub[:, i : i + 1, i : i + 1]
            X = jnp.where(rows8 == i, xi, X)
        out_ref[:, r0 : r0 + 8, :] = X
        if r0 + 8 < n:
            # trailing residual update: rows above r0+8 receive garbage but
            # have already been consumed — only rows > r0+7 are read later
            Lcols = l_ref[:, :, r0 : r0 + 8]  # [B, 128, 8]
            ACC = ACC - jax.lax.dot_general(
                Lcols,
                X,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )


@functools.partial(jax.jit, static_argnums=(2, 3))
def _trisolve_padded(l, b, n, interpret):
    B = l.shape[0]
    K = b.shape[-1]
    return pl.pallas_call(
        functools.partial(_trisolve_kernel_vbatch, n),
        out_shape=jax.ShapeDtypeStruct((B, _TILE, K), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(l, b)


def tri_solve_vbatched(L, B, transpose=False, interpret=False):
    """Solve L X = B (or L^T X = B with ``transpose``) for a batch of lower
    triangular L [B, n, n] and right-hand sides B [B, n, k]; n, k <= 128,
    float32, batch sized to VMEM (~B*(128*128+2*128*k)*4 <= 12MB)."""
    n = L.shape[-1]
    k = B.shape[-1]
    nb = L.shape[0]
    if L.ndim != 3 or L.shape[-2] != n or n > _TILE:
        raise ValueError("tri_solve_vbatched needs L [B, n, n], n <= 128")
    if B.ndim != 3 or B.shape[0] != nb or B.shape[1] != n or k > _TILE:
        raise ValueError("tri_solve_vbatched needs B [B, n, k], k <= 128")
    if nb * (_TILE * _TILE + 2 * _TILE * max(k, 8)) * 4 > 12 * 2**20:
        raise ValueError("batch too large for VMEM")
    L = L.astype(jnp.float32)
    B = B.astype(jnp.float32)
    if transpose:
        # L^T X = B  <=>  rev2(L) (rev X) = rev B, and rev2(L^T) = rev2(L)^T
        # is lower triangular when L is: flip, solve lower, flip back.
        L = jnp.flip(jnp.swapaxes(L, -1, -2), axis=(-2, -1))
        B = jnp.flip(B, axis=-2)
    pad_n = _TILE - n
    kp = max(k, 8)  # keep the lane axis a usable tile width
    pad_k = kp - k
    if pad_n:
        # unit diagonal on the padded block keeps the padded rows finite
        eye_pad = jnp.eye(_TILE, dtype=jnp.float32)[None, n:, :]
        L = jnp.pad(L, ((0, 0), (0, pad_n), (0, pad_n)))
        L = L.at[:, n:, :].set(jnp.broadcast_to(eye_pad, (nb, pad_n, _TILE)))
        B = jnp.pad(B, ((0, 0), (0, pad_n), (0, 0)))
    if pad_k:
        B = jnp.pad(B, ((0, 0), (0, 0), (0, pad_k)))
    X = _trisolve_padded(L, B, n, interpret)
    X = X[:, :n, :k]
    if transpose:
        X = jnp.flip(X, axis=-2)
    return X
