"""Single-tile Pallas Cholesky for small grams (n <= 128).

The headline GPR workloads factorize a small gram every optimization step
(`/root/reference/Henbun/gp/kernels.py:93-101` does `tf.cholesky` on an
[n, n] RBF gram each `session.run`). XLA's generic Cholesky pays a
dynamic-slice while-loop; for n <= 128 the whole factorization fits one VMEM
tile, so a Pallas kernel can run a blocked right-looking factorization
entirely on-chip with static control flow:

* the factor is built as the UPPER factor U (A = U^T U) so every panel is a
  ROW slice — static sublane slices, never a dynamic lane slice;
* each 8-row panel is eliminated with 8 unrolled Gauss steps on an (8, 128)
  tile (iota masks + sublane/lane reductions, no dynamic indexing);
* the trailing Schur update is one K=8 MXU matmul per panel
  (S^T S, contracting the sublane axis).

The loop bounds are STATIC (from the logical size rounded to 8), so an n=40
gram runs 5 panels, not 16. The returned factor is lower (U^T).

Experimental: reachable by DIRECT IMPORT only — no settings flag dispatches
to it (`ops.linalg.safe_cholesky` stays the library-wide path; XLA's own
small-matrix Cholesky measured faster, docs/PERF.md).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 128


def _chol_kernel(n, a_ref, out_ref):
    cols = jax.lax.broadcasted_iota(jnp.int32, (8, _TILE), 1)
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, _TILE), 0)
    out_ref[:] = jnp.zeros((_TILE, _TILE), jnp.float32)
    A = a_ref[:]
    for p in range((n + 7) // 8):
        r0 = 8 * p
        S = A[r0 : r0 + 8, :]
        for i in range(min(8, n - r0)):
            c = r0 + i
            colmask = cols == c
            pivot = jnp.sum(jnp.where((rows8 == i) & colmask, S, 0.0))
            rowi = jnp.sum(jnp.where(rows8 == i, S, 0.0), axis=0, keepdims=True)
            colv = jnp.sum(jnp.where(colmask, S, 0.0), axis=1, keepdims=True)
            # exact divide / sqrt: TPU rsqrt/reciprocal are approximate and
            # cost ~1e-4 relative factor error, vs ~1e-6 with exact ops
            S = jnp.where(rows8 > i, S - colv * rowi / pivot, S)
            S = jnp.where(
                rows8 == i,
                jnp.where(cols >= c, rowi / jnp.sqrt(pivot), 0.0),
                S,
            )
        out_ref[r0 : r0 + 8, :] = S
        if r0 + 8 < n:
            # HIGHEST precision: the MXU's default bf16 passes would leak
            # ~1e-4 relative error into every trailing Schur update
            A = A - jax.lax.dot_general(
                S,
                S,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )


@functools.partial(jax.jit, static_argnums=(1, 2))
def _chol128_padded(a, n, interpret):
    U = pl.pallas_call(
        functools.partial(_chol_kernel, n),
        out_shape=jax.ShapeDtypeStruct((_TILE, _TILE), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a)
    return U.T


def _chol_kernel_vbatch(n, a_ref, out_ref):
    """Vectorized-batch variant: the WHOLE [B, 128, 128] batch lives in one
    VMEM block and every Gauss step / Schur update operates on all B matrices
    at once. The sequential pivot chain (the latency wall of any Cholesky)
    is paid ONCE for the batch instead of once per matrix — this is where a
    hand kernel beats XLA's batched factorization (which also vectorizes the
    chain but pays generic while-loop/dynamic-slice overhead per panel;
    measured in docs/PERF.md)."""
    B = a_ref.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 8, _TILE), 2)
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, _TILE), 1)
    out_ref[:] = jnp.zeros((B, _TILE, _TILE), jnp.float32)
    A = a_ref[:]
    for p in range((n + 7) // 8):
        r0 = 8 * p
        S = A[:, r0 : r0 + 8, :]  # [B, 8, 128]
        for i in range(min(8, n - r0)):
            c = r0 + i
            colmask = cols == c
            # two-step keepdims reduction: a fused axis=(1,2) reduce creates
            # a rank-1 [B] intermediate whose relayout crashes Mosaic's
            # vector-layout inference (layout.h check, v5e libtpu)
            pivot = jnp.sum(
                jnp.sum(
                    jnp.where((rows8 == i) & colmask, S, 0.0),
                    axis=2,
                    keepdims=True,
                ),
                axis=1,
                keepdims=True,
            )  # [B, 1, 1]
            rowi = jnp.sum(
                jnp.where(rows8 == i, S, 0.0), axis=1, keepdims=True
            )  # [B, 1, 128]
            colv = jnp.sum(
                jnp.where(colmask, S, 0.0), axis=2, keepdims=True
            )  # [B, 8, 1]
            S = jnp.where(rows8 > i, S - colv * rowi / pivot, S)
            S = jnp.where(
                rows8 == i,
                jnp.where(cols >= c, rowi / jnp.sqrt(pivot), 0.0),
                S,
            )
        out_ref[:, r0 : r0 + 8, :] = S
        if r0 + 8 < n:
            A = A - jax.lax.dot_general(
                S,
                S,
                (((1,), (1,)), ((0,), (0,))),  # batch dim 0, contract sublane
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )


@functools.partial(jax.jit, static_argnums=(1, 2))
def _chol128_vbatched_padded(a, n, interpret):
    B = a.shape[0]
    U = pl.pallas_call(
        functools.partial(_chol_kernel_vbatch, n),
        out_shape=jax.ShapeDtypeStruct((B, _TILE, _TILE), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a)
    return jnp.swapaxes(U, -1, -2)


def cholesky128_vbatched(A, interpret=False):
    """Batched lower Cholesky of [B, n, n] SPD matrices (n <= 128, modest B:
    the batch must fit VMEM, ~B <= 48) with the batch vectorized INSIDE one
    kernel invocation. See `_chol_kernel_vbatch` for why this beats both the
    per-matrix grid (`cholesky128_batched`) and XLA's batched Cholesky."""
    n = A.shape[-1]
    B = A.shape[0]
    if A.ndim != 3 or A.shape[-2] != n or n > _TILE:
        raise ValueError(
            "cholesky128_vbatched needs [B, n, n] with n <= 128; got %s"
            % (A.shape,)
        )
    if B * _TILE * _TILE * 4 * 2 > 12 * 2**20:
        raise ValueError("batch too large for VMEM; use cholesky128_batched")
    A = A.astype(jnp.float32)
    pad = _TILE - n
    if pad:
        A = jnp.pad(A, ((0, 0), (0, pad), (0, pad)))
    L = _chol128_vbatched_padded(A, n, interpret)
    return L[:, :n, :n] if pad else L


@functools.partial(jax.jit, static_argnums=(1, 2))
def _chol128_batched_padded(a, n, interpret):
    B = a.shape[0]
    U = pl.pallas_call(
        functools.partial(_chol_kernel, n),
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, _TILE, _TILE), jnp.float32),
        in_specs=[
            pl.BlockSpec(
                (None, _TILE, _TILE), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (None, _TILE, _TILE), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(a)
    return jnp.swapaxes(U, -1, -2)


def cholesky128_batched(A, interpret=False):
    """Batched lower Cholesky of [B, n, n] SPD matrices, n <= 128: one grid
    cell per matrix, each running the single-tile kernel in its own VMEM
    block. The batched-GPR / batched-SVGP step is the shape where a hand
    kernel could beat XLA's batched factorization (BatchedOptimizer makes
    B independent grams per step a first-class workload)."""
    n = A.shape[-1]
    if A.ndim != 3 or A.shape[-2] != n or n > _TILE:
        raise ValueError(
            "cholesky128_batched needs [B, n, n] with n <= 128; got %s"
            % (A.shape,)
        )
    A = A.astype(jnp.float32)
    pad = _TILE - n
    if pad:
        A = jnp.pad(A, ((0, 0), (0, pad), (0, pad)))
    L = _chol128_batched_padded(A, n, interpret)
    return L[:, :n, :n] if pad else L


def cholesky128(A, interpret=False):
    """Lower Cholesky of an [n, n] SPD matrix, n <= 128, float32.

    Reads only the lower triangle's information (the input is used
    symmetrically); NaNs propagate on a non-positive pivot exactly as
    `jnp.linalg.cholesky` does, so `safe_cholesky`'s jitter-escalation retry
    composes with it.
    """
    n = A.shape[-1]
    if A.shape[-2] != n or n > _TILE:
        raise ValueError("cholesky128 needs a square matrix with n <= 128")
    A = A.astype(jnp.float32)
    pad = _TILE - n
    if pad:
        A = jnp.pad(A, ((0, pad), (0, pad)))
    L = _chol128_padded(A, n, interpret)
    return L[:n, :n] if pad else L
