"""Fused whole-Newton Pallas kernel for the BATCHED Laplace evidence
forward (VERDICT r4 #4).

The batched evidence step's wall-clock is the Newton mode-find: 15
DEPENDENT iterations, each ~7 small XLA kernels (matmuls, a batched
Cholesky, two solves, the 4-alpha ladder) that each pay the in-scan launch
cost — measured 15 x ~190 us at B=16, n=40 (docs/PERF.md §Laplace), while
the IFT backward is already one factorization. This kernel runs the ENTIRE
damped saddle-free Newton loop for the whole batch inside one Pallas
invocation: every buffer lives in VMEM, the iteration is a
`jax.lax.fori_loop` (NOT unrolled — Mosaic does not reuse stack slots
across unrolled updates; the round-2 fused-backward attempt OOM'd exactly
that way, docs/PERF.md §Pallas), and the factorization/solves reuse the
value-level ports of the `pallas_chol`/`pallas_solve` bodies.

Because the forward sits under the IFT custom_vjp (`inference/laplace.py`),
it needs NO autodiff support — but it does need the likelihood's first two
derivatives IN-KERNEL, so it is likelihood-SPECIALIZED: closed forms for
``bernoulli_logit`` and ``student_t`` (matching `densities.student_t`'s
parameterization exactly, scale in the variance slot and all). Everything
else (evidence, marginals, gradients) stays on the generic XLA path, so
results feed the same downstream algebra.

Semantics match `inference.laplace._newton_iterations` op-for-op: same
|W| saddle-free system, same scale-aware floor, same 4-alpha best-psi
ladder with the tie-tolerant full step. Layout: batch on dim 0, vectors as
[B, 1, 128] lane rows (a [128, 1] column vector wastes 127/128 lanes),
matrices [B, 128, 128]; data index j and latent index i both padded to
128 with zero columns/rows, which self-mask every contraction.

In-kernel numerics rules (docs/PERF.md §Pallas): exact `/` + `jnp.sqrt`,
MXU at HIGHEST, reductions one axis at a time.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 128
_HI = jax.lax.Precision.HIGHEST


def _bdot(a, b, dims):
    return jax.lax.dot_general(
        a, b, (dims, ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=_HI,
    )


def _red2(x):
    """Sum over axes (1, 2) keepdims, one axis at a time (Mosaic layout
    rule: fused multi-axis keepdims reductions crash v5e layout
    inference)."""
    return jnp.sum(jnp.sum(x, axis=2, keepdims=True), axis=1, keepdims=True)


def _chol_value(A, n):
    """U upper with U^T U = A on the leading n x n block (A [B, 128, 128];
    rows of U beyond n are zero). Value-level port of
    `pallas_chol._chol_kernel_vbatch`."""
    B = A.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 8, _TILE), 2)
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, _TILE), 1)
    npanels = (n + 7) // 8
    panels = []
    for p in range(npanels):
        r0 = 8 * p
        S = A[:, r0 : r0 + 8, :]
        for i in range(min(8, n - r0)):
            c = r0 + i
            colmask = cols == c
            pivot = _red2(jnp.where((rows8 == i) & colmask, S, 0.0))
            rowi = jnp.sum(jnp.where(rows8 == i, S, 0.0), axis=1,
                           keepdims=True)
            colv = jnp.sum(jnp.where(colmask, S, 0.0), axis=2, keepdims=True)
            S = jnp.where(rows8 > i, S - colv * rowi / pivot, S)
            S = jnp.where(
                rows8 == i,
                jnp.where(cols >= c, rowi / jnp.sqrt(pivot), 0.0),
                S,
            )
        panels.append(S)
        if r0 + 8 < n:
            A = A - _bdot(S, S, ((1,), (1,)))
    U = jnp.concatenate(panels, axis=1)
    if npanels * 8 < _TILE:
        U = jnp.concatenate(
            [U, jnp.zeros((B, _TILE - npanels * 8, _TILE), jnp.float32)],
            axis=1,
        )
    return U


def _lsolve_value(L, Br, n):
    """X with L X = Br for lower-triangular L (leading n x n; Br
    [B, 128, 128]); rows beyond n zero. Port of
    `pallas_solve._lsolve_kernel_vbatch`."""
    B = L.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 8, _TILE), 2)
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, _TILE), 1)
    rowsF = jax.lax.broadcasted_iota(jnp.int32, (1, _TILE, 8), 1)
    npanels = (n + 7) // 8
    A = Br
    outs = []
    for p in range(npanels):
        r0 = 8 * p
        S = A[:, r0 : r0 + 8, :]
        Lp = L[:, r0 : r0 + 8, :]
        for i in range(min(8, n - r0)):
            c = r0 + i
            colmask = cols == c
            pivot = _red2(jnp.where((rows8 == i) & colmask, Lp, 0.0))
            xrow = (
                jnp.sum(jnp.where(rows8 == i, S, 0.0), axis=1, keepdims=True)
                / pivot
            )
            colv = jnp.sum(jnp.where(colmask, Lp, 0.0), axis=2, keepdims=True)
            S = jnp.where(rows8 > i, S - colv * xrow, S)
            S = jnp.where(rows8 == i, jnp.broadcast_to(xrow, S.shape), S)
        outs.append(S)
        if r0 + 8 < n:
            M = jnp.where(rowsF > r0 + 7, L[:, :, r0 : r0 + 8], 0.0)
            A = A - _bdot(M, S, ((2,), (1,)))
    X = jnp.concatenate(outs, axis=1)
    if npanels * 8 < _TILE:
        X = jnp.concatenate(
            [X, jnp.zeros((B, _TILE - npanels * 8, _TILE), jnp.float32)],
            axis=1,
        )
    return X


def _usolve_value(U, Br, n):
    """X with U X = Br for upper-triangular U (leading n x n)."""
    B = U.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 8, _TILE), 2)
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, _TILE), 1)
    rowsF = jax.lax.broadcasted_iota(jnp.int32, (1, _TILE, 8), 1)
    npanels = (n + 7) // 8
    A = Br
    outs = [None] * npanels
    for p in reversed(range(npanels)):
        r0 = 8 * p
        S = A[:, r0 : r0 + 8, :]
        Up = U[:, r0 : r0 + 8, :]
        for i in reversed(range(min(8, n - r0))):
            c = r0 + i
            colmask = cols == c
            pivot = _red2(jnp.where((rows8 == i) & colmask, Up, 0.0))
            xrow = (
                jnp.sum(jnp.where(rows8 == i, S, 0.0), axis=1, keepdims=True)
                / pivot
            )
            colv = jnp.sum(jnp.where(colmask, Up, 0.0), axis=2, keepdims=True)
            S = jnp.where(rows8 < i, S - colv * xrow, S)
            S = jnp.where(rows8 == i, jnp.broadcast_to(xrow, S.shape), S)
        outs[p] = S
        if r0 > 0:
            M = jnp.where(rowsF < r0, U[:, :, r0 : r0 + 8], 0.0)
            A = A - _bdot(M, S, ((2,), (1,)))
    X = jnp.concatenate(outs, axis=1)
    if npanels * 8 < _TILE:
        X = jnp.concatenate(
            [X, jnp.zeros((B, _TILE - npanels * 8, _TILE), jnp.float32)],
            axis=1,
        )
    return X


def _lik_terms(tag, df, yT, fT, varr):
    """(ll, g, |W|) elementwise for the supported closed-form likelihoods;
    all [B, 1/4, 128] row layouts. Matches `densities` exactly."""
    if tag == "bernoulli_logit":
        # ll = y log sig(f) + (1-y) log sig(-f); log sig(x) = -softplus(-x)
        sp_pos = jnp.logaddexp(0.0, fT)
        sp_neg = jnp.logaddexp(0.0, -fT)
        ll = -yT * sp_neg - (1.0 - yT) * sp_pos
        sig = 1.0 / (1.0 + jnp.exp(-fT))
        g = yT - sig
        W = sig * (1.0 - sig)
        return ll, g, W
    if tag == "student_t":
        # densities.student_t(y, f, scale, df) with scale := the model's
        # var slot: ll = C - (df+1)/2 log(1 + ((y-f)/scale)^2 / df)
        r = yT - fT
        s2 = varr * varr  # scale^2, [B, 1, 1]
        denom = df * s2 + r * r
        const = (
            math.lgamma((df + 1.0) * 0.5)
            - math.lgamma(df * 0.5)
            - 0.5 * (math.log(df) + math.log(math.pi))
        ) - 0.5 * jnp.log(s2)
        ll = const - 0.5 * (df + 1.0) * jnp.log(denom / (df * s2))
        g = (df + 1.0) * r / denom
        W_true = (df + 1.0) * (df * s2 - r * r) / (denom * denom)
        return ll, g, jnp.abs(W_true)
    raise ValueError("unsupported fused likelihood %r" % tag)


def _newton_kernel(n, m, iters, tag, df, jitter, lk_ref, yT_ref, var_ref,
                   out_ref):
    Bt = lk_ref.shape[0]
    Lk = lk_ref[:]      # [B, 128, 128], zero-padded beyond n
    yT = yT_ref[:]      # [B, 1, 128]
    varr = var_ref[:]   # [B, 1, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _TILE), 2)
    dmask = (lane < n).astype(jnp.float32)  # data-index mask (rows of Lk)
    rI = jax.lax.broadcasted_iota(jnp.int32, (1, _TILE, _TILE), 1)
    cI = jax.lax.broadcasted_iota(jnp.int32, (1, _TILE, _TILE), 2)
    I_m = ((rI == cI) & (rI < m)).astype(jnp.float32)  # latent block
    alphas = (1.0, 0.3, 0.1, 0.03)

    def body(_, vT):
        fT = _bdot(vT, Lk, ((2,), (2,)))  # [B, 1, 128] over data index
        ll0, g, W = _lik_terms(tag, df, yT, fT, varr)
        psi0 = _red2(ll0 * dmask) - 0.5 * _red2(vT * vT)  # [B, 1, 1]
        g = g * dmask
        W = W * dmask
        gpT = _bdot(g, Lk, ((2,), (1,))) - vT  # (Lk^T g - v)^T, [B, 1, 128]
        Wcol = jnp.swapaxes(W, 1, 2)  # [B, 128, 1]
        M = Lk * Wcol
        Bmat = _bdot(Lk, M, ((1,), (1,)))  # Lk^T (W Lk), [B, 128, 128]
        # same regularization as the XLA path: unit block + scale-aware
        # floor + the static jitter safe_cholesky would add
        dmax = jnp.max(
            jnp.max(Bmat * I_m, axis=2, keepdims=True), axis=1, keepdims=True
        )
        Bmat = Bmat + (1.0 + jitter * (1.0 + dmax) + jitter) * I_m
        U = _chol_value(Bmat, m)
        Ut = jnp.swapaxes(U, 1, 2)
        # rhs broadcast across all lanes: solve once, read any column
        rhs = jnp.broadcast_to(
            jnp.swapaxes(gpT, 1, 2), (Bt, _TILE, _TILE)
        )
        half = _lsolve_value(Ut, rhs, m)
        d128 = _usolve_value(U, half, m)
        dT = jnp.swapaxes(d128[:, :, 0:1], 1, 2)  # [B, 1, 128]
        Vt = jnp.concatenate([vT + a * dT for a in alphas], axis=1)  # [B,4,128]
        Ft = _bdot(Vt, Lk, ((2,), (2,)))
        ll_t, _, _ = _lik_terms(tag, df, yT, Ft, varr)
        psis = jnp.sum(
            jnp.where(dmask > 0, ll_t, 0.0), axis=2, keepdims=True
        ) - 0.5 * jnp.sum(Vt * Vt, axis=2, keepdims=True)  # [B, 4, 1]
        tie_tol = 1e-5 * (1.0 + jnp.abs(psi0))
        # candidate extraction by MASKED REDUCE, not size-1 slices:
        # psis[:, i:i+1, :] at a NON-ZERO sublane offset crashes Mosaic's
        # LLO lowering on v5e (`Check failed: d >> 32 == 0 (-1 vs 0)`,
        # lower_to_llo.cc:1093 — bisected; offset-0 slices are fine). The
        # pivot extractions in the chol/solve bodies dodge it the same way.
        cand = jax.lax.broadcasted_iota(jnp.int32, (1, 4, 1), 1)
        best_v, best_psi = vT, psi0
        for i in range(4):
            sel = (cand == i).astype(jnp.float32)
            pi_ = jnp.sum(psis * sel, axis=1, keepdims=True)  # [B, 1, 1]
            vi_ = jnp.sum(Vt * sel, axis=1, keepdims=True)  # [B, 1, 128]
            take = (
                pi_ >= best_psi - tie_tol if i == 0 else pi_ > best_psi
            )
            best_v = jnp.where(take, vi_, best_v)
            best_psi = jnp.where(take, pi_, best_psi)
        return best_v

    vT = jnp.zeros((Bt, 1, _TILE), jnp.float32)
    vT = jax.lax.fori_loop(0, iters, body, vT)
    out_ref[:] = vT


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9))
def _newton_call(lk, yT, var, n, m, iters, tag, df, jitter, interpret):
    Bt = lk.shape[0]
    return pl.pallas_call(
        functools.partial(
            _newton_kernel, n, m, iters, tag, df, jitter
        ),
        out_shape=jax.ShapeDtypeStruct((Bt, 1, _TILE), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lk, yT, var)


def newton_mode_vbatched(Lk, y, var, tag, df=0.0, iters=15, jitter=1e-6,
                         interpret=False):
    """v* [Bt, m, 1] — the batched damped saddle-free Newton mode of
    psi(v) = sum loglik((Lk v)) - |v|^2/2, whole loop in one kernel.

    Lk [Bt, n, m] whitened factors/projections (square dense factors OR
    the rectangular inducing-point projections; n, m <= 128), y [Bt, n, 1],
    var [Bt, 1] (likelihood scale; ignored for bernoulli_logit — pass
    ones). tag: 'bernoulli_logit' | 'student_t' (df static). The VMEM
    budget caps Bt at ~24 ([B,128,128] working set)."""
    Bt, n, m = Lk.shape[0], Lk.shape[-2], Lk.shape[-1]
    if n > _TILE or m > _TILE:
        raise ValueError("newton_mode_vbatched needs n, m <= 128")
    if Bt * _TILE * _TILE * 4 * 4 > 12 * 2**20:
        raise ValueError("batch too large for VMEM")
    Lk = Lk.astype(jnp.float32)
    if n < _TILE or m < _TILE:
        Lk = jnp.pad(Lk, ((0, 0), (0, _TILE - n), (0, _TILE - m)))
    yT = jnp.swapaxes(y.astype(jnp.float32), 1, 2)  # [Bt, 1, n]
    if n < _TILE:
        yT = jnp.pad(yT, ((0, 0), (0, 0), (0, _TILE - n)))
    varr = var.astype(jnp.float32).reshape(Bt, 1, 1)
    vT = _newton_call(Lk, yT, varr, n, m, int(iters), tag, float(df),
                      float(jitter), interpret)
    return jnp.swapaxes(vT[:, :, :m], 1, 2)  # [Bt, m, 1]
