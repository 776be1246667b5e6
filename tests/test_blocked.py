"""Blocked large-matrix Cholesky / trsm (`ops/blocked.py`, VERDICT r4 #2).

The CPU mesh exercises the XLA fallback of the SAME block loop the TPU
path runs (only the 128-panel diagonal solves differ — Pallas there); the
wide-RHS Pallas kernels (`ops/pallas_wide.py`) are checked in interpreter
mode. Chip ratios live in docs/PERF.md §Roofline.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from henbun_tpu.ops.blocked import blocked_cholesky, blocked_tri_solve
from henbun_tpu.ops.linalg import safe_cholesky


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n)).astype(np.float32)
    return jnp.asarray(A @ A.T / n + 2.0 * np.eye(n, dtype=np.float32))


class TestBlockedCholesky:
    @pytest.mark.parametrize("n", [128, 384, 1024])
    def test_matches_xla(self, n):
        A = _spd(n)
        Lx = jnp.linalg.cholesky(A)
        Lb = jax.jit(blocked_cholesky)(A)
        assert float(jnp.max(jnp.abs(Lb - Lx))) < 2e-6
        # strictly lower triangular output
        assert float(jnp.max(jnp.abs(jnp.triu(Lb, 1)))) == 0.0

    def test_nan_propagates_like_xla(self):
        """A non-PD diagonal block must NaN the factor (not raise), so
        safe_cholesky's jitter escalation composes."""
        A = np.array(_spd(256))  # writable copy
        A[200, 200] = -1e6  # breaks a later diagonal block
        Lb = np.asarray(jax.jit(blocked_cholesky)(jnp.asarray(A)))
        assert np.isnan(Lb).any()

    def test_safe_cholesky_large_single_matches(self):
        """The dispatch site: on CPU the >= 2048 gate stays on XLA (platform
        check), but the blocked function itself must agree at that size."""
        A = _spd(2048, seed=1)
        Lx = np.asarray(safe_cholesky(A, 0.0))
        Lb = np.asarray(jax.jit(blocked_cholesky)(A))
        assert np.max(np.abs(Lb - Lx)) < 2e-5


class TestBlockedTriSolve:
    @pytest.mark.parametrize("n", [128, 384, 1024])
    @pytest.mark.parametrize("transpose", [False, True])
    def test_matches_xla(self, n, transpose):
        L = jnp.linalg.cholesky(_spd(n))
        B = jnp.asarray(
            np.random.default_rng(1).standard_normal((n, n)).astype(np.float32)
        )
        Xx = jax.scipy.linalg.solve_triangular(
            L, B, lower=True, trans=1 if transpose else 0
        )
        Xb = jax.jit(
            lambda L, B: blocked_tri_solve(L, B, transpose)
        )(L, B)
        assert float(jnp.max(jnp.abs(Xb - Xx))) < 5e-6

    def test_narrow_rhs(self):
        """m < n right-hand sides (the evidence's [n, 1]-adjacent shapes
        padded to 128) still go through the block loop."""
        n = 384
        L = jnp.linalg.cholesky(_spd(n))
        B = jnp.asarray(
            np.random.default_rng(2).standard_normal((n, 128)).astype(
                np.float32
            )
        )
        Xx = jax.scipy.linalg.solve_triangular(L, B, lower=True)
        Xb = jax.jit(lambda L, B: blocked_tri_solve(L, B))(L, B)
        assert float(jnp.max(jnp.abs(Xb - Xx))) < 5e-6


class TestWideKernelsInterpret:
    def test_wide_lsolve_and_usolve(self):
        from henbun_tpu.ops.pallas_wide import wide_lsolve128, wide_usolve128

        rng = np.random.default_rng(0)
        L = np.tril(rng.standard_normal((128, 128))).astype(np.float32)
        L += 10.0 * np.eye(128, dtype=np.float32)
        B = rng.standard_normal((128, 256)).astype(np.float32)
        Xr = jax.scipy.linalg.solve_triangular(
            jnp.asarray(L), jnp.asarray(B), lower=True
        )
        Xk = wide_lsolve128(jnp.asarray(L), jnp.asarray(B), interpret=True)
        assert float(jnp.max(jnp.abs(Xk - Xr))) < 1e-5

        U = np.ascontiguousarray(L.T)
        Xr = jax.scipy.linalg.solve_triangular(
            jnp.asarray(U), jnp.asarray(B), lower=False
        )
        Xk = wide_usolve128(jnp.asarray(U), jnp.asarray(B), interpret=True)
        assert float(jnp.max(jnp.abs(Xk - Xr))) < 1e-5

    def test_shape_validation(self):
        from henbun_tpu.ops.pallas_wide import wide_lsolve128

        L = jnp.eye(128)
        with pytest.raises(ValueError):
            wide_lsolve128(L, jnp.zeros((128, 100)))  # not a 128 multiple
        with pytest.raises(ValueError):
            wide_lsolve128(jnp.eye(64), jnp.zeros((64, 128)))
