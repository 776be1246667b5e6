"""Pallas kernel tests (interpret mode on CPU).

Round 2 retired the fused-MLP and fused-sample+KL kernels (measured
neutral-to-slower than XLA fusion at every relevant shape, docs/PERF.md
§Pallas); the surviving kernel family is the single-tile Cholesky and its
vectorized-batch variant, which beats XLA's batched factorization 2.1-2.6x
on v5e and is dispatched automatically for batched `safe_cholesky` calls
under ``[tpu] use_pallas``.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import henbun_tpu as hb
from henbun_tpu.ops.linalg import safe_cholesky


RNG = np.random.default_rng(0)


def _spd(n, seed=0, batch=None):
    shape = (batch, n, n) if batch else (n, n)
    B = np.random.default_rng(seed).normal(size=shape).astype(np.float32)
    return B @ np.swapaxes(B, -1, -2) + n * np.eye(n, dtype=np.float32)


class TestPallasCholesky:
    @pytest.mark.parametrize("n", [3, 8, 40, 100, 128])
    def test_matches_xla_cholesky(self, n):
        from henbun_tpu.ops.pallas_chol import cholesky128

        A = _spd(n)
        L = np.asarray(cholesky128(jnp.asarray(A), interpret=True))
        Lref = np.linalg.cholesky(A)
        assert L.shape == (n, n)
        assert np.allclose(L, Lref, atol=1e-3 * np.abs(Lref).max())
        # strictly lower output above the diagonal
        assert np.allclose(np.triu(L, 1), 0.0)

    def test_nan_on_non_spd(self):
        from henbun_tpu.ops.pallas_chol import cholesky128

        A = -np.eye(8, dtype=np.float32)  # negative pivots
        L = np.asarray(cholesky128(jnp.asarray(A), interpret=True))
        assert np.isnan(L).any()

    def test_rejects_large(self):
        from henbun_tpu.ops.pallas_chol import cholesky128

        with pytest.raises(ValueError):
            cholesky128(jnp.eye(129))


class TestPallasCholeskyBatched:
    @pytest.mark.parametrize("n", [8, 40, 128])
    @pytest.mark.parametrize("B", [1, 5, 16])
    def test_vbatched_matches_xla(self, n, B):
        from henbun_tpu.ops.pallas_chol import cholesky128_vbatched

        A = _spd(n, seed=n + B, batch=B)
        L = np.asarray(cholesky128_vbatched(jnp.asarray(A), interpret=True))
        Lref = np.linalg.cholesky(A)
        assert L.shape == (B, n, n)
        assert np.allclose(L, Lref, atol=1e-3 * np.abs(Lref).max())
        assert np.allclose(np.triu(L, 1), 0.0)

    def test_grid_batched_matches_xla(self):
        from henbun_tpu.ops.pallas_chol import cholesky128_batched

        A = _spd(40, seed=7, batch=4)
        L = np.asarray(cholesky128_batched(jnp.asarray(A), interpret=True))
        assert np.allclose(
            L, np.linalg.cholesky(A), atol=1e-3 * np.abs(L).max()
        )

    def test_per_matrix_nan_isolation(self):
        """One bad matrix in the batch must not poison its neighbors."""
        from henbun_tpu.ops.pallas_chol import cholesky128_vbatched

        A = _spd(16, seed=3, batch=3)
        A[1] = -np.eye(16, dtype=np.float32)
        L = np.asarray(cholesky128_vbatched(jnp.asarray(A), interpret=True))
        assert np.isnan(L[1]).any()
        for i in (0, 2):
            assert np.allclose(
                L[i], np.linalg.cholesky(A[i]), atol=1e-3 * np.abs(L[i]).max()
            )

    def test_vmem_guard(self):
        from henbun_tpu.ops.pallas_chol import cholesky128_vbatched

        with pytest.raises(ValueError, match="VMEM|batch"):
            cholesky128_vbatched(jnp.zeros((200, 128, 128)))


class TestPallasTriSolve:
    """Vectorized-batch triangular solves (interpret mode). On TPU with
    `[tpu] use_pallas` these carry both L^T solves of the batched Cholesky
    backward (3.2-4.4x over XLA's batched solve, benchmarks/solve_bench.py)."""

    @pytest.mark.parametrize("n,m", [(7, 13), (40, 40), (100, 64), (128, 128)])
    @pytest.mark.parametrize("transpose", [False, True])
    def test_matches_dense_solve(self, n, m, transpose):
        from henbun_tpu.ops.pallas_solve import tri_solve128_vbatched

        Bt = 3
        A = RNG.normal(size=(Bt, n, n)).astype(np.float32)
        L = np.tril(A) + n * np.eye(n, dtype=np.float32)
        B = RNG.normal(size=(Bt, n, m)).astype(np.float32)
        X = np.asarray(
            tri_solve128_vbatched(
                jnp.asarray(L), jnp.asarray(B), transpose=transpose,
                interpret=True,
            )
        )
        M = np.swapaxes(L, -1, -2) if transpose else L
        Xref = np.stack([np.linalg.solve(M[i], B[i]) for i in range(Bt)])
        assert X.shape == (Bt, n, m)
        assert np.allclose(X, Xref, atol=1e-4 * np.abs(Xref).max())

    def test_reads_only_relevant_triangle(self):
        """Garbage above the diagonal of L must not leak into the solution."""
        from henbun_tpu.ops.pallas_solve import tri_solve128_vbatched

        n = 24
        L = np.tril(RNG.normal(size=(2, n, n))).astype(np.float32)
        L += n * np.eye(n, dtype=np.float32)
        B = RNG.normal(size=(2, n, n)).astype(np.float32)
        dirty = L + 1e6 * np.triu(np.ones((n, n), np.float32), 1)
        for transpose in (False, True):
            clean = np.asarray(
                tri_solve128_vbatched(
                    jnp.asarray(L), jnp.asarray(B), transpose=transpose,
                    interpret=True,
                )
            )
            got = np.asarray(
                tri_solve128_vbatched(
                    jnp.asarray(dirty), jnp.asarray(B), transpose=transpose,
                    interpret=True,
                )
            )
            assert np.allclose(got, clean)

    def test_shape_guards(self):
        from henbun_tpu.ops.pallas_solve import tri_solve128_vbatched

        with pytest.raises(ValueError):
            tri_solve128_vbatched(jnp.eye(8), jnp.zeros((8, 8)))
        with pytest.raises(ValueError):
            tri_solve128_vbatched(
                jnp.zeros((2, 129, 129)), jnp.zeros((2, 129, 8))
            )
        with pytest.raises(ValueError, match="VMEM|batch"):
            tri_solve128_vbatched(
                jnp.zeros((200, 128, 128)), jnp.zeros((200, 128, 128))
            )


class TestTriSolve:
    """`ops.linalg.tri_solve` — the library-wide dispatched lower solve
    (custom_vjp; forward and gradient solves both take the Pallas kernels on
    batched TPU traces). On the CPU backend it must be exactly XLA's
    triangular_solve in value and gradient, single and vmapped."""

    def test_value_and_grad_match_xla(self):
        from henbun_tpu.ops.linalg import tri_solve

        n = 12
        L = jnp.asarray(
            np.tril(RNG.normal(size=(n, n))).astype(np.float32)
            + n * np.eye(n, dtype=np.float32)
        )
        B = jnp.asarray(RNG.normal(size=(n, 5)).astype(np.float32))
        ref_fn = lambda l, b: jax.scipy.linalg.solve_triangular(l, b, lower=True)
        assert np.allclose(tri_solve(L, B), ref_fn(L, B), atol=1e-5)
        for arg in (0, 1):
            g = jax.grad(lambda l, b: jnp.sum(jnp.sin(tri_solve(l, b))), arg)(L, B)
            gr = jax.grad(lambda l, b: jnp.sum(jnp.sin(ref_fn(l, b))), arg)(L, B)
            # XLA's rule may leave the untouched triangle unmasked; compare
            # the lower part (the only part a triangular solve reads)
            assert np.allclose(np.tril(g), np.tril(gr), atol=1e-4), arg

    def test_vmapped_value_and_grad(self):
        from henbun_tpu.ops.linalg import tri_solve

        n, Bt = 9, 4
        L = jnp.asarray(
            np.tril(RNG.normal(size=(Bt, n, n))).astype(np.float32)
            + n * np.eye(n, dtype=np.float32)
        )
        B = jnp.asarray(RNG.normal(size=(Bt, n, n)).astype(np.float32))
        got = jax.vmap(tri_solve)(L, B)
        ref = jax.scipy.linalg.solve_triangular(L, B, lower=True)
        assert np.allclose(got, ref, atol=1e-5)
        g = jax.vmap(jax.grad(lambda l, b: jnp.sum(tri_solve(l, b) ** 2)))(L, B)
        gr = jax.vmap(
            jax.grad(
                lambda l, b: jnp.sum(
                    jax.scipy.linalg.solve_triangular(l, b, lower=True) ** 2
                )
            )
        )(L, B)
        assert np.allclose(np.tril(g), np.tril(gr), atol=2e-4)

    def test_unbatched_rhs_under_vmap(self):
        """vmap over L only (shared RHS) broadcasts inside the dispatch."""
        from henbun_tpu.ops.linalg import tri_solve

        n, Bt = 8, 3
        L = jnp.asarray(
            np.tril(RNG.normal(size=(Bt, n, n))).astype(np.float32)
            + n * np.eye(n, dtype=np.float32)
        )
        I = jnp.eye(n)
        got = jax.vmap(lambda l: tri_solve(l, I))(L)
        ref = jax.scipy.linalg.solve_triangular(L, jnp.broadcast_to(I, L.shape), lower=True)
        assert np.allclose(got, ref, atol=1e-5)


class TestSafeCholeskyDispatch:
    """safe_cholesky under vmap routes through _cholesky_dispatch; on the CPU
    test backend (or with use_pallas off) that is the XLA path — the contract
    here is that the custom_vmap + custom_jvp composition stays correct under
    vmap, grad, and their composition."""

    def test_vmap_value_and_grad(self):
        A = jnp.asarray(_spd(12, seed=1, batch=6))

        def loss(a):
            return jnp.sum(jnp.sin(safe_cholesky(a, 1e-6)))

        got = np.asarray(jax.vmap(jax.grad(loss))(A))
        ref = np.asarray(
            jax.vmap(
                jax.grad(
                    lambda a: jnp.sum(
                        jnp.sin(jnp.linalg.cholesky(a + 1e-6 * jnp.eye(12)))
                    )
                )
            )(A)
        )
        assert np.allclose(got, ref, rtol=2e-4, atol=2e-5)

    def test_vmapped_escalation_isolates_elements(self):
        """One singular matrix in the vmapped batch escalates ITS jitter
        without disturbing the well-conditioned elements."""
        A = _spd(8, seed=2, batch=3)
        A[1] = np.ones((8, 8), np.float32)  # rank-1: needs escalation
        L = np.asarray(jax.vmap(lambda a: safe_cholesky(a, 1e-6))(jnp.asarray(A)))
        assert np.isfinite(L).all()
        for i in (0, 2):
            ref = np.linalg.cholesky(A[i] + 1e-6 * np.eye(8))
            assert np.allclose(L[i], ref, atol=1e-4 * np.abs(ref).max())

    def test_grad_through_vmapped_escalation(self):
        A = jnp.asarray(_spd(8, seed=4, batch=2))
        g = jax.grad(
            lambda a: jnp.sum(jax.vmap(lambda x: safe_cholesky(x, 1e-6))(a))
        )(A)
        assert np.isfinite(np.asarray(g)).all()
