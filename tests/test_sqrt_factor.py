"""The square-root curvature factor (VERDICT r4 #1's engine core):
shifted CholeskyQR2 over G with R^T R = I + G^T G
(`inference/laplace._sqrt_gram_factor` / `logdet_sqrt_gram` / `_sqrt_solve`).

Pins the contract at ADVERSARIAL conditioning — exactly the regime where
the f32-built normal matrix loses its unit eigenvalue floor (the round-4
multiclass NaN): a rank-deficient-ish tall G scaled so lambda_max(H) ~ 1e5
while lambda_min stays at the unit floor. Gates vs float64 numpy.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from henbun_tpu.inference.laplace import (
    _sqrt_gram_factor,
    _sqrt_solve,
    logdet_sqrt_gram,
)


def _hard_G(n=4000, p=96, scale=200.0, seed=0):
    """Tall G with strongly correlated columns (RBF-like) and a large
    scale: H = I + G^T G has lambda_max ~ scale^2 and a cluster of
    eigenvalues AT the unit floor."""
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(-1, 1, n))
    z = np.linspace(-1, 1, p)
    G64 = np.exp(-0.5 * (x[:, None] - z[None, :]) ** 2 / 0.15**2) * (
        scale / np.sqrt(n)
    )
    return G64


class TestSqrtGramFactor:
    def test_factor_and_logdet_vs_float64(self):
        G64 = _hard_G()
        H64 = np.eye(G64.shape[1]) + G64.T @ G64
        ld_true = np.linalg.slogdet(H64)[1]
        lam = np.linalg.eigvalsh(H64)
        assert lam.max() > 1e4 and lam.min() < 1.0 + 1e-6  # the hard regime

        G = jnp.asarray(G64.astype(np.float32))
        R = np.asarray(_sqrt_gram_factor(G), np.float64)
        # R^T R reproduces H (the shift cancels in pass 2)
        rel = np.abs(R.T @ R - H64).max() / np.abs(H64).max()
        assert rel < 1e-5
        # upper-triangular with positive diagonal
        assert np.abs(np.tril(R, -1)).max() == 0.0
        assert np.diag(R).min() > 0
        ld = float(logdet_sqrt_gram(G))
        assert abs(ld - ld_true) / abs(ld_true) < 1e-4
        # the f32 normal-matrix route is MATERIALLY worse on the same data
        # (this is the reason the engine exists)
        Hf32 = np.eye(G64.shape[1], dtype=np.float32) + (
            G64.astype(np.float32).T @ G64.astype(np.float32)
        )
        sign, ld_naive = np.linalg.slogdet(Hf32.astype(np.float64))
        assert abs(ld - ld_true) < 0.5 * abs(ld_naive - ld_true) + 1e-6

    def test_solve_vs_float64(self):
        G64 = _hard_G(seed=1)
        H64 = np.eye(G64.shape[1]) + G64.T @ G64
        b = np.random.default_rng(2).standard_normal((G64.shape[1], 1))
        x64 = np.linalg.solve(H64, b)
        G = jnp.asarray(G64.astype(np.float32))
        R = _sqrt_gram_factor(G)
        xs = np.asarray(
            _sqrt_solve(R, jnp.asarray(b.astype(np.float32))), np.float64
        )
        assert np.linalg.norm(xs - x64) / np.linalg.norm(x64) < 1e-3

    def test_logdet_gradient_identity(self):
        """The custom VJP is the exact identity d logdet = <2 G H^-1, dG>;
        gate against float64 finite differences along a random direction."""
        G64 = _hard_G(n=600, p=32, scale=40.0, seed=3)
        V = np.random.default_rng(4).standard_normal(G64.shape)

        def ld64(Gm):
            H = np.eye(Gm.shape[1]) + Gm.T @ Gm
            return np.linalg.slogdet(H)[1]

        eps = 1e-5
        d_true = (ld64(G64 + eps * V) - ld64(G64 - eps * V)) / (2 * eps)
        g = jax.grad(lambda Gm: logdet_sqrt_gram(Gm))(
            jnp.asarray(G64.astype(np.float32))
        )
        d_hat = float(jnp.sum(g * jnp.asarray(V.astype(np.float32))))
        assert abs(d_hat - d_true) / max(abs(d_true), 1e-9) < 2e-3
