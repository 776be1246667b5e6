"""Laplace approximation for GP models with non-Gaussian likelihoods.

A deterministic alternative to the quadrature ELBOs (`ops/quadrature.py`)
and the MC ELBOs for heavy-tailed / non-conjugate likelihoods: find the
posterior MODE of the whitened latent by Newton iteration and approximate
the posterior by the Gaussian with the mode's curvature (GPML ch. 3.4,
PAPERS.md). Everything is a single XLA program: the Newton loop is a
`lax.scan` with a STATIC trip count (TPU-friendly — no data-dependent
control flow under jit), each iteration one `safe_cholesky` + two
triangular solves, and hyperparameter gradients flow by plain reverse-mode
through the unrolled iterations (at a converged mode this equals the
implicit-function-theorem gradient, third-derivative terms included —
GPML eq. 5.22-5.23 hand-derives what autodiff gets for free here).

Whitened formulation (matches the library's GP parameterization,
`models/gpr.py`): f = Lk v with v ~ N(0, I) and Lk the (scaled) Cholesky
of the kernel gram. The mode maximizes

    psi(v) = sum_i loglik_i((Lk v)_i) - 0.5 v^T v

via damped saddle-free Newton steps solving (I + Lk^T |W| Lk) d = grad psi
with W = -d2 loglik / df^2: heavy-tailed likelihoods (Student-t) are not
log-concave, and the |W| regularization keeps the solve PD with the RIGHT
step scale in negative-curvature regions (clamping W to zero instead makes
those coordinates raw gradient steps, which overshoot and stall the line
search — measured: clamped-W never moved off v=0 on the robust-GPR
workload, |W| converges |grad psi| 92 -> 4e-3 in ~12 iterations). Each
iteration tries step sizes (1, 0.3, 0.1, 0.03) and keeps the best psi —
select-based, so the whole loop stays vectorizable straight-line TPU code.
The FINAL evidence and covariance use the TRUE W at the mode (the actual
Laplace curvature — PD there in practice even when individual W_i < 0;
safe_cholesky escalates if a pathological case is not).

The reference has no Laplace machinery at all (its only non-Gaussian
treatment is the MC Student-t ELBO, GaussianProcess.ipynb cells 28-31);
this is a north-star addition.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.linalg import matmul_hp, safe_cholesky


class LaplaceResult(NamedTuple):
    """Mode and curvature of p(v | y) for f = Lk v, v ~ N(0, I).

    log_marginal is the Laplace evidence approximation
    log q(y) = psi(v*) - 0.5 log|I + Lk^T W Lk|; f_mode/f_var are the
    latent's posterior mode and marginal variances at the training inputs;
    grad_norm is |grad psi(v*)| (a convergence diagnostic — should be ~0).
    """

    v_mode: jax.Array
    f_mode: jax.Array
    f_var: jax.Array
    log_marginal: jax.Array
    grad_norm: jax.Array


def _psi_parts(loglik_fn, Lk, v):
    f = matmul_hp(Lk, v)
    ll = jnp.sum(loglik_fn(f))
    return ll - 0.5 * jnp.sum(v * v), f


def laplace_whitened(loglik_fn, Lk, newton_iters=15, jitter=1e-6):
    """Laplace approximation of the latent posterior for f = Lk v.

    loglik_fn: f [n, 1] -> elementwise log-likelihood [n, 1] (twice
    differentiable; summed internally). Lk: [n, n] lower factor of the
    (scaled) prior covariance, i.e. cov(f) = Lk Lk^T.

    Returns a :class:`LaplaceResult`. Differentiable w.r.t. everything
    `loglik_fn` and `Lk` close over (kernel hyperparameters, likelihood
    scales) by reverse-mode through the unrolled Newton loop.
    """
    n = Lk.shape[-1]
    I = jnp.eye(n, dtype=Lk.dtype)

    def ll_sum(f):
        return jnp.sum(loglik_fn(f))

    grad_f = jax.grad(ll_sum)

    # second derivative of the elementwise log-likelihood via two grads of
    # the summed objective: d2/df2 is diagonal because the likelihood
    # factorizes over datapoints, so grad-of-sum-of-grads recovers it exactly
    def curvature(f):
        def g_sum(x):
            return jnp.sum(jax.grad(ll_sum)(x))

        return -jax.grad(g_sum)(f)  # [n, 1] = -d2 loglik / df^2

    def step(v, _):
        psi0, f = _psi_parts(loglik_fn, Lk, v)
        g = grad_f(f)
        W = jnp.abs(curvature(f))  # saddle-free: PD with the right scale
        grad_psi = matmul_hp(jnp.swapaxes(Lk, -1, -2), g) - v  # [n, 1]
        # B = I + Lk^T |W| Lk, PD by construction
        WLk = W * Lk  # rows scaled: (W Lk)_ij = W_i Lk_ij
        B = I + matmul_hp(jnp.swapaxes(Lk, -1, -2), WLk)
        Lb = safe_cholesky(B, jitter)
        half = jax.scipy.linalg.solve_triangular(Lb, grad_psi, lower=True)
        d = jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(Lb, -1, -2), half, lower=False
        )
        # damped step: keep the best psi among the ladder — select-based so
        # the scan body is straight-line code
        best_v, best_psi = v, psi0
        for alpha in (1.0, 0.3, 0.1, 0.03):
            v_try = v + alpha * d
            psi_try, _ = _psi_parts(loglik_fn, Lk, v_try)
            take = psi_try > best_psi
            best_v = jnp.where(take, v_try, best_v)
            best_psi = jnp.where(take, psi_try, best_psi)
        return best_v, None

    v0 = jnp.zeros((n, 1), Lk.dtype)
    v_star, _ = jax.lax.scan(step, v0, None, length=newton_iters)

    psi, f_star = _psi_parts(loglik_fn, Lk, v_star)
    g = grad_f(f_star)
    # TRUE curvature at the mode for the evidence and covariance
    W = curvature(f_star)
    grad_psi = matmul_hp(jnp.swapaxes(Lk, -1, -2), g) - v_star
    WLk = W * Lk
    B = I + matmul_hp(jnp.swapaxes(Lk, -1, -2), WLk)
    Lb = safe_cholesky(B, jitter)
    # log|B| from the factor's diagonal
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lb, axis1=-2, axis2=-1)))
    log_marginal = psi - 0.5 * logdet
    # posterior covariance of v is B^-1; of f is Lk B^-1 Lk^T — marginals
    # via one triangular solve: (Lk B^-1 Lk^T)_ii = ||Lb^-1 Lk^T||_col_i^2
    V = jax.scipy.linalg.solve_triangular(
        Lb, jnp.swapaxes(Lk, -1, -2), lower=True
    )  # [n, n]
    f_var = jnp.sum(jnp.square(V), axis=0)[:, None]  # [n, 1]
    return LaplaceResult(
        v_mode=v_star,
        f_mode=f_star,
        f_var=f_var,
        log_marginal=log_marginal,
        grad_norm=jnp.linalg.norm(grad_psi),
    )


def laplace_latent_marginals(loglik_fn, Lk, res, Ks, kdiag, jitter=1e-6):
    """Predictive latent marginals (mean [n*, 1], var [n*, 1]) at new inputs
    under a Laplace posterior.

    res: a :class:`LaplaceResult` for (loglik_fn, Lk); Ks: prior cross
    covariance cov(f, f*) [n, n*]; kdiag: prior variances at the new inputs
    [n*]. With A = Lk^-1 Ks and B = I + Lk^T W Lk (W the true mode
    curvature):

        E[f*] = A^T v_mode
        V[f*] = kdiag - colnorm(A)^2 + colnorm(Lb^-1 A)^2

    (prior minus the conditioning gain plus the posterior-of-v part).
    Shared by `GPR.predict_f_laplace` and `GPC.predict_p`.
    """
    from ..ops.linalg import safe_cholesky, tri_solve

    n = Lk.shape[-1]
    I = jnp.eye(n, dtype=Lk.dtype)
    A = tri_solve(Lk, Ks)  # [n, n*]
    mean = matmul_hp(jnp.swapaxes(A, -1, -2), res.v_mode)  # [n*, 1]

    def ll_sum(f):
        return jnp.sum(loglik_fn(f))

    W = -jax.grad(lambda x: jnp.sum(jax.grad(ll_sum)(x)))(res.f_mode)
    B = I + matmul_hp(jnp.swapaxes(Lk, -1, -2), W * Lk)
    Lb = safe_cholesky(B, jitter)
    G = tri_solve(Lb, A)
    var = (
        kdiag - jnp.sum(jnp.square(A), axis=0) + jnp.sum(jnp.square(G), axis=0)
    )[:, None]
    return mean, var
