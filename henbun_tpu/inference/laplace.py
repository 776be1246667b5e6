"""Laplace approximation for GP models with non-Gaussian likelihoods.

A deterministic alternative to the quadrature ELBOs (`ops/quadrature.py`)
and the MC ELBOs for heavy-tailed / non-conjugate likelihoods: find the
posterior MODE of the whitened latent by Newton iteration and approximate
the posterior by the Gaussian with the mode's curvature (GPML ch. 3.4,
PAPERS.md). Everything is a single XLA program: the Newton loop is a
`lax.scan` with a STATIC trip count (TPU-friendly — no data-dependent
control flow under jit), each iteration one `safe_cholesky` + two
triangular solves, and hyperparameter gradients come from the implicit
function theorem at the mode (one extra factorization in the backward;
GPML eq. 5.22-5.23's third-derivative terms fall out of the vjp of the
fixed-point map automatically). `implicit_diff=False` differentiates
through the unrolled iterations instead — the two agree at convergence,
pinned by a test.

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

import functools
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


def _ll_sum(loglik_fn):
    return lambda f: jnp.sum(loglik_fn(f))


def _grad_and_curvature(loglik_fn, f):
    """(d loglik / df, -d2 loglik / df^2), both [n, 1], in ONE
    forward-over-reverse pass: the likelihood factorizes over datapoints,
    so its Hessian is diagonal and the Hessian-times-ones JVP of the
    gradient IS the diagonal — half the AD passes of grad-of-sum-of-grads
    plus a separate gradient call (kernel count matters in the batched
    evidence scan, docs/PERF.md §Laplace)."""
    grad_f = jax.grad(_ll_sum(loglik_fn))
    g, hv = jax.jvp(grad_f, (f,), (jnp.ones_like(f),))
    return g, -hv


def _curvature(loglik_fn, f):
    """-d2 loglik / df^2, [n, 1]."""
    return _grad_and_curvature(loglik_fn, f)[1]


def _newton_iterations(loglik_fn, Lk, newton_iters, jitter):
    """The damped saddle-free Newton scan; returns v_star [n, 1]."""
    n = Lk.shape[-1]
    I = jnp.eye(n, dtype=Lk.dtype)

    def step(v, _):
        psi0, f = _psi_parts(loglik_fn, Lk, v)
        g, W_true = _grad_and_curvature(loglik_fn, f)
        W = jnp.abs(W_true)  # saddle-free: PD, right scale
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
        # the scan body is straight-line code. The FULL step is accepted on
        # a near-tie (tol ~ f32 resolution of psi): once psi improvements
        # drop below float32 noise, strict `>` acceptance stalls the
        # iteration at |grad psi| ~ 1e-2 forever, while the pure step
        # v <- v + B_abs^-1 grad psi is a contraction near the mode
        # (B_abs - B_true = Lk^T (|W| - W) Lk >= 0, so the fixed-point
        # Jacobian I - B_abs^-1 B_true has eigenvalues in [0, 1)) and
        # converges |grad psi| to ~1e-6. Smaller alphas must still STRICTLY
        # improve to override, so far-from-mode damping is unchanged.
        tie_tol = 1e-5 * (1.0 + jnp.abs(psi0))
        # all four trial points in ONE batched matmul + loglik evaluation:
        # a Python loop over alphas emitted 4 separate small kernels per
        # iteration, a material slice of the batched evidence step where
        # every kernel pays the fixed in-scan launch cost (docs/PERF.md
        # §Laplace)
        alphas = jnp.asarray((1.0, 0.3, 0.1, 0.03), Lk.dtype)
        V_try = v[None] + alphas[:, None, None] * d[None]  # [4, n, 1]
        F_try = matmul_hp(Lk, V_try)
        # vmap (not broadcasting) because the closure-converted likelihood
        # is shape-specialized to [n, 1]
        psis = jax.vmap(lambda ff: jnp.sum(loglik_fn(ff)))(
            F_try
        ) - 0.5 * jnp.sum(V_try * V_try, axis=(-2, -1))  # [4]
        best_v, best_psi = v, psi0
        for i in range(4):
            take = (
                psis[i] >= best_psi - tie_tol if i == 0 else psis[i] > best_psi
            )
            best_v = jnp.where(take, V_try[i], best_v)
            best_psi = jnp.where(take, psis[i], best_psi)
        return best_v, None

    v0 = jnp.zeros((n, 1), Lk.dtype)
    v_star, _ = jax.lax.scan(step, v0, None, length=newton_iters)
    return v_star


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _newton_mode_implicit(loglik_conv, newton_iters, jitter, Lk, consts):
    """Newton mode with IMPLICIT differentiation (the fixed point
    F(v) = Lk^T grad_loglik(Lk v) - v = 0 defines dv*/dtheta): the backward
    pays ONE factorization + two solves instead of reverse-mode through all
    newton_iters unrolled iterations — which issues ~7 small kernels per
    iteration and dominated batched evidence training (docs/PERF.md
    §Laplace). `loglik_conv(f, *consts)` is the closure-converted
    likelihood."""
    return _newton_iterations(
        lambda f: loglik_conv(f, *consts), Lk, newton_iters, jitter
    )


def _newton_mode_fwd(loglik_conv, newton_iters, jitter, Lk, consts):
    v = _newton_mode_implicit(loglik_conv, newton_iters, jitter, Lk, consts)
    return v, (Lk, consts, v)


def _newton_mode_bwd(loglik_conv, newton_iters, jitter, res, vbar):
    """Implicit-function-theorem VJP at the mode: dF/dv = -(I + Lk^T W Lk)
    = -B with the TRUE curvature W, so vbar^T dv*/da = w^T dF/da with
    B w = vbar (B symmetric PD at a genuine mode)."""
    from ..ops.linalg import _tri_solve_T_dispatch, tri_solve

    Lk, consts, v = res
    loglik_fn = lambda f: loglik_conv(f, *consts)
    f = matmul_hp(Lk, v)
    W = _curvature(loglik_fn, f)
    n = Lk.shape[-1]
    I = jnp.eye(n, dtype=Lk.dtype)
    B = I + matmul_hp(jnp.swapaxes(Lk, -1, -2), W * Lk)
    Lb = safe_cholesky(B, jitter)
    w = _tri_solve_T_dispatch(Lb, tri_solve(Lb, vbar))  # B^-1 vbar

    def F(Lk_, consts_):
        f_ = matmul_hp(Lk_, v)
        g_ = jax.grad(lambda ff: jnp.sum(loglik_conv(ff, *consts_)))(f_)
        return matmul_hp(jnp.swapaxes(Lk_, -1, -2), g_) - v

    _, vjpF = jax.vjp(F, Lk, consts)
    Lk_bar, consts_bar = vjpF(w)
    return Lk_bar, consts_bar


_newton_mode_implicit.defvjp(_newton_mode_fwd, _newton_mode_bwd)


def laplace_whitened(loglik_fn, Lk, newton_iters=15, jitter=1e-6,
                     implicit_diff=True):
    """Laplace approximation of the latent posterior for f = Lk v.

    loglik_fn: f [n, 1] -> elementwise log-likelihood [n, 1] (twice
    differentiable; summed internally). Lk: [n, n] lower factor of the
    (scaled) prior covariance, i.e. cov(f) = Lk Lk^T.

    Lk may also be RECTANGULAR [n, m] (any projection f = Lk v of a
    whitened m-dim latent v ~ N(0, I_m), cov(f) = Lk Lk^T of rank m): this
    is the inducing-point (DTC-projected) Laplace used by
    ``models.SparseGPC`` with Lk = sqrt(k_var) (Lm^-1 K(z, x))^T. Every
    factorization is then m x m — O(n m^2 + m^3) per Newton iteration
    instead of O(n^3), so deterministic non-Gaussian training and evidence
    reach n >= 1e5. v_mode/f_var come back sized [m, 1]/[n, 1]; predictive
    marginals via :func:`laplace_projected_marginals`.

    Returns a :class:`LaplaceResult`. Differentiable w.r.t. everything
    `loglik_fn` and `Lk` close over (kernel hyperparameters, likelihood
    scales): by the implicit function theorem at the mode by default
    (`implicit_diff=True` — one extra factorization in the backward), or by
    reverse-mode through the unrolled Newton loop (`implicit_diff=False`;
    the two agree once Newton has converged, and a test pins them to each
    other). Reverse-mode only, like the rest of the linear-algebra stack.

    The final evidence/covariance factorize B = I + Lk^T W Lk with the TRUE
    curvature W; for non-log-concave likelihoods B is only guaranteed PSD at
    a genuine mode, so a non-finite `log_marginal` together with a large
    `grad_norm` means Newton did not converge — check both diagnostics.
    """
    if implicit_diff:
        # shape[-2], not [-1]: rectangular projections (inducing-point
        # Laplace, A [n, m]) evaluate the likelihood at n points, not m
        loglik_conv, consts = jax.closure_convert(
            loglik_fn, jnp.zeros((Lk.shape[-2], 1), Lk.dtype)
        )
        v_star = _newton_mode_implicit(
            loglik_conv, int(newton_iters), float(jitter), Lk, tuple(consts)
        )
    else:
        v_star = _newton_iterations(loglik_fn, Lk, newton_iters, jitter)

    n = Lk.shape[-1]
    I = jnp.eye(n, dtype=Lk.dtype)
    psi, f_star = _psi_parts(loglik_fn, Lk, v_star)
    # gradient and TRUE curvature at the mode for the evidence/covariance
    g, W = _grad_and_curvature(loglik_fn, f_star)
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


def laplace_projected_marginals(loglik_fn, A, res, Astar, corr_diag,
                                jitter=1e-6):
    """Predictive latent marginals (mean [n*, 1], var [n*, 1]) under a
    RECTANGULAR (inducing-point) Laplace posterior.

    res: a :class:`LaplaceResult` from ``laplace_whitened(loglik_fn, A)``
    with A [n, m] (training projection); Astar [n*, m] is the same
    projection at the new inputs; corr_diag [n*] is the residual prior
    variance the projection can't express (the FITC/`_additional_cov`
    diagonal times the kernel variance — pass 0 for pure DTC). With the
    posterior over the whitened inducing latent q(v) = N(v_mode, B^-1),
    B = I_m + A^T W A at the TRUE mode curvature:

        E[f*] = Astar v_mode
        V[f*] = colnorm(Lb^-1 Astar^T)^2 + corr_diag

    All factorizations are m x m; cost O((n + n*) m^2 + m^3)."""
    from ..ops.linalg import tri_solve

    m = A.shape[-1]
    I = jnp.eye(m, dtype=A.dtype)
    mean = matmul_hp(Astar, res.v_mode)  # [n*, 1]
    W = _curvature(loglik_fn, res.f_mode)
    B = I + matmul_hp(jnp.swapaxes(A, -1, -2), W * A)
    Lb = safe_cholesky(B, jitter)
    G = tri_solve(Lb, jnp.swapaxes(Astar, -1, -2))  # [m, n*]
    var = (jnp.sum(jnp.square(G), axis=0) + corr_diag)[:, None]
    return mean, var


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

    Variances are clamped at 0: f32 cancellation between the three terms can
    go slightly negative at near-duplicate test/training inputs, which would
    NaN downstream sqrt's (GPC's Gauss-Hermite quadrature). Note B uses the
    TRUE curvature W, which for non-log-concave likelihoods (Student-t) can
    make B indefinite if `res` is not at a genuine mode — safe_cholesky's
    jitter escalation cannot restore PD then and the result is NaN; callers
    should check `res.grad_norm` is small (a genuine mode has PSD B) and
    `jnp.isfinite` on the outputs.
    """
    from ..ops.linalg import safe_cholesky, tri_solve

    n = Lk.shape[-1]
    I = jnp.eye(n, dtype=Lk.dtype)
    A = tri_solve(Lk, Ks)  # [n, n*]
    mean = matmul_hp(jnp.swapaxes(A, -1, -2), res.v_mode)  # [n*, 1]

    W = _curvature(loglik_fn, res.f_mode)
    B = I + matmul_hp(jnp.swapaxes(Lk, -1, -2), W * Lk)
    Lb = safe_cholesky(B, jitter)
    G = tri_solve(Lb, A)
    var = jnp.maximum(
        kdiag - jnp.sum(jnp.square(A), axis=0) + jnp.sum(jnp.square(G), axis=0),
        0.0,
    )[:, None]
    return mean, var
