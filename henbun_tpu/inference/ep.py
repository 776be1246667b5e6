"""Expectation propagation for GP models with factorizing likelihoods.

The third deterministic inference engine next to the quadrature ELBOs
(`ops/quadrature.py`) and the Laplace approximation (`inference/laplace.py`):
approximate each non-Gaussian likelihood factor by a Gaussian *site*
t_i(f_i) = exp(nu_i f_i - tau_i f_i^2 / 2) whose moments match the tilted
distribution cavity x likelihood (GPML ch. 3.6, PAPERS.md). EP's predictive
marginals are the accuracy reference for binary GP classification (better
than Laplace, which underestimates the mean shift at the mode).

TPU-first design: PARALLEL EP — every site updates simultaneously from the
current posterior marginals each sweep (one [n] quadrature batch + rank-n
refresh), not the reference textbooks' sequential site loop with rank-1
updates. A sequential loop is n data-dependent small updates per sweep
(hostile to XLA); the parallel sweep is one Cholesky of
B = I + sqrtW K sqrtW plus two triangular solves — MXU-dense, a static
`lax.scan` trip count, and batched traces dispatch the factorization/solves
to the Pallas kernels (`ops/linalg.py`). Parallel EP needs damping to
converge (default 0.5, standard); the returned `delta` diagnostic is the
last sweep's max site-parameter change.

Tilted moments are Gauss-Hermite (ops/quadrature nodes) in log-space:
logZ_hat = logsumexp(log w + loglik(f)), moments from the softmax weights —
exact-enough for any smooth likelihood at deg=20 and fully vectorized over
sites. Negative incoming site precisions (possible for non-log-concave
likelihoods like Student-t) are clipped at 0: the site degrades to flat
rather than destabilizing B.

The evidence uses the natural-parameter form (derived from the site
normalizers, singularity-free at tau=0):

    log Z_EP = sum_i [ log Zhat_i + 0.5 log((tau_c + tau)/tau_c)
                       - (nu_c + nu)^2 / (2 (tau_c + tau))
                       + nu_c^2 / (2 tau_c) ]
               - 0.5 log|B| + 0.5 nu^T Sigma nu

Everything is jnp under a static scan, so hyperparameter gradients flow by
reverse-mode through the unrolled sweeps (like `implicit_diff=False`
Laplace). The reference has no EP machinery at all; north-star addition.

Two engines share the sweep: :func:`ep_gp` on an exact [n, n] prior and
:func:`ep_gp_projected` on the rank-m inducing-point prior f = A v (every
factorization m x m — EP at n >= 1e5, `models.SparseGPC`). Training-time
convergence guards report the MEAN |site change| (the evidence is a sum
over sites, so gradient bias scales with the aggregate residual; the max
in `EPResult.delta` picks single f32 tail oscillators at large n —
measured n=1e5: max hovers 0.02-0.07 while the evidence is stable to 1e-6
relative and the mean sits at ~1e-3).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .._settings import settings
from ..core import context as _ctx
from ..ops.linalg import matmul_hp, safe_cholesky, tri_solve
from ..ops.quadrature import _nodes


class EPResult(NamedTuple):
    """Converged (or `sweeps`-swept) EP posterior.

    f_mean/f_var: posterior latent marginals at the training inputs [n, 1];
    log_marginal: the EP evidence approximation; nu/tau: site natural
    parameters [n] (feed to :func:`ep_latent_marginals` for prediction);
    delta: max |site change| in the final sweep — a convergence diagnostic,
    should be ~0 (parallel EP with damping typically reaches <1e-4 in
    20-30 sweeps on log-concave likelihoods)."""

    f_mean: jax.Array
    f_var: jax.Array
    log_marginal: jax.Array
    nu: jax.Array
    tau: jax.Array
    delta: jax.Array


def _posterior_from_sites(K, nu, tau, jitter):
    """Stable posterior given sites: B = I + sqrtW K sqrtW (GPML 3.26/3.43
    generalized to natural parameters). Returns (mu [n], diagSigma [n], Lb)."""
    n = K.shape[-1]
    I = jnp.eye(n, dtype=K.dtype)
    # tiny epsilon: clipped tau=0 sites (non-log-concave likelihoods) would
    # otherwise put sqrt's infinite derivative into evidence gradients
    sw = jnp.sqrt(tau + 1e-12)
    B = I + sw[:, None] * K * sw[None, :]
    Lb = safe_cholesky(B, jitter)
    # Sigma = K - K sw B^-1 sw K;  V = Lb^-1 (sw K)
    V = tri_solve(Lb, sw[:, None] * K)
    diagSigma = jnp.diagonal(K, axis1=-2, axis2=-1) - jnp.sum(
        jnp.square(V), axis=0
    )
    mu = matmul_hp(K, nu[:, None])[:, 0] - matmul_hp(
        jnp.swapaxes(V, -1, -2), matmul_hp(V, nu[:, None])
    )[:, 0]
    return mu, diagSigma, Lb


def _tilted_moments(loglik_fn, m_c, v_c, deg):
    """Gauss-Hermite moments of the tilted distribution
    cavity N(m_c, v_c) x exp(loglik) per site, in log-space.

    Returns (logZ_hat, m_hat, v_hat), each [n]."""
    x, w = _nodes(int(deg))
    dtype = m_c.dtype
    x = jnp.asarray(x, dtype)
    logw = jnp.log(jnp.asarray(w, dtype))
    f = m_c[:, None] + jnp.sqrt(2.0 * v_c)[:, None] * x  # [n, deg]
    ll = loglik_fn(f)  # [n, deg] elementwise log-likelihood
    a = logw + ll
    logZ = jax.scipy.special.logsumexp(a, axis=-1)
    p = jax.nn.softmax(a, axis=-1)
    m_hat = jnp.sum(p * f, axis=-1)
    # centered second moment: the E[f^2] - m^2 form cancels catastrophically
    # in f32 when a floored cavity puts m_c ~ 1e5
    v_hat = jnp.sum(p * jnp.square(f - m_hat[:, None]), axis=-1)
    return logZ, m_hat, v_hat


def ep_gp(loglik_fn, K, sweeps=30, damping=0.5, jitter=None, deg=20,
          tau_cav_floor=1e-6, implicit_diff=True, delta_tol=1e-2):
    """Parallel EP for f ~ N(0, K) with factorizing likelihood.

    loglik_fn: f [n, deg] -> elementwise log-likelihood [n, deg] (close over
    the observations with a trailing broadcast axis, like the quadrature
    ELBOs do). K: [n, n] prior covariance (scale it by the kernel variance
    BEFORE calling). Returns :class:`EPResult`.

    Differentiable w.r.t. everything `loglik_fn` and `K` close over. By
    default via the EP STATIONARITY property (GPML sec. 5.5.2): at the EP
    fixed point log Z_EP is stationary in the site parameters, so the exact
    hyperparameter gradient is the partial derivative with the sites held
    fixed — implemented by stop_gradient on the converged (nu, tau), which
    makes the backward pay ONE final posterior/evidence section instead of
    reverse-mode through all `sweeps` unrolled sweeps. The premise is
    convergence: check `delta` ~ 0 (a test pins implicit-vs-unrolled
    gradient agreement on a converged classification fit). When called
    inside a TRAINING trace, the premise is enforced: `delta` is reported
    to the Optimizer, which logs it per chunk and aborts when it exceeds
    `delta_tol` (see `core.context.report_diagnostic`).
    `implicit_diff=False` differentiates through the unrolled sweeps.
    """
    if jitter is None:
        jitter = settings.numerics.jitter_level
    n = K.shape[-1]
    dtype = K.dtype

    def cavity(mu, sig2, nu, tau):
        """Natural-parameter cavity with a CONSISTENT precision floor: when
        1/sig2 - tau falls below the floor (possible for non-log-concave
        likelihoods whose site precision transiently reaches the marginal's),
        zero nu_c too — a flat cavity, not one with precision 1e-6 and an
        unadjusted O(0.1) shift whose mean m_c = nu_c/tau_c ~ 1e5 wrecks the
        f32 tilted moments and puts ~nu_c^2/(2 tau_c) ~ 1e9 into the
        evidence's site terms."""
        raw = 1.0 / sig2 - tau
        clamped = raw < tau_cav_floor
        tau_c = jnp.where(clamped, tau_cav_floor, raw)
        nu_c = jnp.where(clamped, 0.0, mu / sig2 - nu)
        return tau_c, nu_c

    def sweep(carry, _):
        nu, tau = carry
        mu, sig2, _ = _posterior_from_sites(K, nu, tau, jitter)
        sig2 = jnp.maximum(sig2, 1e-10)
        tau_c, nu_c = cavity(mu, sig2, nu, tau)
        m_c = nu_c / tau_c
        v_c = 1.0 / tau_c
        _, m_hat, v_hat = _tilted_moments(loglik_fn, m_c, v_c, deg)
        v_hat = jnp.maximum(v_hat, 1e-10)
        tau_new = jnp.maximum(1.0 / v_hat - tau_c, 0.0)
        nu_new = m_hat / v_hat - nu_c
        nu_new = jnp.where(tau_new > 0.0, nu_new, 0.0)
        d = jnp.maximum(
            jnp.max(jnp.abs(tau_new - tau)), jnp.max(jnp.abs(nu_new - nu))
        )
        # the GUARD metric is the MEAN |site change|: the evidence is a sum
        # over sites, so the stationarity-gradient bias scales with the
        # aggregate residual — max-over-sites picks single f32 tail
        # oscillators at large n (measured n=1e5: max 0.02-0.07 forever
        # while the evidence is stable to 1e-6 relative and the mean sits
        # at ~1e-4). EPResult.delta keeps the strict max.
        d_mean = jnp.maximum(
            jnp.mean(jnp.abs(tau_new - tau)), jnp.mean(jnp.abs(nu_new - nu))
        )
        nu = (1.0 - damping) * nu + damping * nu_new
        tau = (1.0 - damping) * tau + damping * tau_new
        return (nu, tau), (d, d_mean)

    nu0 = jnp.zeros((n,), dtype)
    tau0 = jnp.zeros((n,), dtype)
    (nu, tau), (deltas, deltas_mean) = jax.lax.scan(
        sweep, (nu0, tau0), None, length=int(sweeps)
    )
    if implicit_diff:
        nu = jax.lax.stop_gradient(nu)
        tau = jax.lax.stop_gradient(tau)
        # the stationarity gradient is only exact AT the fixed point — a
        # training run whose sweeps don't converge gets silently biased
        # gradients. Surface the residual to the Optimizer, which records it
        # in StepMetrics and aborts past delta_tol with the remedy named
        # (context.report_diagnostic; test_ep pins the trip).
        ctx = _ctx.current()
        if ctx is not None:
            ctx.report_diagnostic(
                "ep_delta",
                deltas_mean[-1],
                guard_tol=delta_tol,
                hint=(
                    " EP's fixed-point (implicit_diff) gradient assumes the"
                    " sweeps CONVERGED; this run's last-sweep site change"
                    " exceeded delta_tol, so evidence gradients are biased."
                    " Raise sweeps, lower damping (non-log-concave"
                    " likelihoods often need <=0.3), raise delta_tol if the"
                    " residual is acceptable, or pass implicit_diff=False"
                    " to differentiate through the unrolled sweeps."
                ),
            )

    # final posterior + evidence from the converged sites
    mu, sig2, Lb = _posterior_from_sites(K, nu, tau, jitter)
    sig2 = jnp.maximum(sig2, 1e-10)
    tau_c, nu_c = cavity(mu, sig2, nu, tau)
    m_c = nu_c / tau_c
    v_c = 1.0 / tau_c
    logZ_hat, _, _ = _tilted_moments(loglik_fn, m_c, v_c, deg)
    # site-normalizer sum (see module docstring; singularity-free at tau=0)
    site_terms = (
        logZ_hat
        + 0.5 * jnp.log((tau_c + tau) / tau_c)
        - jnp.square(nu_c + nu) / (2.0 * (tau_c + tau))
        + jnp.square(nu_c) / (2.0 * tau_c)
    )
    logdetB = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lb, axis1=-2, axis2=-1)))
    log_marginal = (
        jnp.sum(site_terms) - 0.5 * logdetB + 0.5 * jnp.sum(nu * mu)
    )
    return EPResult(
        f_mean=mu[:, None],
        f_var=sig2[:, None],
        log_marginal=log_marginal,
        nu=nu,
        tau=tau,
        delta=deltas[-1],
    )


def ep_gp_projected(loglik_fn, A, sweeps=30, damping=0.5, jitter=None,
                    deg=20, tau_cav_floor=1e-6, implicit_diff=True,
                    delta_tol=1e-2):
    """Parallel EP for the PROJECTED (inducing-point) prior f = A v,
    v ~ N(0, I_m), A [n, m] — the sparse counterpart of :func:`ep_gp`.

    Identical moment-matching algebra with the rank-m prior K = A A^T: the
    per-sweep posterior refresh factorizes the m x m precision
    P = I + A^T T A (Sylvester: log|I_n + sqrtT K sqrtT| = log|P|, and
    nu^T Sigma_f nu = (A^T nu)^T P^-1 (A^T nu), so the natural-parameter
    evidence formula carries over EXACTLY — with z = X this reproduces
    ep_gp to float precision, pinned by a test). Cost per sweep:
    O(n m^2 + m^3) instead of O(n^3), so deterministic EP training,
    evidence and marginals reach n >= 1e5. Same convergence diagnostic
    and training guard as ep_gp.

    Returns an :class:`EPResult`; ``f_mean``/``f_var`` are the TRAINING
    marginals under the DTC-projected prior (no residual variance — add
    the FITC diagonal downstream for prediction, as
    ``SparseGPC.predict_p_ep`` does).
    """
    if jitter is None:
        jitter = settings.numerics.jitter_level
    n, m = A.shape[-2], A.shape[-1]
    dtype = A.dtype
    Im = jnp.eye(m, dtype=dtype)
    AT = jnp.swapaxes(A, -1, -2)

    def posterior(nu, tau):
        """(mu [n], sig2 [n], Lp [m, m]) from the m-dim representation."""
        from .laplace import _with_floor

        P = Im + matmul_hp(AT * tau[None, :], A)
        Lp = safe_cholesky(_with_floor(P, jitter), jitter)
        V = tri_solve(Lp, AT)  # [m, n]; sig2_i = colnorm^2
        sig2 = jnp.sum(jnp.square(V), axis=0)
        b = matmul_hp(AT, nu[:, None])  # [m, 1]
        half = tri_solve(Lp, b)
        mu = matmul_hp(jnp.swapaxes(V, -1, -2), half)[:, 0]
        return mu, sig2, Lp, half

    def cavity(mu, sig2, nu, tau):
        raw = 1.0 / sig2 - tau
        clamped = raw < tau_cav_floor
        tau_c = jnp.where(clamped, tau_cav_floor, raw)
        nu_c = jnp.where(clamped, 0.0, mu / sig2 - nu)
        return tau_c, nu_c

    def sweep(carry, _):
        nu, tau = carry
        mu, sig2, _, _ = posterior(nu, tau)
        sig2 = jnp.maximum(sig2, 1e-10)
        tau_c, nu_c = cavity(mu, sig2, nu, tau)
        _, m_hat, v_hat = _tilted_moments(
            loglik_fn, nu_c / tau_c, 1.0 / tau_c, deg
        )
        v_hat = jnp.maximum(v_hat, 1e-10)
        tau_new = jnp.maximum(1.0 / v_hat - tau_c, 0.0)
        nu_new = m_hat / v_hat - nu_c
        nu_new = jnp.where(tau_new > 0.0, nu_new, 0.0)
        d = jnp.maximum(
            jnp.max(jnp.abs(tau_new - tau)), jnp.max(jnp.abs(nu_new - nu))
        )
        # guard on the MEAN |site change| (see ep_gp: bias scales with the
        # aggregate residual; max picks f32 tail oscillators at n >= 1e5)
        d_mean = jnp.maximum(
            jnp.mean(jnp.abs(tau_new - tau)), jnp.mean(jnp.abs(nu_new - nu))
        )
        nu = (1.0 - damping) * nu + damping * nu_new
        tau = (1.0 - damping) * tau + damping * tau_new
        return (nu, tau), (d, d_mean)

    nu0 = jnp.zeros((n,), dtype)
    tau0 = jnp.zeros((n,), dtype)
    (nu, tau), (deltas, deltas_mean) = jax.lax.scan(
        sweep, (nu0, tau0), None, length=int(sweeps)
    )
    if implicit_diff:
        nu = jax.lax.stop_gradient(nu)
        tau = jax.lax.stop_gradient(tau)
        ctx = _ctx.current()
        if ctx is not None:
            ctx.report_diagnostic(
                "ep_delta",
                deltas_mean[-1],
                guard_tol=delta_tol,
                hint=(
                    " EP's fixed-point (implicit_diff) gradient assumes the"
                    " sweeps CONVERGED; this run's last-sweep site change"
                    " exceeded delta_tol, so evidence gradients are biased."
                    " Raise sweeps, lower damping, raise delta_tol if the"
                    " residual is acceptable, or pass implicit_diff=False."
                ),
            )

    mu, sig2, Lp, half = posterior(nu, tau)
    sig2 = jnp.maximum(sig2, 1e-10)
    tau_c, nu_c = cavity(mu, sig2, nu, tau)
    logZ_hat, _, _ = _tilted_moments(
        loglik_fn, nu_c / tau_c, 1.0 / tau_c, deg
    )
    site_terms = (
        logZ_hat
        + 0.5 * jnp.log((tau_c + tau) / tau_c)
        - jnp.square(nu_c + nu) / (2.0 * (tau_c + tau))
        + jnp.square(nu_c) / (2.0 * tau_c)
    )
    logdetP = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lp, axis1=-2, axis2=-1)))
    # 0.5 nu^T Sigma_f nu = 0.5 ||Lp^-1 A^T nu||^2
    log_marginal = (
        jnp.sum(site_terms) - 0.5 * logdetP + 0.5 * jnp.sum(jnp.square(half))
    )
    return EPResult(
        f_mean=mu[:, None],
        f_var=sig2[:, None],
        log_marginal=log_marginal,
        nu=nu,
        tau=tau,
        delta=deltas[-1],
    )


def ep_projected_marginals(res, A, Astar, corr_diag, jitter=None):
    """Predictive latent marginals (mean [n*, 1], var [n*, 1]) at new inputs
    under a PROJECTED EP posterior `res` for f = A v (see
    :func:`ep_gp_projected`). Astar [n*, m] is the projection at the new
    inputs; corr_diag [n*] restores the residual (FITC) prior variance.

        E[f*] = Astar P^-1 A^T nu,  V[f*] = colnorm(Lp^-1 Astar^T)^2 + corr
    """
    if jitter is None:
        jitter = settings.numerics.jitter_level
    m = A.shape[-1]
    Im = jnp.eye(m, dtype=A.dtype)
    AT = jnp.swapaxes(A, -1, -2)
    from .laplace import _with_floor

    P = Im + matmul_hp(AT * res.tau[None, :], A)
    Lp = safe_cholesky(_with_floor(P, jitter), jitter)
    b = matmul_hp(AT, res.nu[:, None])
    half = tri_solve(Lp, b)  # [m, 1]
    G = tri_solve(Lp, jnp.swapaxes(Astar, -1, -2))  # [m, n*]
    mean = matmul_hp(jnp.swapaxes(G, -1, -2), half)  # [n*, 1]
    var = (jnp.sum(jnp.square(G), axis=0) + corr_diag)[:, None]
    return mean, var


def ep_latent_marginals(res, K, Ks, kdiag, jitter=None):
    """Predictive latent marginals (mean [n*, 1], var [n*, 1]) at new inputs
    under the EP posterior `res` for prior cov K (GPML 3.60-3.61 in natural
    parameters):

        E[f*]  = Ks^T (nu - sqrtW B^-1 sqrtW K nu)
        V[f*]  = kdiag - colnorm(Lb^-1 sqrtW Ks)^2

    Ks: cross covariance cov(f, f*) [n, n*]; kdiag: prior variances at the
    new inputs [n*]. Variances are clamped at 0 (f32 cancellation at
    near-duplicate inputs, same guard as `laplace_latent_marginals`)."""
    if jitter is None:
        jitter = settings.numerics.jitter_level
    n = K.shape[-1]
    I = jnp.eye(n, dtype=K.dtype)
    sw = jnp.sqrt(res.tau + 1e-12)
    B = I + sw[:, None] * K * sw[None, :]
    Lb = safe_cholesky(B, jitter)
    Knu = matmul_hp(K, res.nu[:, None])
    z = tri_solve(Lb, sw[:, None] * Knu)
    from ..ops.linalg import _tri_solve_T_dispatch

    half = tri_solve(Lb, sw[:, None] * Ks)  # [n, n*]
    # L^T solve through the dispatch so batched traces take the Pallas
    # kernel, like the forward solves above and laplace's _newton_mode_bwd
    alpha = res.nu[:, None] - sw[:, None] * _tri_solve_T_dispatch(Lb, z)
    mean = matmul_hp(jnp.swapaxes(Ks, -1, -2), alpha)  # [n*, 1]
    var = jnp.maximum(kdiag - jnp.sum(jnp.square(half), axis=0), 0.0)[:, None]
    return mean, var
