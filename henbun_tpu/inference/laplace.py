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

from .._settings import settings
from ..ops.linalg import matmul_hp, safe_cholesky, tri_solve


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




def _floor_jitter(B, base=1e-6):
    """Scale-aware jitter for PD matrices of the form I + (PSD).

    Mathematically the unit floor keeps these PD, but the floor must be
    REPRESENTABLE next to the matrix's scale: at inducing-point evidence
    scales the PSD part's entries are O(n k_var w) ~ 1e4-1e5 in f32, and
    the accumulated rounding of those entries perturbs the smallest
    eigenvalue by more than 1 (measured on the multiclass engine at
    n=1e5, m=128: min eig of the f32-built H was -0.025 under
    lambda_max 5.4e4 — the absolute-jitter escalation ladder from 1e-6
    never reaches a rescue, and training NaNs at step ~100 through the
    factor's gradient). Scaling the base by the diagonal magnitude keeps
    the floor at a fixed RELATIVE height; the eigenvalues it perturbs
    are the ones already below f32 resolution of the matrix."""
    d = jnp.diagonal(B, axis1=-2, axis2=-1)
    return base * (1.0 + jnp.max(d))


def _with_floor(B, base=1e-6):
    """B + stop_gradient(scale-aware floor) * I, ready for safe_cholesky
    (whose custom_vjp takes jitter as a STATIC argument — the data-dependent
    part of the floor rides the matrix instead, gradient-stopped so the
    regularizer adds no spurious hyperparameter gradient)."""
    f = jax.lax.stop_gradient(_floor_jitter(B, base))
    return B + f * jnp.eye(B.shape[-1], dtype=B.dtype)

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
        Lb = safe_cholesky(_with_floor(B, jitter), jitter)
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


def _ift_bwd_core(loglik_conv, jitter, res, vbar):
    """Shared implicit-function-theorem VJP at the mode: dF/dv =
    -(I + Lk^T W Lk) = -B with the TRUE curvature W, so vbar^T dv*/da =
    w^T dF/da with B w = vbar (B symmetric PD at a genuine mode)."""
    from ..ops.linalg import _tri_solve_T_dispatch, tri_solve

    Lk, consts, v = res
    loglik_fn = lambda f: loglik_conv(f, *consts)
    f = matmul_hp(Lk, v)
    W = _curvature(loglik_fn, f)
    n = Lk.shape[-1]
    I = jnp.eye(n, dtype=Lk.dtype)
    B = I + matmul_hp(jnp.swapaxes(Lk, -1, -2), W * Lk)
    Lb = safe_cholesky(_with_floor(B, jitter), jitter)
    w = _tri_solve_T_dispatch(Lb, tri_solve(Lb, vbar))  # B^-1 vbar

    def F(Lk_, consts_):
        f_ = matmul_hp(Lk_, v)
        g_ = jax.grad(lambda ff: jnp.sum(loglik_conv(ff, *consts_)))(f_)
        return matmul_hp(jnp.swapaxes(Lk_, -1, -2), g_) - v

    _, vjpF = jax.vjp(F, Lk, consts)
    Lk_bar, consts_bar = vjpF(w)
    return Lk_bar, consts_bar


def _newton_mode_bwd(loglik_conv, newton_iters, jitter, res, vbar):
    return _ift_bwd_core(loglik_conv, jitter, res, vbar)


_newton_mode_implicit.defvjp(_newton_mode_fwd, _newton_mode_bwd)


# ------------------- fused batched Newton forward (ops/pallas_newton.py)
def _fused_loglik(tag, df, y, var):
    """The XLA-side likelihood matching the in-kernel closed forms."""
    if tag == "bernoulli_logit":
        return lambda f: (
            y * jax.nn.log_sigmoid(f) + (1.0 - y) * jax.nn.log_sigmoid(-f)
        )
    if tag == "student_t":
        from .. import densities

        return lambda f: densities.student_t(y, f, var, df)
    raise ValueError("unsupported fused likelihood %r" % (tag,))


@functools.lru_cache(maxsize=None)
def _fused_newton_fn(tag, df, iters, jitter):
    """The mode-finder with a custom batching rule: unbatched calls ARE
    `_newton_iterations` (bit-identical to the generic path); a BATCHED
    call — a BatchedOptimizer trace — dispatches the whole 15-iteration
    Newton loop to the fused Pallas kernel when `[tpu] use_pallas` is on
    (the batched forward's ~7 small kernels per DEPENDENT iteration are
    the measured cost center, docs/PERF.md §Laplace)."""

    @jax.custom_batching.custom_vmap
    def fn(Lk, y, var):
        return _newton_iterations(
            _fused_loglik(tag, df, y, var), Lk, iters, jitter
        )

    @fn.def_vmap
    def _rule(axis_size, in_batched, Lk, y, var):
        lb, yb, vb = in_batched
        if not lb:
            Lk = jnp.broadcast_to(Lk[None], (axis_size,) + Lk.shape)
        if not yb:
            y = jnp.broadcast_to(y[None], (axis_size,) + y.shape)
        if not vb:
            var = jnp.broadcast_to(var[None], (axis_size,) + var.shape)
        use_pallas = (
            bool(settings.tpu.use_pallas)
            and Lk.ndim == 3
            and Lk.dtype == jnp.float32
            and Lk.shape[-2] <= 128
            and Lk.shape[-1] <= 128
            and axis_size * 128 * 128 * 4 * 4 <= 12 * 2**20
            and jax.devices()[0].platform == "tpu"
        )
        if use_pallas:
            from ..ops.pallas_newton import newton_mode_vbatched

            return (
                newton_mode_vbatched(
                    Lk, y, var.reshape(axis_size, 1), tag, df=df,
                    iters=iters, jitter=jitter,
                ),
                True,
            )
        return (
            jax.vmap(
                lambda a, b, c: _newton_iterations(
                    _fused_loglik(tag, df, b, c), a, iters, jitter
                )
            )(Lk, y, var),
            True,
        )

    return fn


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _newton_mode_implicit_fused(loglik_conv, newton_iters, jitter, spec, Lk,
                                consts, y, var):
    """Fused-forward twin of `_newton_mode_implicit`: the mode comes from
    the likelihood-specialized kernel path, the IFT backward is the SAME
    `_ift_bwd_core` over (loglik_conv, consts) — implicit differentiation
    does not care how the fixed point was found. y/var ride along only for
    the forward; their gradients flow through `consts` (the closure
    captured the same arrays), so their cotangents here are None."""
    tag, df = spec
    return _fused_newton_fn(tag, df, newton_iters, jitter)(Lk, y, var)


def _newton_mode_fused_fwd(loglik_conv, newton_iters, jitter, spec, Lk,
                           consts, y, var):
    v = _newton_mode_implicit_fused(
        loglik_conv, newton_iters, jitter, spec, Lk, consts, y, var
    )
    return v, (Lk, consts, v)


def _newton_mode_fused_bwd(loglik_conv, newton_iters, jitter, spec, res,
                           vbar):
    Lk_bar, consts_bar = _ift_bwd_core(loglik_conv, jitter, res, vbar)
    return Lk_bar, consts_bar, None, None


_newton_mode_implicit_fused.defvjp(_newton_mode_fused_fwd,
                                   _newton_mode_fused_bwd)


def laplace_whitened(loglik_fn, Lk, newton_iters=15, jitter=1e-6,
                     implicit_diff=True, fused=None):
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

    fused: optional ``(tag, params)`` declaring the likelihood's closed
    form — ``("bernoulli_logit", {"y": Y})`` or
    ``("student_t", {"y": Y, "var": var, "df": 3.0})`` — so a BATCHED
    trace (BatchedOptimizer) can run the whole Newton forward as ONE
    Pallas kernel (`ops/pallas_newton.py`). `loglik_fn` stays the source
    of truth for the evidence and the IFT backward; unbatched traces are
    unchanged. The declared form must match `loglik_fn` (a mismatched tag
    converges to the WRONG mode).
    """
    if implicit_diff:
        # shape[-2], not [-1]: rectangular projections (inducing-point
        # Laplace, A [n, m]) evaluate the likelihood at n points, not m
        loglik_conv, consts = jax.closure_convert(
            loglik_fn, jnp.zeros((Lk.shape[-2], 1), Lk.dtype)
        )
        if fused is not None:
            tag, p = fused
            var = p.get("var")
            if var is None:
                var = jnp.ones((1,), Lk.dtype)
            v_star = _newton_mode_implicit_fused(
                loglik_conv, int(newton_iters), float(jitter),
                (tag, float(p.get("df", 0.0))),
                Lk, tuple(consts), p["y"], var,
            )
        else:
            v_star = _newton_mode_implicit(
                loglik_conv, int(newton_iters), float(jitter), Lk,
                tuple(consts)
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
    Lb = safe_cholesky(_with_floor(B, jitter), jitter)
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
    Lb = safe_cholesky(_with_floor(B, jitter), jitter)
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


# --------------------------------------------------------- multiclass (softmax)
class MulticlassLaplaceResult(NamedTuple):
    """Mode and curvature for the K-class softmax likelihood over a
    projected latent F = A U (U [m, K] whitened per class).

    u_mode: [m, K]; f_mode: the training logits [n, K]; log_marginal: the
    Laplace evidence; grad_norm: |grad psi| at the mode (~0 when
    converged)."""

    u_mode: jax.Array
    f_mode: jax.Array
    log_marginal: jax.Array
    grad_norm: jax.Array


def _softmax_psi(A, Y1, u):
    """(psi, F, G, Pi): log-posterior value, logits, dloglik/dF, softmax."""
    F = matmul_hp(A, u)  # [n, K]
    Pi = jax.nn.softmax(F, axis=-1)
    G = Y1 - Pi
    ll = jnp.sum(Y1 * (F - jax.scipy.special.logsumexp(F, axis=-1)[:, None]))
    return ll - 0.5 * jnp.sum(u * u), F, G, Pi


def _softmax_G(A, Pi):
    """The square-root factor G [n K, K m] of the blocked softmax curvature:
    G^T G = blocks(A^T W_cc' A) with W_i = diag(pi_i) - pi_i pi_i^T (GPML
    ch. 3.5's coupling), so the Newton matrix is H = I + G^T G WITHOUT ever
    being formed. Key identity: with q = sqrt(pi) (unit norm, sum pi = 1),
    W = D^{1/2} (I - q q^T) D^{1/2} and I - q q^T is an orthogonal
    PROJECTOR, so C = D^{1/2} (I - q q^T), i.e. C_ce = q_c delta_ce -
    pi_c q_e, satisfies C C^T = W exactly. G stacks rows
    G[(n,e),(c,i)] = C_n[c,e] A[n,i]. Flat column order: (c, i) -> c*m + i
    (matching the u layout used throughout).

    Working with the square root instead of the normal matrix is what
    breaks the round-4 f32 envelope (n * k_var ~ 2e5 per class): the
    f32-BUILT H = I + A^T W A loses its unit eigenvalue floor to entry
    rounding at n k_var scale (measured min eig -0.025 under lambda_max
    5.4e4) and the evidence gradient NaNs; factorizations derived from G
    see condition sqrt(cond H) and keep the floor exact."""
    n, m = A.shape
    K = Pi.shape[-1]
    prec = settings.tpu.matmul_precision
    q = jnp.sqrt(Pi)
    eyeK = jnp.eye(K, dtype=A.dtype)
    C = q[:, :, None] * eyeK[None] - Pi[:, :, None] * q[:, None, :]  # [n,c,e]
    return jnp.einsum("nce,ni->neci", C, A, precision=prec).reshape(
        n * K, K * m
    )


def _sqrt_gram_factor(G, jitter=1e-4):
    """Upper-triangular R with R^T R = I + G^T G, at HOUSEHOLDER-QR accuracy
    but built from MXU matmuls + two tiny p x p Cholesky factorizations:
    shifted CholeskyQR2 (Fukaya et al., "Shifted Cholesky QR for computing
    the QR factorization of ill-conditioned matrices", 2020 — PAPERS.md).

    Pass 1 factorizes the (floored) normal matrix B0 = I + G^T G + f I;
    pass 2 re-orthogonalizes: with Q1 = [G; I] R0^{-1},
    B1 = Q1^T Q1 is near-identity and rock-solid PD, and
    R = chol(B1)^T R0 satisfies R^T R = (Q1 R0)^T (Q1 R0) = I + G^T G
    EXACTLY in exact arithmetic — the shift f cancels, so the returned
    factor carries none of the floor's bias. Measured at n=1e5, m=128,
    K=3 on v5e vs a float64 oracle: logdet err 1.3e-3 (the floored f32
    normal-matrix Cholesky is off by 1.3), H-solve rel err 4e-6, and it
    runs ~7x faster than XLA's Householder QR of the stacked [nK+Km, Km]
    matrix. diag(R) > 0 by construction.

    The shift base is 1e-4 RELATIVE (not the library's usual 1e-6):
    because it cancels in pass 2, a generous shift costs nothing — and at
    n*k_var ~ 1e7 scales the TPU's f32 matmul accumulation rounding of B0
    exceeds a 1e-6-relative floor (~0.3 vs 0.17 at lambda_max 1.7e5: pass
    1 went indefinite ON TPU while the identical trace was clean on CPU,
    and safe_cholesky's absolute escalation ladder cannot reach that
    scale). Pass 2's near-identity B1 keeps min eig ~ 1/(1+shift) >>
    rounding, so the larger shift stays safe."""
    p = G.shape[-1]
    I = jnp.eye(p, dtype=G.dtype)
    B0 = I + matmul_hp(jnp.swapaxes(G, -1, -2), G)
    L0 = safe_cholesky(_with_floor(B0, jitter), jitter)
    L0inv = tri_solve(L0, I)
    R0inv = jnp.swapaxes(L0inv, -1, -2)
    Gi = matmul_hp(G, R0inv)
    B1 = matmul_hp(jnp.swapaxes(Gi, -1, -2), Gi) + matmul_hp(
        L0inv, R0inv
    )
    L1 = jnp.linalg.cholesky(B1)
    return matmul_hp(jnp.swapaxes(L1, -1, -2), jnp.swapaxes(L0, -1, -2))


def _sqrt_solve(R, b):
    """(I + G^T G)^-1 b from the CholQR2 factor: R^-1 (R^-T b). R^T is
    lower triangular, so both solves ride the library tri-solve dispatch
    (Pallas-eligible on batched traces)."""
    from ..ops.linalg import _tri_solve_T_dispatch

    RT = jnp.swapaxes(R, -1, -2)
    return _tri_solve_T_dispatch(RT, tri_solve(RT, b))


@jax.custom_vjp
def logdet_sqrt_gram(G):
    """log det(I + G^T G) via the square-root factor — stable where the
    f32-built normal matrix has lost its unit eigenvalue floor. The
    gradient is the EXACT identity d logdet = <2 G H^-1, dG>, evaluated
    with the saved factor (one tiny triangular inverse + one tall matmul);
    reverse-mode only like the rest of the linear-algebra stack."""
    R = _sqrt_gram_factor(G)
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(R, axis1=-2, axis2=-1)))


def _logdet_sqrt_fwd(G):
    R = _sqrt_gram_factor(G)
    ld = 2.0 * jnp.sum(jnp.log(jnp.diagonal(R, axis1=-2, axis2=-1)))
    return ld, (G, R)


def _logdet_sqrt_bwd(res, lam):
    G, R = res
    p = G.shape[-1]
    I = jnp.eye(p, dtype=G.dtype)
    Rinv = _tri_solve_T_of_upper(R, I)
    Hinv = matmul_hp(Rinv, jnp.swapaxes(Rinv, -1, -2))
    return (2.0 * lam * matmul_hp(G, Hinv),)


def _tri_solve_T_of_upper(R, B):
    """R^-1 B for upper-triangular R, via the lower-triangular dispatch on
    R^T (solves (R^T)^T X = B)."""
    from ..ops.linalg import _tri_solve_T_dispatch

    return _tri_solve_T_dispatch(jnp.swapaxes(R, -1, -2), B)


logdet_sqrt_gram.defvjp(_logdet_sqrt_fwd, _logdet_sqrt_bwd)


def _softmax_newton(A, Y1, iters):
    """Damped Newton scan for the softmax mode; softmax is log-concave so
    H is PD — same 4-alpha best-psi select ladder as the factorizing
    engine (straight-line, vmappable). Direction solves ride the CholQR2
    square-root factor (H is never formed), so the mode search stays
    accurate past the round-4 n * k_var f32 envelope."""
    n, m = A.shape
    K = Y1.shape[-1]

    def step(u, _):
        psi0, F, G, Pi = _softmax_psi(A, Y1, u)
        grad = matmul_hp(jnp.swapaxes(A, -1, -2), G) - u  # [m, K]
        R = _sqrt_gram_factor(_softmax_G(A, Pi))
        gflat = jnp.swapaxes(grad, -1, -2).reshape(K * m, 1)
        d = _sqrt_solve(R, gflat)
        d = jnp.swapaxes(d.reshape(K, m), -1, -2)  # [m, K]
        tie_tol = 1e-5 * (1.0 + jnp.abs(psi0))
        alphas = jnp.asarray((1.0, 0.3, 0.1, 0.03), A.dtype)
        U_try = u[None] + alphas[:, None, None] * d[None]  # [4, m, K]
        psis = jax.vmap(lambda uu: _softmax_psi(A, Y1, uu)[0])(U_try)
        best_u, best_psi = u, psi0
        for i in range(4):
            take = (
                psis[i] >= best_psi - tie_tol if i == 0 else psis[i] > best_psi
            )
            best_u = jnp.where(take, U_try[i], best_u)
            best_psi = jnp.where(take, psis[i], best_psi)
        return best_u, None

    u0 = jnp.zeros((m, K), A.dtype)
    u_star, _ = jax.lax.scan(step, u0, None, length=int(iters))
    return u_star


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _softmax_mode_implicit(iters, A, Y1):
    return _softmax_newton(A, Y1, iters)


def _softmax_mode_fwd(iters, A, Y1):
    u = _softmax_mode_implicit(iters, A, Y1)
    return u, (A, Y1, u)


def _softmax_mode_bwd(iters, res, ubar):
    """IFT at the mode: F(u; A) = A^T (Y1 - softmax(A u)) - u = 0,
    dF/du = -H (the blocked softmax curvature), so ubar^T du*/dA = w^T dF/dA
    with H w = ubar — solved through the CholQR2 square-root factor."""
    A, Y1, u = res
    n, m = A.shape
    K = Y1.shape[-1]
    _, F, G, Pi = _softmax_psi(A, Y1, u)
    R = _sqrt_gram_factor(_softmax_G(A, Pi))
    ubarflat = jnp.swapaxes(ubar, -1, -2).reshape(K * m, 1)
    w = _sqrt_solve(R, ubarflat)
    w = jnp.swapaxes(w.reshape(K, m), -1, -2)  # [m, K]

    def Ffn(A_):
        F_ = matmul_hp(A_, u)
        G_ = Y1 - jax.nn.softmax(F_, axis=-1)
        return matmul_hp(jnp.swapaxes(A_, -1, -2), G_) - u

    _, vjpF = jax.vjp(Ffn, A)
    (A_bar,) = vjpF(w)
    return A_bar, None  # Y1 is integer data


_softmax_mode_implicit.defvjp(_softmax_mode_fwd, _softmax_mode_bwd)


def multiclass_laplace_projected(A, y_idx, n_classes, newton_iters=15,
                                 implicit_diff=True):
    """Laplace approximation for K-class softmax GP classification on the
    projected (inducing-point) latent F = A U, U ~ N(0, I_{m x K}).

    A [n, m]: the shared per-class projection (sqrt(k_var) (Lm^-1 Kmn)^T);
    y_idx [n] int labels. The softmax couples the classes PER POINT, so the
    curvature is the GPML ch. 3.5 block structure — the factorizing-
    likelihood engine cannot express it (its Hessian-times-ones diagonal
    trick returns W pi . 1 = 0 for softmax). Deterministic multiclass
    evidence training at n >= 1e5; evidence gradients by the IFT at the
    mode (softmax is log-concave: H is PD, the mode is unique).

    Gated against the numpy float64 oracle at z = X
    (tests/test_multiclass_oracle.py's engine) — see
    `models.SparseGPMulticlass`.

    NUMERICS (round 5): every solve and the evidence logdet go through the
    SQUARE-ROOT curvature factor (`_softmax_G` + `_sqrt_gram_factor`,
    shifted CholeskyQR2) instead of the f32-built normal matrix
    H = I + blocks(A^T W A). The round-4 engine formed H directly and hit
    an f32 wall at n * k_var ~ 2e5 per class (H's unit eigenvalue floor
    fell below entry rounding: measured min eig -0.025 under lambda_max
    5.4e4 at n=1e5, m=128, and training NaN'd near step 100 despite the
    scale-aware floor). The square-root path sees condition sqrt(cond H),
    keeps the unit floor exact, and measures logdet err 1.3e-3 / H-solve
    err 4e-6 against a float64 oracle on that same formerly-NaN workload
    (docs/PERF.md §families for the chip training run).
    """
    n = A.shape[-2]
    K = int(n_classes)
    Y1 = jax.nn.one_hot(y_idx, K, dtype=A.dtype)  # [n, K]
    if implicit_diff:
        u_star = _softmax_mode_implicit(int(newton_iters), A, Y1)
    else:
        u_star = _softmax_newton(A, Y1, int(newton_iters))
    psi, F, G, Pi = _softmax_psi(A, Y1, u_star)
    grad = matmul_hp(jnp.swapaxes(A, -1, -2), G) - u_star
    logdet = logdet_sqrt_gram(_softmax_G(A, Pi))
    return MulticlassLaplaceResult(
        u_mode=u_star,
        f_mode=F,
        log_marginal=psi - 0.5 * logdet,
        grad_norm=jnp.linalg.norm(grad),
    )


def multiclass_laplace_joint_marginals(A, res, Astar, corr_diag,
                                       jitter=1e-4):
    """Per-point JOINT class-logit Gaussians at new inputs under the
    multiclass Laplace posterior: means [n*, K] and covariances
    [n*, K, K] (cov(F*_c, F*_c') = Astar_j [H^-1]_{cc'} Astar_j^T plus the
    residual corr_diag on the diagonal). Feed to an E[softmax] estimator
    for predictive probabilities."""
    from ..ops.linalg import tri_solve

    n, m = A.shape
    K = res.u_mode.shape[-1]
    # the curvature needs only Pi at the mode — from the stored logits
    Pi = jax.nn.softmax(res.f_mode, axis=-1)
    # CholQR2 factor: R^T R = H, so R^T is the lower factor the solve wants
    R = _sqrt_gram_factor(_softmax_G(A, Pi), jitter)
    Lh = jnp.swapaxes(R, -1, -2)
    means = matmul_hp(Astar, res.u_mode)  # [n*, K]
    ns = Astar.shape[-2]
    # G_half = Lh^-1 (I_K kron Astar^T): [Km, K n*] — build blockwise
    blocks = jnp.zeros((K * m, K, ns), A.dtype)
    AsT = jnp.swapaxes(Astar, -1, -2)  # [m, n*]
    for c in range(K):
        blocks = blocks.at[c * m:(c + 1) * m, c, :].set(AsT)
    Gh = tri_solve(Lh, blocks.reshape(K * m, K * ns))
    Gh = Gh.reshape(K * m, K, ns)
    # cov_{cc'}(x_j) = sum_r Gh[r, c, j] Gh[r, c', j]
    covs = jnp.einsum("rcj,rdj->jcd", Gh, Gh)
    covs = covs + corr_diag[:, None, None] * jnp.eye(K, dtype=A.dtype)[None]
    return means, covs
