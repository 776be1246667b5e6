"""Optimizers beyond optax: natural gradients for Gaussian posteriors.

The reference optimizes variational parameters with plain Adam
(`/root/reference/Henbun/model.py:206-221`). For Gaussian q, the natural
gradient — the gradient preconditioned by the inverse Fisher of the
variational family — is the classic large-step optimizer (Salimbeni et al.
2018, PAPERS.md): for conjugate models ONE unit-step natural-gradient update
lands exactly on the optimal posterior, and on GP models it converges orders
of magnitude faster than Adam in the variational coordinates.

Implementation: each trainable :class:`~henbun_tpu.variationals.Variational`
node's (q_mu, q_sqrt) pair is updated in natural-parameter space

    theta1 = Sigma^-1 mu,     theta2 = -1/2 Sigma^-1
    theta <- theta + gamma * dL/d(eta),   eta = (mu, Sigma + mu mu^T)

where dL/d(eta) is obtained from the ordinary autodiff gradients via one
VJP through the eta -> (mu, chol) reparameterization. Everything is jnp and
runs inside the jitted training chunk. All remaining parameters (kernel
hyperparameters, likelihood variances, NN weights) are delegated to a
wrapped optax transformation.

Usage::

    opt.compile(hb.optimizers.natural_gradient(
        model, gamma=0.1, rest=optax.adam(0.01)))

Safety: a natural-gradient step can leave the PD cone (theta2 must stay
negative-definite). Each fullrank node's update RETRIES at gamma/8 then
gamma/64 when the new covariance fails its Cholesky (a masked while_loop,
zero iterations on the good path — safe_cholesky's escalation pattern);
only if all three fail does the node keep its previous value. Plain
keep-old-params latches: once q is near-singular every later step fails
too and the node silently stops moving.

Choosing gamma (measured, tests/test_natgrad.py):
  * deterministic/analytic ELBOs (closed-form expected loglik +
    `analytic_kl=True`): gamma=1.0 converges in ONE step on conjugate models;
  * MC-estimated ELBOs: gamma ~ 0.005-0.01 with `analytic_kl=True` on the
    posterior. On the fullrank GPR workload (900 coupled covariance params)
    natgrad at gamma=0.01 reaches a tail ELBO of -29 where Adam(0.02) is at
    -110 after the same 400 steps; on diagonal q the 1-sample gradient noise
    reduces the advantage to a tie. gamma=0.02 can overshoot — the stochastic
    natural step jumps toward a NOISY estimate of the optimum, so its scale
    must stay below the estimate's relative accuracy.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .variationals import Variational
from .ops.linalg import (
    _cholesky_dispatch,
    fill_triangular,
    fill_triangular_inverse,
    tri_solve,
)


def _solve_tri_inv(L):
    I = jnp.eye(L.shape[-1], dtype=L.dtype)
    return tri_solve(L, I)


def _natgrad_full(mu, L, gmu, gL, gamma):
    """One natural-gradient step for a single fullrank Gaussian.

    mu: [m], L: [m, m] lower factor (Sigma = L L^T); gmu/gL the ordinary
    gradients of the objective w.r.t. mu and the (tril) factor. Returns
    (mu_new, L_new, ok) where ok=False means the step left the PD cone.
    """
    m = mu.shape[-1]
    I = jnp.eye(m, dtype=mu.dtype)
    Sigma = L @ L.T

    def eta_to_xi(eta1, eta2):
        Sig = eta2 - jnp.outer(eta1, eta1)
        return eta1, jnp.linalg.cholesky(Sig)

    eta1, eta2 = mu, Sigma + jnp.outer(mu, mu)
    _, vjp = jax.vjp(eta_to_xi, eta1, eta2)
    deta1, deta2 = vjp((gmu, jnp.tril(gL)))
    deta2 = 0.5 * (deta2 + deta2.T)  # eta2 is symmetric; use the sym gradient

    Linv = _solve_tri_inv(L)
    P = Linv.T @ Linv  # Sigma^-1

    def attempt(g):
        t1 = P @ mu + g * deta1
        t2 = -0.5 * P + g * deta2
        Pn = -2.0 * t2
        eps = 1e-6 * jnp.trace(Pn) / m  # scale-aware jitter for f32 inverses
        # _cholesky_dispatch (not safe_cholesky): NaN-on-cone-exit is the
        # guard signal here, escalation would mask it; batched natgrad traces
        # still get the Pallas kernel through the dispatch
        Lp = _cholesky_dispatch(Pn + eps * I)  # NaN iff theta2 left the cone
        Lpinv = _solve_tri_inv(Lp)
        Sigma_new = Lpinv.T @ Lpinv
        mu_new = Sigma_new @ t1
        L_new = _cholesky_dispatch(Sigma_new)
        ok = jnp.all(jnp.isfinite(mu_new)) & jnp.all(jnp.isfinite(L_new))
        return mu_new, L_new, ok

    # PD-cone retry: a too-long natural step (gamma beyond the MC gradient's
    # accuracy) makes theta2 leave the cone; freezing the node (the round-2
    # behavior) can LATCH — once q is near-singular every later step fails
    # its Cholesky and the optimizer silently stops moving that node
    # (observed as a stuck ELBO plateau in the sharded natgrad test).
    # Escalate like safe_cholesky instead: retry at gamma/8 and gamma/64 in
    # a masked while_loop (zero iterations on the good path, select-safe
    # under vmap), and only keep the old params if all three fail.
    mu0, L0, ok0 = attempt(gamma)

    def cond(carry):
        _, _, ok, _, t = carry
        return (~ok) & (t < 2)

    def body(carry):
        mu_n, L_n, ok, g, t = carry
        g = g / 8.0
        mu2, L2, ok2 = attempt(g)
        mu_n = jnp.where(ok, mu_n, mu2)
        L_n = jnp.where(ok, L_n, L2)
        return (mu_n, L_n, ok | ok2, g, t + 1)

    mu_new, L_new, ok, _, _ = jax.lax.while_loop(
        cond,
        body,
        (mu0, L0, ok0, jnp.asarray(gamma, mu.dtype) * jnp.ones((), mu.dtype),
         jnp.zeros((), jnp.int32)),
    )
    # The persistent adaptive-gamma controller needs to distinguish WHY a
    # first attempt failed: `rescued` (a smaller ladder gamma succeeded) is
    # evidence the base gamma is too long — shrink; first-and-ladder-all-
    # failed is a conditioning problem (e.g. near-singular q in f32) that no
    # gamma fixes — the transient keep-old handles it, don't shrink.
    rescued = ok & ~ok0
    return mu_new, L_new, ok, ok0, rescued


def _natgrad_diag(mu, s, gmu, gs, gamma):
    """Elementwise natural-gradient step for a diagonal Gaussian with
    log-std parameterization s (Sigma = diag(exp(2 s))).

    Same PD-cone escalation as the fullrank step, elementwise: a coordinate
    whose theta2 leaves the cone retries at gamma/8 then gamma/64 (cheap —
    three scalar candidates, select the first valid) instead of freezing,
    which latches just like the fullrank case once a coordinate's variance
    estimate is bad."""
    var = jnp.exp(2.0 * s)
    deta1 = gmu - gs * mu / var
    deta2 = gs / (2.0 * var)

    def attempt(g):
        t1 = mu / var + g * deta1
        t2 = -0.5 / var + g * deta2
        var_new = -0.5 / t2
        mu_new = t1 * var_new
        s_new = 0.5 * jnp.log(var_new)
        ok = (t2 < 0) & jnp.isfinite(mu_new) & jnp.isfinite(s_new)
        return mu_new, s_new, ok

    mu_new = mu
    s_new = s
    done = jnp.zeros(mu.shape, bool)
    first_ok_mask = None
    for g in (gamma, gamma / 8.0, gamma / 64.0):
        mu_g, s_g, ok = attempt(g)
        if first_ok_mask is None:
            first_ok_mask = ok
        take = ok & ~done
        mu_new = jnp.where(take, mu_g, mu_new)
        s_new = jnp.where(take, s_g, s_new)
        done = done | ok
    rescued = jnp.any(done & ~first_ok_mask)
    return mu_new, s_new, jnp.array(True), jnp.all(first_ok_mask), rescued


def _batched(fn, mu, q, gmu, gq, gamma, matrix):
    """vmap a per-distribution step over the flattened leading axes."""
    size = mu.shape[-1]
    lead = mu.shape[:-1]
    mu2 = mu.reshape((-1, size))
    gmu2 = gmu.reshape((-1, size))
    if matrix:
        q2 = q.reshape((-1,) + q.shape[-2:])
        gq2 = gq.reshape((-1,) + q.shape[-2:])
    else:
        q2 = q.reshape((-1, q.shape[-1]))
        gq2 = gq.reshape((-1, q.shape[-1]))
    mu_n, q_n, ok, first_ok, rescued = jax.vmap(
        lambda a, b, c, d: fn(a, b, c, d, gamma)
    )(mu2, q2, gmu2, gq2)
    # per-distribution guard: a failed step keeps that distribution's params
    keep = ok.reshape((-1,) + (1,) * (mu_n.ndim - 1))
    mu_n = jnp.where(keep, mu_n, mu2)
    keepq = ok.reshape((-1,) + (1,) * (q_n.ndim - 1))
    q_n = jnp.where(keepq, q_n, q2)
    return (
        mu_n.reshape(mu.shape),
        q_n.reshape(q.shape),
        jnp.all(first_ok),
        jnp.any(rescued),
    )


def _discover_pairs(model, params):
    """(mu_path, sqrt_path, q_shape, size) for every trainable Variational
    node whose q_mu and q_sqrt both appear in `params`."""
    pairs = []

    def walk(node):
        if isinstance(node, Variational):
            base = node.path_to(model)
            mu_p, sq_p = base + ".q_mu", base + ".q_sqrt"
            if mu_p in params and sq_p in params:
                pairs.append((mu_p, sq_p, node.q_shape, node.size))
        for child in getattr(node, "sorted_variables", []):
            walk(child)

    walk(model)
    return pairs


class _NatGradTransformation(optax.GradientTransformation):
    """Marker subclass: lets the training drivers recognize a natural-
    gradient optimizer and name the objective-pairing rule when the
    nan-guard aborts (docs/PERF.md §SVGP: MC ELBO + large-gamma natgrad on a
    big fullrank q diverges; analytic ELBO + unit gamma converges)."""

    henbun_natgrad = True


def natural_gradient(model, gamma=0.1, rest=None, adaptive=False):
    """An optax-compatible GradientTransformation: natural-gradient steps on
    every trainable Variational (q_mu, q_sqrt) pair, `rest` (default
    Adam(1e-2)) on everything else. Pass to `Optimizer.compile`.

    adaptive=True turns the transient PD-cone retry into a PERSISTENT
    per-node step-size controller for STOCHASTIC (MC) objectives: each
    Variational node carries a scale in (0, 1] on top of `gamma`. When a
    step is RESCUED (the first attempt left the PD cone and a smaller
    ladder gamma succeeded — evidence the step length is the problem) the
    scale shrinks 8x, matching the ladder so the next step STARTS at the
    gamma that just worked; on a clean first attempt it recovers 2x; when
    the WHOLE ladder fails it holds — that is an f32 conditioning failure
    no gamma fixes (the transient keep-old handles it), and shrinking on it
    was measured to ratchet runs into the stalling band. Measured
    (tests/test_natgrad.py, CPU mesh): on the fullrank MC GPR fit a 30x-too-
    long gamma=0.3 self-tunes to within a nat of the hand-tuned 0.01 run
    (-29.5 vs -28.5; fixed 0.3 sits at -36), and the m=128 MC SVGP fit that
    NaN-aborted at any fixed gamma SURVIVES (docs/PERF.md §SVGP). Do NOT
    use adaptive on deterministic conjugate (analytic) ELBOs: there the
    fixed unit step is exact and maximally stable — the failure-rate-vs-
    gamma curve is non-monotone at m=128, so any shrink moves INTO the
    0.1-0.3 stall band (measured tail ELBO/n -73 vs -0.33). The scale rides
    in the optax state (scan-carried, checkpointed with everything else).

    Requires update(..., params) — the Optimizer driver supplies params (the
    natural-parameter map is state-dependent, unlike plain gradient
    transforms).
    """
    rest = rest if rest is not None else optax.adam(1e-2)
    # pair metadata is static (strings) and must not ride in the optax state
    # (the state is scan-carried through the jitted chunk); init() fills this
    # closure cell at compile time, update() reads it at trace time.
    meta = {"pairs": (), "pair_keys": frozenset()}

    def split(tree, pair_keys):
        ours = {k: v for k, v in tree.items() if k in pair_keys}
        theirs = {k: v for k, v in tree.items() if k not in pair_keys}
        return ours, theirs

    def init(params):
        pairs = _discover_pairs(model, params)
        meta["pairs"] = tuple(pairs)
        meta["pair_keys"] = frozenset(k for p in pairs for k in p[:2])
        _, rest_params = split(params, meta["pair_keys"])
        state = {"rest": rest.init(rest_params)}
        if adaptive:
            state["gamma_scale"] = {
                mu_p: jnp.ones((), jnp.float32) for mu_p, *_ in meta["pairs"]
            }
        return state

    def update(grads, state, params=None):
        if params is None:
            raise ValueError(
                "natural_gradient needs update(..., params=...); the henbun "
                "Optimizer supplies it."
            )
        g_ours, g_rest = split(grads, meta["pair_keys"])
        p_ours, p_rest = split(params, meta["pair_keys"])
        rest_updates, rest_state = rest.update(g_rest, state["rest"], p_rest)

        updates = dict(rest_updates)
        new_scales = {}
        for mu_p, sq_p, q_shape, size in meta["pairs"]:
            mu, q = params[mu_p], params[sq_p]
            # the driver MINIMIZES -objective; natgrad ascends the ELBO, so
            # flip the incoming (descent) gradients back to ascent
            gmu, gq = -grads[mu_p], -grads[sq_p]
            g_node = gamma
            if adaptive:
                g_node = gamma * state["gamma_scale"][mu_p]
            if q_shape == "diagonal":
                mu_n, q_n, first_ok, rescued = _batched(
                    _natgrad_diag, mu, q, gmu, gq, g_node, False
                )
            elif q_shape == "fullrank":
                # the free q_sqrt is dense with a dead upper triangle; the
                # factor is its tril, and the step returns a fresh tril
                L = jnp.tril(q)
                mu_n, q_n, first_ok, rescued = _batched(
                    _natgrad_full, mu, L, gmu, gq, g_node, True
                )
            elif q_shape == "fullrank_packed":
                # the repack (fill_triangular_inverse) is a gather per step;
                # it is dominated by the O(size^3) solves of the natgrad
                # update itself at any size where packing matters
                L = fill_triangular(q, size)
                gL = fill_triangular(gq, size)
                mu_n, L_n, first_ok, rescued = _batched(
                    _natgrad_full, mu, L, gmu, gL, g_node, True
                )
                q_n = fill_triangular_inverse(L_n)
            else:  # pragma: no cover - unreachable: Variational.__init__
                # asserts exactly the three families above. Raise rather
                # than skip: a silent skip would emit an updates dict
                # missing this pair's keys (tree-structure mismatch in the
                # driver) and drop its gamma_scale entry from the carried
                # state — both far harder to debug than this.
                raise NotImplementedError(
                    "natural_gradient has no update rule for q_shape=%r; "
                    "add one or keep the node out of the natgrad collection"
                    % (q_shape,)
                )
            updates[mu_p] = mu_n - mu
            updates[sq_p] = q_n - q
            if adaptive:
                # Shrink only on a RESCUED step (a smaller ladder gamma
                # succeeded where the base gamma exited the cone — proof the
                # step length was the problem); recover symmetrically on a
                # clean first attempt; and leave the scale UNTOUCHED when
                # the whole ladder failed — that is an f32 conditioning
                # failure no gamma fixes (measured on the analytic m=128
                # SVGP fit: its rare blips fail at every gamma down to 1e-6,
                # and any shrink-on-failure policy ratchets the run into the
                # known 0.1-0.3 stalling band, tail ELBO/n -11 to -34 vs
                # -0.33 at fixed unit gamma).
                scale = state["gamma_scale"][mu_p]
                new_scales[mu_p] = jnp.where(
                    rescued,
                    jnp.maximum(scale / 8.0, 1e-6),
                    jnp.where(
                        first_ok, jnp.minimum(scale * 2.0, 1.0), scale
                    ),
                )
        new_state = {"rest": rest_state}
        if adaptive:
            new_state["gamma_scale"] = new_scales
        return updates, new_state

    return _NatGradTransformation(init, update)
