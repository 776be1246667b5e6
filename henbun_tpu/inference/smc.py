"""Sequential Monte Carlo: adaptive-tempered SMC with systematic resampling
and HMC move kernels, particles sharded over the mesh.

North-star capability (BASELINE.json config 5): particles shard over the
mesh's ``chain`` axis; the resampling step — normalized cumulative weights +
systematic inverse-CDF lookup + particle gather — is expressed in plain jnp
ops, so under pjit XLA lowers the cross-device exchanges to collectives with
no host round-trips (SURVEY.md hard part (c)).

Algorithm (standard adaptive tempering, cf. PAPERS.md SMC references):
  beta: 0 -> 1 with step chosen by bisection so the incremental-weight ESS
  stays at `target_ess` * P; systematic resampling; K HMC steps targeting
  p(theta)^1 * L(theta)^beta per stage; log-evidence accumulated from the
  incremental weights.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from jax.sharding import NamedSharding, PartitionSpec as P


class SMCResult(NamedTuple):
    particles: jnp.ndarray      # [P, dim] final (equal-weight) particles
    log_evidence: jnp.ndarray   # scalar estimate of log Z
    num_stages: jnp.ndarray     # tempering stages used
    final_beta: jnp.ndarray


def _ess(log_w):
    log_w = log_w - jax.scipy.special.logsumexp(log_w)
    return jnp.exp(-jax.scipy.special.logsumexp(2.0 * log_w))


def systematic_resample(key, log_w, particles):
    """Systematic resampling: one uniform, P evenly spaced CDF lookups.
    O(P log P) via searchsorted; all-jnp so GSPMD can shard it."""
    n = log_w.shape[0]
    w = jnp.exp(log_w - jax.scipy.special.logsumexp(log_w))
    cdf = jnp.cumsum(w)
    u0 = jax.random.uniform(key)
    pts = (u0 + jnp.arange(n, dtype=w.dtype)) / n
    idx = jnp.clip(jnp.searchsorted(cdf, pts), 0, n - 1)
    return jnp.take(particles, idx, axis=0)


def _find_next_beta(beta, log_lik, target_ess_frac, n_bisect=30):
    """Largest delta in (0, 1-beta] with ESS(delta * log_lik) >= target."""
    n = log_lik.shape[0]
    target = target_ess_frac * n

    def ess_at(delta):
        return _ess(delta * log_lik)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        ok = ess_at(mid) >= target
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    full = 1.0 - beta
    lo, hi = jax.lax.fori_loop(
        0, n_bisect, body, (jnp.zeros_like(beta), full)
    )
    # if even the full step keeps ESS above target, jump straight to beta=1
    delta = jnp.where(ess_at(full) >= target, full, lo)
    return jnp.maximum(delta, 1e-5)


def sample_model(
    model,
    prior_method,
    likelihood_method,
    num_particles,
    key,
    collection=None,
    init_scale=1.0,
    **kwargs,
):
    """SMC over a model tree: `prior_method` / `likelihood_method` are model
    objectives (names or methods) returning log p(theta) and log p(y|theta).
    Transform log-Jacobians attach to the prior (they belong to the measure);
    particles initialize overdispersed around the model's current free
    values. Returns (SMCResult, FlatLogProb) — use flp.unravel/set_model_state
    to map particles back to the tree."""
    import jax as _jax

    from .logprob import make_log_prob

    flp_prior = make_log_prob(
        model, prior_method, collection, add_transform_jacobians=True
    )
    flp_lik = make_log_prob(
        model, likelihood_method, collection, add_transform_jacobians=False
    )
    k_init, k_run = _jax.random.split(jax.random.PRNGKey(0) if key is None else key)
    particles = flp_prior.initial + init_scale * _jax.random.normal(
        k_init, (num_particles, flp_prior.dim)
    )
    res = sample(
        flp_prior.log_prob, flp_lik.log_prob, particles, k_run, **kwargs
    )
    return res, flp_prior


def _build_run(
    log_prior,
    log_likelihood,
    num_particles,
    num_move_steps=5,
    num_leapfrog=8,
    step_size=0.1,
    target_ess=0.5,
    max_stages=100,
):
    """The whole SMC program as a pure `(particles, key) -> SMCResult`
    closure, exposed separately from :func:`sample` so tests can LOWER it
    under a mesh and assert the collective contract on the compiled HLO
    (tests/test_parallel.py::test_smc_resampling_hlo_collectives): per stage
    the only data-moving collective is ONE all-gather of the particle block
    feeding the resampling gather — irreducible under XLA's static-SPMD
    lowering, because systematic resampling may route any source particle to
    any destination shard and GSPMD cannot emit a data-dependent sparse
    exchange — plus two [P] weight-vector all-gathers (cumsum, searchsorted);
    everything else (HMC moves, ESS bisection) is shard-local compute with
    scalar all-reduces."""
    P_ = num_particles

    v_log_lik = jax.vmap(log_likelihood)

    def tempered_logp(theta, beta):
        return log_prior(theta) + beta * log_likelihood(theta)

    grad_fn = jax.grad(tempered_logp, argnums=0)

    def hmc_move(theta, key, beta, eps):
        """One HMC transition targeting the tempered density (unit mass)."""
        k_mom, k_acc = jax.random.split(key)
        r0 = jax.random.normal(k_mom, theta.shape)
        logp0 = tempered_logp(theta, beta)

        def leap(_, carry):
            th, r = carry
            r = r + 0.5 * eps * grad_fn(th, beta)
            th = th + eps * r
            r = r + 0.5 * eps * grad_fn(th, beta)
            return th, r

        th, r = jax.lax.fori_loop(0, num_leapfrog, leap, (theta, r0))
        logp1 = tempered_logp(th, beta)
        log_acc = (logp1 - 0.5 * jnp.sum(r**2)) - (logp0 - 0.5 * jnp.sum(r0**2))
        log_acc = jnp.where(jnp.isnan(log_acc), -jnp.inf, log_acc)
        accept = jnp.log(jax.random.uniform(k_acc)) < log_acc
        return jnp.where(accept, th, theta), accept

    v_move = jax.vmap(hmc_move, in_axes=(0, 0, None, None))

    def stage(state):
        particles, beta, log_Z, n_stages, eps, key = state
        key, k_res, k_move = jax.random.split(key, 3)
        log_lik = v_log_lik(particles)
        delta = _find_next_beta(beta, log_lik, target_ess)
        log_w = delta * log_lik
        # evidence increment: log mean of incremental weights
        log_Z = log_Z + jax.scipy.special.logsumexp(log_w) - jnp.log(P_ * 1.0)
        beta = beta + delta
        particles = systematic_resample(k_res, log_w, particles)

        def move_body(i, carry):
            particles, acc = carry
            keys = jax.random.split(jax.random.fold_in(k_move, i), P_)
            particles, accepted = v_move(particles, keys, beta, eps)
            return particles, acc + jnp.mean(accepted.astype(jnp.float32))

        particles, acc_sum = jax.lax.fori_loop(
            0, num_move_steps, move_body, (particles, jnp.zeros(()))
        )
        # per-stage step-size adaptation: the tempered target sharpens as
        # beta grows, so a fixed eps either stalls early stages or rejects
        # late ones; nudge eps toward ~0.65 accept (Robbins-Monro style)
        acc_rate = acc_sum / num_move_steps
        eps = jnp.clip(
            eps * jnp.exp(0.5 * (acc_rate - 0.65)), step_size * 1e-3,
            step_size * 1e3,
        )
        return particles, beta, log_Z, n_stages + 1, eps, key

    def cond(state):
        _, beta, _, n_stages, _, _ = state
        return jnp.logical_and(beta < 1.0 - 1e-6, n_stages < max_stages)

    def run(particles, key):
        state = (
            particles,
            jnp.zeros(()),
            jnp.zeros(()),
            jnp.int32(0),
            jnp.asarray(step_size, jnp.float32),
            key,
        )
        particles, beta, log_Z, n_stages, eps, _ = jax.lax.while_loop(
            cond, stage, state
        )
        return SMCResult(particles, log_Z, n_stages, beta)

    return run


def sample(
    log_prior,
    log_likelihood,
    init_particles,
    key,
    num_move_steps=5,
    num_leapfrog=8,
    step_size=0.1,
    target_ess=0.5,
    max_stages=100,
    mesh=None,
):
    """Adaptive-tempered SMC from prior samples to the posterior.

    - log_prior, log_likelihood: theta [dim] -> scalar (the posterior is
      prior * likelihood; tempering applies to the likelihood).
    - init_particles: [P, dim] draws from the prior.
    Returns SMCResult (particles are equal-weight after the final stage).
    """
    init_particles = jnp.asarray(init_particles)
    P_, dim = init_particles.shape
    run = _build_run(
        log_prior,
        log_likelihood,
        P_,
        num_move_steps=num_move_steps,
        num_leapfrog=num_leapfrog,
        step_size=step_size,
        target_ess=target_ess,
        max_stages=max_stages,
    )

    if mesh is not None:
        from ..parallel.mesh import CHAIN_AXIS

        part_sh = NamedSharding(mesh, P(CHAIN_AXIS))
        repl = NamedSharding(mesh, P())
        init_particles = jax.device_put(init_particles, part_sh)
        run_c = jax.jit(
            run, out_shardings=SMCResult(part_sh, repl, repl, repl)
        )
        return run_c(init_particles, key)
    return jax.jit(run)(init_particles, key)
