"""Hamiltonian Monte Carlo with dual-averaging step-size adaptation and
diagonal mass-matrix (Welford) adaptation, vectorized over chains.

North-star capability (BASELINE.json config 4): 256 chains vmapped into one
XLA program and sharded over the mesh's ``chain`` axis. The whole sampler —
leapfrog, accept/reject, adaptation, sample collection — is a single
`lax.scan`, so a full run is ONE device call regardless of chain count.

Design follows the standard scheme (Stan/NUTS paper's dual averaging;
cf. PAPERS.md: BlackJAX, NumPyro): warmup adapts step size toward a target
accept rate (0.8) and estimates per-dimension posterior variance for the
mass matrix; sampling runs with both frozen.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from jax.sharding import NamedSharding, PartitionSpec as P


class HMCResult(NamedTuple):
    samples: jnp.ndarray        # [num_samples, num_chains, dim]
    accept_prob: jnp.ndarray    # [num_samples, num_chains]
    step_size: jnp.ndarray      # [num_chains]
    inv_mass: jnp.ndarray       # [num_chains, dim]
    final_logp: jnp.ndarray     # [num_chains]


class _DAState(NamedTuple):
    """Dual averaging (Hoffman & Gelman 2014, Algorithm 5)."""

    log_eps: jnp.ndarray
    log_eps_bar: jnp.ndarray
    h_bar: jnp.ndarray
    mu: jnp.ndarray
    count: jnp.ndarray


def _da_init(eps0):
    # log_eps_bar starts at log(eps0) so num_warmup=0 runs use the requested
    # step size (the first real update overwrites it: eta_1 = 1)
    return _DAState(
        log_eps=jnp.log(eps0),
        log_eps_bar=jnp.log(eps0),
        h_bar=jnp.zeros_like(eps0),
        mu=jnp.log(10.0 * eps0),
        count=jnp.zeros_like(eps0),
    )


def _da_update(state, accept_prob, target=0.8, gamma=0.05, t0=10.0, kappa=0.75):
    count = state.count + 1.0
    w = 1.0 / (count + t0)
    h_bar = (1.0 - w) * state.h_bar + w * (target - accept_prob)
    log_eps = state.mu - jnp.sqrt(count) / gamma * h_bar
    eta = count ** (-kappa)
    log_eps_bar = eta * log_eps + (1.0 - eta) * state.log_eps_bar
    return _DAState(log_eps, log_eps_bar, h_bar, state.mu, count)


def _leapfrog(grad_fn, theta, mom, eps, inv_mass, num_steps):
    """num_steps leapfrog integration steps with diagonal mass."""

    def body(_, carry):
        theta, mom = carry
        mom = mom + 0.5 * eps * grad_fn(theta)
        theta = theta + eps * inv_mass * mom
        mom = mom + 0.5 * eps * grad_fn(theta)
        return theta, mom

    return jax.lax.fori_loop(0, num_steps, body, (theta, mom))


def sample(
    log_prob,
    init,
    key,
    num_samples=1000,
    num_warmup=500,
    num_leapfrog=16,
    initial_step_size=0.1,
    target_accept=0.8,
    adapt_mass=True,
    jitter_steps=True,
    mesh=None,
    thin=1,
):
    """Run HMC on `log_prob` (theta [dim] -> scalar).

    - init: [num_chains, dim] initial positions (chain count inferred).
    - jitter_steps: draw the leapfrog count uniformly in
      [num_leapfrog/2, num_leapfrog] each iteration (shared across chains, so
      vmap stays lockstep). REQUIRED for correctness in practice: with a
      fixed count, a chain whose adapted (eps, mass) lands near a leapfrog
      resonance (n steps ~ pi rotation for a quadratic mode) degenerates to
      bouncing between +/-x forever — an ergodicity failure that inflates
      tails while fooling pairwise ESS estimates.
    - mesh: optional Mesh; chains shard over its 'chain' axis.

    Returns an HMCResult with samples [num_samples, num_chains, dim].
    """
    init = jnp.atleast_2d(jnp.asarray(init))
    num_chains, dim = init.shape
    grad_fn = jax.grad(log_prob)

    def kernel(theta, logp, key, eps, inv_mass, n_steps):
        k_mom, k_acc = jax.random.split(key)
        mom = jax.random.normal(k_mom, (dim,)) / jnp.sqrt(inv_mass)
        theta_new, mom_new = _leapfrog(
            grad_fn, theta, mom, eps, inv_mass, n_steps
        )
        logp_new = log_prob(theta_new)
        ke = 0.5 * jnp.sum(inv_mass * mom**2)
        ke_new = 0.5 * jnp.sum(inv_mass * mom_new**2)
        log_accept = (logp_new - ke_new) - (logp - ke)
        log_accept = jnp.where(jnp.isnan(log_accept), -jnp.inf, log_accept)
        accept_prob = jnp.minimum(1.0, jnp.exp(log_accept))
        accept = jax.random.uniform(k_acc) < accept_prob
        theta = jnp.where(accept, theta_new, theta)
        logp = jnp.where(accept, logp_new, logp)
        return theta, logp, accept_prob

    v_kernel = jax.vmap(kernel, in_axes=(0, 0, 0, 0, 0, None))

    def _n_steps(key):
        if not jitter_steps or num_leapfrog <= 2:
            return num_leapfrog
        return jax.random.randint(
            key, (), max(num_leapfrog // 2, 1), num_leapfrog + 1
        )

    def warmup_step(carry, key):
        theta, logp, da, w_mean, w_m2, count = carry
        key, k_n = jax.random.split(key)
        n_steps = _n_steps(k_n)
        keys = jax.random.split(key, num_chains)
        eps = jnp.exp(da.log_eps)
        inv_mass_now = jnp.where(
            jnp.logical_and(adapt_mass, count > 10.0),
            w_m2 / jnp.maximum(count - 1.0, 1.0),
            jnp.ones_like(w_m2),
        )
        theta, logp, accept_prob = v_kernel(
            theta, logp, keys, eps, inv_mass_now, n_steps
        )
        da = _da_update(da, accept_prob, target=target_accept)
        # Welford accumulation of per-dimension variance for the mass matrix
        count = count + 1.0
        delta = theta - w_mean
        w_mean = w_mean + delta / count
        w_m2 = w_m2 + delta * (theta - w_mean)
        return (theta, logp, da, w_mean, w_m2, count), accept_prob

    def sample_step(carry, key):
        theta, logp, eps, inv_mass = carry
        key, k_n = jax.random.split(key)
        n_steps = _n_steps(k_n)
        keys = jax.random.split(key, num_chains)
        theta, logp, accept_prob = v_kernel(
            theta, logp, keys, eps, inv_mass, n_steps
        )
        return (theta, logp, eps, inv_mass), (theta, accept_prob)

    def run(init, key):
        logp0 = jax.vmap(log_prob)(init)
        k_warm, k_samp = jax.random.split(key)
        da = _da_init(jnp.full((num_chains,), initial_step_size))
        w_mean = jnp.zeros((num_chains, dim))
        w_m2 = jnp.zeros((num_chains, dim))
        carry = (init, logp0, da, w_mean, w_m2, jnp.zeros(()))
        carry, _ = jax.lax.scan(
            warmup_step, carry, jax.random.split(k_warm, num_warmup)
        )
        theta, logp, da, w_mean, w_m2, count = carry
        eps = jnp.exp(da.log_eps_bar)
        if adapt_mass:
            var = w_m2 / jnp.maximum(count - 1.0, 1.0)
            inv_mass = jnp.where(var > 0, var, 1.0)
        else:
            inv_mass = jnp.ones((num_chains, dim))
        carry = (theta, logp, eps, inv_mass)
        carry, (samples, accept_prob) = jax.lax.scan(
            sample_step, carry, jax.random.split(k_samp, num_samples * thin)
        )
        theta, logp, eps, inv_mass = carry
        if thin > 1:
            samples = samples[thin - 1 :: thin]
            accept_prob = accept_prob[thin - 1 :: thin]
        return HMCResult(samples, accept_prob, eps, inv_mass, logp)

    if mesh is not None:
        from ..parallel.mesh import CHAIN_AXIS

        chain_sh = NamedSharding(mesh, P(None, CHAIN_AXIS))
        init = jax.device_put(init, NamedSharding(mesh, P(CHAIN_AXIS)))
        run_c = jax.jit(
            run,
            out_shardings=HMCResult(
                chain_sh,
                chain_sh,
                NamedSharding(mesh, P(CHAIN_AXIS)),
                NamedSharding(mesh, P(CHAIN_AXIS)),
                NamedSharding(mesh, P(CHAIN_AXIS)),
            ),
        )
        return run_c(init, key)
    return jax.jit(run)(init, key)


def effective_sample_size(samples):
    """ESS per dimension (per-chain initial-positive-sequence estimator,
    summed over chains). Delegates to the diagnostics library; kept here for
    back-compat. samples: [n, num_chains, dim] -> [dim]."""
    from . import diagnostics

    return diagnostics.effective_sample_size(samples)
