"""ChEES-HMC: adaptive-trajectory-length HMC for SIMD hardware.

NUTS's per-chain dynamic trees run in lockstep under vmap — every chain waits
for the deepest tree each iteration (see docs/PERF.md). ChEES-HMC (Hoffman,
Radul & Sountsov 2021; cf. PAPERS.md ChEES-SMC reference) replaces the U-turn
recursion with ONE shared trajectory length adapted by maximizing the Change
in the Estimator of the Expected Square criterion:

    ChEES = E[ (||theta' - m||^2 - ||theta - m||^2)^2 ] / 4

(m = cross-chain mean). All chains run the same jittered number of leapfrog
steps per iteration — perfectly SIMD/vmap-friendly, and the cross-chain mean
is the only collective (a psum under chain sharding). Step size adapts by
dual averaging as in HMC; trajectory length by Adam on log T with the paper's
gradient estimator.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from jax.sharding import NamedSharding, PartitionSpec as P

from .hmc import _DAState, _da_init, _da_update


class ChEESResult(NamedTuple):
    samples: jnp.ndarray        # [num_samples, num_chains, dim]
    accept_prob: jnp.ndarray    # [num_samples, num_chains]
    step_size: jnp.ndarray      # scalar (shared across chains)
    trajectory_length: jnp.ndarray  # scalar, adapted
    inv_mass: jnp.ndarray       # [dim] (shared)
    final_logp: jnp.ndarray     # [num_chains]


def _halton(i, base=2):
    """Van der Corput / Halton sequence point i in (0,1), traced."""
    # 16 binary digits are plenty for jitter purposes
    i = i.astype(jnp.uint32) + 1
    bits = [(i >> k) & 1 for k in range(16)]
    out = jnp.zeros((), jnp.float32)
    for k, b in enumerate(bits):
        out = out + b.astype(jnp.float32) / (2.0 ** (k + 1))
    return out


def sample(
    log_prob,
    init,
    key,
    num_samples=1000,
    num_warmup=500,
    initial_step_size=0.1,
    initial_traj_length=1.0,
    target_accept=0.75,
    max_leapfrog=256,
    adapt_mass=True,
    traj_learning_rate=0.025,
    mesh=None,
):
    """Run ChEES-HMC on `log_prob` (theta [dim] -> scalar).

    init: [num_chains, dim]; needs >= 2 chains (the criterion uses
    cross-chain means). Returns ChEESResult.
    """
    init = jnp.atleast_2d(jnp.asarray(init))
    num_chains, dim = init.shape
    if num_chains < 2:
        raise ValueError("ChEES-HMC needs at least 2 chains")
    grad_fn = jax.grad(log_prob)

    def leapfrog_n(theta, mom, eps, inv_mass, n_steps):
        def body(carry, _):
            th, r = carry
            r = r + 0.5 * eps * grad_fn(th)
            th = th + eps * inv_mass * r
            r = r + 0.5 * eps * grad_fn(th)
            return (th, r), None

        def body_fori(i, carry):
            th, r = carry
            r = r + 0.5 * eps * grad_fn(th)
            th = th + eps * inv_mass * r
            r = r + 0.5 * eps * grad_fn(th)
            return th, r

        return jax.lax.fori_loop(0, n_steps, body_fori, (theta, mom))

    def one_chain(theta, logp, key, eps, inv_mass, n_steps):
        k_mom, k_acc = jax.random.split(key)
        r0 = jax.random.normal(k_mom, (dim,)) / jnp.sqrt(inv_mass)
        theta_new, r_new = leapfrog_n(theta, r0, eps, inv_mass, n_steps)
        logp_new = log_prob(theta_new)
        ke0 = 0.5 * jnp.sum(inv_mass * r0**2)
        ke1 = 0.5 * jnp.sum(inv_mass * r_new**2)
        log_acc = (logp_new - ke1) - (logp - ke0)
        log_acc = jnp.where(jnp.isnan(log_acc), -jnp.inf, log_acc)
        accept_prob = jnp.minimum(1.0, jnp.exp(log_acc))
        accept = jnp.log(jax.random.uniform(k_acc)) < log_acc
        theta_out = jnp.where(accept, theta_new, theta)
        logp_out = jnp.where(accept, logp_new, logp)
        # proposal end state + velocity, for the ChEES gradient
        vel_new = inv_mass * r_new
        return theta_out, logp_out, accept_prob, theta_new, vel_new

    v_chain = jax.vmap(one_chain, in_axes=(0, 0, 0, None, None, None))

    def steps_from(traj, eps, it):
        jitter = _halton(it)
        n = jnp.ceil(jitter * traj / eps).astype(jnp.int32)
        return jnp.clip(n, 1, max_leapfrog)

    class _Adam(NamedTuple):
        m: jnp.ndarray
        v: jnp.ndarray
        t: jnp.ndarray

    def adam_update(state, g, x, lr):
        m = 0.9 * state.m + 0.1 * g
        v = 0.999 * state.v + 0.001 * g * g
        t = state.t + 1.0
        mh = m / (1 - 0.9**t)
        vh = v / (1 - 0.999**t)
        return _Adam(m, v, t), x + lr * mh / (jnp.sqrt(vh) + 1e-8)

    def warmup_step(carry, it_key):
        it, key = it_key
        (theta, logp, da, log_traj, tr_adam, w_mean, w_m2, count) = carry
        eps = jnp.exp(da.log_eps)
        traj = jnp.exp(log_traj)
        n_steps = steps_from(traj, eps, it)
        keys = jax.random.split(key, num_chains)
        inv_mass_now = jnp.where(
            jnp.logical_and(adapt_mass, count > 10.0),
            jnp.mean(w_m2, 0) / jnp.maximum(count - 1.0, 1.0),
            jnp.ones((dim,)),
        )
        theta, logp, accept, theta_prop, vel_prop = v_chain(
            theta, logp, keys, eps, inv_mass_now, n_steps
        )
        # dual averaging on the cross-chain mean accept rate
        da = _da_update(da, jnp.mean(accept), target=target_accept)
        # ChEES trajectory gradient (paper eq. 14-15, accept-prob weighted)
        # divergent proposals carry inf/nan positions with accept ~ 0; they
        # must be masked BEFORE multiplying (0 * inf = nan would poison the
        # whole gradient and then log T forever)
        finite = jnp.all(jnp.isfinite(theta_prop), axis=-1)
        safe_prop = jnp.where(finite[:, None], theta_prop, theta)
        safe_vel = jnp.where(finite[:, None], vel_prop, 0.0)
        m_bar = jnp.mean(safe_prop, axis=0)
        d_new = safe_prop - m_bar
        d_old = theta - m_bar
        crit = jnp.sum(d_new**2, -1) - jnp.sum(d_old**2, -1)  # [chains]
        dir_term = jnp.sum(d_new * safe_vel, -1)
        w = jnp.where(finite, accept, 0.0)
        g = jnp.sum(w * crit * dir_term) / jnp.maximum(jnp.sum(w), 1e-6)
        # gradient w.r.t. log T, squashed to |.| <= 1 so Adam's effective step
        # on log T stays bounded regardless of the criterion's scale
        g_log = g * traj
        g_log = jnp.where(jnp.isfinite(g_log), g_log / (1.0 + jnp.abs(g_log)), 0.0)
        tr_adam, log_traj = adam_update(tr_adam, g_log, log_traj, traj_learning_rate)
        log_traj = jnp.clip(log_traj, jnp.log(1e-2), jnp.log(1e3))
        # Welford for the mass matrix (per-dimension, pooled over chains)
        count = count + 1.0
        delta = theta - w_mean
        w_mean = w_mean + delta / count
        w_m2 = w_m2 + delta * (theta - w_mean)
        return (
            (theta, logp, da, log_traj, tr_adam, w_mean, w_m2, count),
            accept,
        )

    def sample_step(carry, it_key):
        it, key = it_key
        theta, logp, eps, traj, inv_mass = carry
        n_steps = steps_from(traj, eps, it)
        keys = jax.random.split(key, num_chains)
        theta, logp, accept, _, _ = v_chain(
            theta, logp, keys, eps, inv_mass, n_steps
        )
        return (theta, logp, eps, traj, inv_mass), (theta, accept)

    def run(init, key):
        logp0 = jax.vmap(log_prob)(init)
        k_warm, k_samp = jax.random.split(key)
        da = _da_init(jnp.asarray(initial_step_size))
        log_traj = jnp.log(jnp.asarray(initial_traj_length))
        tr_adam = _Adam(jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))
        w_mean = jnp.zeros((num_chains, dim))
        w_m2 = jnp.zeros((num_chains, dim))
        carry = (init, logp0, da, log_traj, tr_adam, w_mean, w_m2, jnp.zeros(()))
        its = jnp.arange(num_warmup)
        keys = jax.random.split(k_warm, num_warmup)
        carry, _ = jax.lax.scan(warmup_step, carry, (its, keys))
        theta, logp, da, log_traj, tr_adam, w_mean, w_m2, count = carry
        eps = jnp.exp(da.log_eps_bar)
        traj = jnp.exp(log_traj)
        if adapt_mass:
            var = jnp.mean(w_m2, 0) / jnp.maximum(count - 1.0, 1.0)
            inv_mass = jnp.where(var > 0, var, 1.0)
        else:
            inv_mass = jnp.ones((dim,))
        carry = (theta, logp, eps, traj, inv_mass)
        its = jnp.arange(num_samples)
        keys = jax.random.split(k_samp, num_samples)
        carry, (samples, accept) = jax.lax.scan(sample_step, carry, (its, keys))
        theta, logp, eps, traj, inv_mass = carry
        return ChEESResult(samples, accept, eps, traj, inv_mass, logp)

    if mesh is not None:
        from ..parallel.mesh import CHAIN_AXIS

        chain2 = NamedSharding(mesh, P(None, CHAIN_AXIS))
        chain1 = NamedSharding(mesh, P(CHAIN_AXIS))
        repl = NamedSharding(mesh, P())
        init = jax.device_put(init, chain1)
        run_c = jax.jit(
            run,
            out_shardings=ChEESResult(chain2, chain2, repl, repl, repl, chain1),
        )
        return run_c(init, key)
    return jax.jit(run)(init, key)
