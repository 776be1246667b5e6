"""No-U-Turn Sampler: iterative multinomial NUTS with a fixed depth budget.

NUTS's data-dependent tree recursion does not map to XLA (SURVEY.md hard part
(d)); this is the ITERATIVE construction (cf. PAPERS.md: NumPyro's iterative
NUTS, BlackJAX): a trajectory of up to 2^max_tree_depth leapfrog steps built
with `lax.while_loop`, with the full set of recursive-NUTS U-turn checks
reproduced via an O(max_depth) checkpoint scheme:

* leaves of a size-2^d subtree are indexed i = 0..2^d-1 in integration order;
* a size-2^k sub-subtree ends at leaf i iff the last k bits of i are ones,
  and its left endpoint is i with those bits zeroed;
* storing each even leaf at checkpoint slot popcount(i) makes the left
  endpoints needed at odd leaf i occupy the contiguous slots
  [popcount(i)-K .. popcount(i)-1], K = trailing ones of i.

Proposals use multinomial (Betancourt) sampling within subtrees and biased
progressive sampling across doublings, matching Stan's scheme. Everything is
vmapped over chains and shardable over the mesh ``chain`` axis.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from jax.sharding import NamedSharding, PartitionSpec as P

from .hmc import _DAState, _da_init, _da_update


class NUTSResult(NamedTuple):
    samples: jnp.ndarray      # [num_samples, num_chains, dim]
    accept_prob: jnp.ndarray  # [num_samples, num_chains] (mean MH stat)
    num_steps: jnp.ndarray    # [num_samples, num_chains] leapfrog steps taken
    step_size: jnp.ndarray    # [num_chains]
    inv_mass: jnp.ndarray     # [num_chains, dim]
    final_logp: jnp.ndarray   # [num_chains]


def _popcount(x):
    return jax.lax.population_count(x.astype(jnp.uint32)).astype(jnp.int32)


def _trailing_ones(x):
    x = x.astype(jnp.uint32)
    return (_popcount(x ^ (x + 1)) - 1).astype(jnp.int32)


def _is_turning(theta_minus, r_minus, theta_plus, r_plus, inv_mass):
    """Generalized U-turn criterion with diagonal mass (velocity form)."""
    dtheta = theta_plus - theta_minus
    return jnp.logical_or(
        jnp.dot(dtheta, inv_mass * r_minus) < 0,
        jnp.dot(dtheta, inv_mass * r_plus) < 0,
    )


class _Tree(NamedTuple):
    theta_prop: jnp.ndarray   # multinomial proposal from the subtree
    logp_prop: jnp.ndarray
    log_sum_weight: jnp.ndarray
    theta_last: jnp.ndarray   # subtree endpoint in integration order
    r_last: jnp.ndarray
    grad_last: jnp.ndarray
    turning: jnp.ndarray
    diverging: jnp.ndarray
    sum_accept: jnp.ndarray   # sum of min(1, exp(H0 - H)) over leaves
    n_leaves: jnp.ndarray


def _build_subtree(
    value_and_grad_fn, depth, theta0, r0, grad0, eps_signed, inv_mass,
    energy0, max_depth, key,
):
    """Integrate 2^depth leapfrog steps from (theta0, r0), with checkpointed
    U-turn checks; early exit on turning/divergence."""
    dim = theta0.shape[0]
    num_leaves = jnp.int32(1) << depth

    ckpt_theta = jnp.zeros((max_depth + 1, dim), theta0.dtype)
    ckpt_r = jnp.zeros((max_depth + 1, dim), theta0.dtype)

    init = dict(
        i=jnp.int32(0),
        theta=theta0,
        r=r0,
        grad=grad0,
        logp=jnp.zeros(()),
        theta_prop=theta0,
        logp_prop=jnp.zeros(()),
        log_sum_weight=-jnp.inf,
        turning=jnp.asarray(False),
        diverging=jnp.asarray(False),
        sum_accept=jnp.zeros(()),
        ckpt_theta=ckpt_theta,
        ckpt_r=ckpt_r,
    )

    def cond(s):
        return jnp.logical_and(
            s["i"] < num_leaves,
            jnp.logical_not(jnp.logical_or(s["turning"], s["diverging"])),
        )

    def body(s):
        i = s["i"]
        # one leapfrog step
        r_half = s["r"] + 0.5 * eps_signed * s["grad"]
        theta = s["theta"] + eps_signed * inv_mass * r_half
        logp, grad = value_and_grad_fn(theta)
        r = r_half + 0.5 * eps_signed * grad
        energy = -logp + 0.5 * jnp.sum(inv_mass * r**2)
        delta = energy0 - energy                     # log weight of this leaf
        delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
        diverging = delta < -1000.0
        sum_accept = s["sum_accept"] + jnp.minimum(1.0, jnp.exp(delta))

        # progressive multinomial proposal within the subtree
        log_sum_weight = jnp.logaddexp(s["log_sum_weight"], delta)
        u = jax.random.uniform(jax.random.fold_in(key, i))
        take = jnp.log(u) < (delta - log_sum_weight)
        theta_prop = jnp.where(take, theta, s["theta_prop"])
        logp_prop = jnp.where(take, logp, s["logp_prop"])

        # checkpoint scheme: even leaves store, odd leaves check
        pc = _popcount(i)
        is_even = (i % 2) == 0
        ckpt_theta = jnp.where(
            is_even, s["ckpt_theta"].at[pc].set(theta), s["ckpt_theta"]
        )
        ckpt_r = jnp.where(is_even, s["ckpt_r"].at[pc].set(r), s["ckpt_r"])

        K = _trailing_ones(i)

        def check_k(k, turning):
            slot = pc - k
            valid = jnp.logical_and(k >= 1, k <= K)
            t = _is_turning(
                ckpt_theta[jnp.maximum(slot, 0)],
                ckpt_r[jnp.maximum(slot, 0)],
                theta,
                r,
                inv_mass,
            )
            return jnp.logical_or(turning, jnp.logical_and(valid, t))

        turning = jnp.where(
            is_even,
            jnp.asarray(False),
            jax.lax.fori_loop(1, max_depth + 1, check_k, jnp.asarray(False)),
        )

        return dict(
            i=i + 1,
            theta=theta,
            r=r,
            grad=grad,
            logp=logp,
            theta_prop=theta_prop,
            logp_prop=logp_prop,
            log_sum_weight=log_sum_weight,
            turning=turning,
            diverging=diverging,
            sum_accept=sum_accept,
            ckpt_theta=ckpt_theta,
            ckpt_r=ckpt_r,
        )

    s = jax.lax.while_loop(cond, body, init)
    return _Tree(
        theta_prop=s["theta_prop"],
        logp_prop=s["logp_prop"],
        log_sum_weight=s["log_sum_weight"],
        theta_last=s["theta"],
        r_last=s["r"],
        grad_last=s["grad"],
        turning=s["turning"],
        diverging=s["diverging"],
        sum_accept=s["sum_accept"],
        n_leaves=s["i"],
    )


def _nuts_kernel(value_and_grad_fn, max_tree_depth):
    """One NUTS transition: theta, logp, grad, key, eps, inv_mass -> ..."""

    def kernel(theta, logp, grad, key, eps, inv_mass):
        dim = theta.shape[0]
        k_mom, k_dir, k_tree, k_prop = jax.random.split(key, 4)
        r0 = jax.random.normal(k_mom, (dim,)) / jnp.sqrt(inv_mass)
        energy0 = -logp + 0.5 * jnp.sum(inv_mass * r0**2)

        init = dict(
            depth=jnp.int32(0),
            theta_prop=theta,
            logp_prop=logp,
            log_sum_weight=jnp.zeros(()),   # weight of the initial leaf = exp(0)
            # trajectory endpoints: minus (backward in time) and plus (forward)
            theta_minus=theta, r_minus=r0, grad_minus=grad,
            theta_plus=theta, r_plus=r0, grad_plus=grad,
            turning=jnp.asarray(False),
            diverging=jnp.asarray(False),
            sum_accept=jnp.zeros(()),
            n_leapfrog=jnp.int32(0),
        )

        def cond(s):
            return jnp.logical_and(
                s["depth"] < max_tree_depth,
                jnp.logical_not(jnp.logical_or(s["turning"], s["diverging"])),
            )

        def body(s):
            depth = s["depth"]
            go_right = jax.random.bernoulli(jax.random.fold_in(k_dir, depth))
            theta0 = jnp.where(go_right, s["theta_plus"], s["theta_minus"])
            r0_ = jnp.where(go_right, s["r_plus"], s["r_minus"])
            grad0 = jnp.where(go_right, s["grad_plus"], s["grad_minus"])
            eps_signed = jnp.where(go_right, eps, -eps)

            tree = _build_subtree(
                value_and_grad_fn, depth, theta0, r0_, grad0, eps_signed,
                inv_mass, energy0, max_tree_depth,
                jax.random.fold_in(k_tree, depth),
            )

            ok = jnp.logical_not(jnp.logical_or(tree.turning, tree.diverging))
            # biased progressive sampling across the doubling
            u = jax.random.uniform(jax.random.fold_in(k_prop, depth))
            take = jnp.logical_and(
                ok, jnp.log(u) < (tree.log_sum_weight - s["log_sum_weight"])
            )
            theta_prop = jnp.where(take, tree.theta_prop, s["theta_prop"])
            logp_prop = jnp.where(take, tree.logp_prop, s["logp_prop"])
            log_sum_weight = jnp.where(
                ok,
                jnp.logaddexp(s["log_sum_weight"], tree.log_sum_weight),
                s["log_sum_weight"],
            )

            # update endpoints (only when the subtree is usable)
            theta_minus = jnp.where(
                jnp.logical_and(ok, ~go_right), tree.theta_last, s["theta_minus"]
            )
            r_minus = jnp.where(
                jnp.logical_and(ok, ~go_right), tree.r_last, s["r_minus"]
            )
            grad_minus = jnp.where(
                jnp.logical_and(ok, ~go_right), tree.grad_last, s["grad_minus"]
            )
            theta_plus = jnp.where(
                jnp.logical_and(ok, go_right), tree.theta_last, s["theta_plus"]
            )
            r_plus = jnp.where(
                jnp.logical_and(ok, go_right), tree.r_last, s["r_plus"]
            )
            grad_plus = jnp.where(
                jnp.logical_and(ok, go_right), tree.grad_last, s["grad_plus"]
            )

            # U-turn across the merged trajectory
            turning_total = jnp.logical_or(
                tree.turning,
                _is_turning(theta_minus, r_minus, theta_plus, r_plus, inv_mass),
            )

            return dict(
                depth=depth + 1,
                theta_prop=theta_prop,
                logp_prop=logp_prop,
                log_sum_weight=log_sum_weight,
                theta_minus=theta_minus, r_minus=r_minus, grad_minus=grad_minus,
                theta_plus=theta_plus, r_plus=r_plus, grad_plus=grad_plus,
                turning=turning_total,
                diverging=tree.diverging,
                sum_accept=s["sum_accept"] + tree.sum_accept,
                n_leapfrog=s["n_leapfrog"] + tree.n_leaves,
            )

        s = jax.lax.while_loop(cond, body, init)
        accept_stat = s["sum_accept"] / jnp.maximum(
            s["n_leapfrog"].astype(theta.dtype), 1.0
        )
        theta_new = s["theta_prop"]
        logp_new, grad_new = value_and_grad_fn(theta_new)
        return theta_new, logp_new, grad_new, accept_stat, s["n_leapfrog"]

    return kernel


def sample(
    log_prob,
    init,
    key,
    num_samples=1000,
    num_warmup=500,
    max_tree_depth=8,
    initial_step_size=0.1,
    target_accept=0.8,
    adapt_mass=True,
    adapt_max_depth=True,
    mesh=None,
):
    """Run NUTS on `log_prob` (theta [dim] -> scalar).

    init: [num_chains, dim]. Returns NUTSResult with samples
    [num_samples, num_chains, dim]. Chains shard over mesh's 'chain' axis.

    adapt_max_depth: under SIMD lockstep every chain pays the full
    2^max_tree_depth leapfrog budget whether its U-turn came early or not
    — on easy geometry a depth-8 budget wastes ~every doubling (measured
    47x behind ChEES on ESS/s, docs/PERF.md §Sampling). When True
    (default), the second half of warmup records the tree depths chains
    ACTUALLY reach and the sampling phase recompiles its kernel with
    max_depth = that distribution's 90th percentile + 1 (clipped to
    [2, max_tree_depth]). A depth cap never biases NUTS — the budgeted
    kernel is a valid (just truncated) trajectory sampler either way, so
    this trades nothing but the compile of one extra program. Hard
    geometry that genuinely uses the full budget keeps it.
    """
    init = jnp.atleast_2d(jnp.asarray(init))
    num_chains, dim = init.shape
    vg = jax.value_and_grad(log_prob)
    kernel = _nuts_kernel(vg, max_tree_depth)
    v_kernel = jax.vmap(kernel, in_axes=(0, 0, 0, 0, 0, 0))

    def warmup_step(carry, key):
        theta, logp, grad, da, w_mean, w_m2, count = carry
        keys = jax.random.split(key, num_chains)
        eps = jnp.exp(da.log_eps)
        inv_mass_now = jnp.where(
            jnp.logical_and(adapt_mass, count > 10.0),
            w_m2 / jnp.maximum(count - 1.0, 1.0),
            jnp.ones_like(w_m2),
        )
        theta, logp, grad, accept, nsteps = v_kernel(
            theta, logp, grad, keys, eps, inv_mass_now
        )
        da = _da_update(da, accept, target=target_accept)
        count = count + 1.0
        delta = theta - w_mean
        w_mean = w_mean + delta / count
        w_m2 = w_m2 + delta * (theta - w_mean)
        return (theta, logp, grad, da, w_mean, w_m2, count), nsteps

    def run_warmup(init, k_warm):
        logp0, grad0 = jax.vmap(vg)(init)
        da = _da_init(jnp.full((num_chains,), initial_step_size))
        w_mean = jnp.zeros((num_chains, dim))
        w_m2 = jnp.zeros((num_chains, dim))
        carry = (init, logp0, grad0, da, w_mean, w_m2, jnp.zeros(()))
        carry, warm_nsteps = jax.lax.scan(
            warmup_step, carry, jax.random.split(k_warm, num_warmup)
        )
        theta, logp, grad, da, w_mean, w_m2, count = carry
        eps = jnp.exp(da.log_eps_bar)
        if adapt_mass:
            var = w_m2 / jnp.maximum(count - 1.0, 1.0)
            inv_mass = jnp.where(var > 0, var, 1.0)
        else:
            inv_mass = jnp.ones((num_chains, dim))
        return theta, logp, grad, eps, inv_mass, warm_nsteps

    def make_run_sampling(depth):
        kern = (
            v_kernel
            if depth == max_tree_depth
            else jax.vmap(_nuts_kernel(vg, depth), in_axes=(0, 0, 0, 0, 0, 0))
        )

        def sample_step(carry, key):
            theta, logp, grad, eps, inv_mass = carry
            keys = jax.random.split(key, num_chains)
            theta, logp, grad, accept, nsteps = kern(
                theta, logp, grad, keys, eps, inv_mass
            )
            return (theta, logp, grad, eps, inv_mass), (theta, accept, nsteps)

        def run_sampling(theta, logp, grad, eps, inv_mass, k_samp):
            carry = (theta, logp, grad, eps, inv_mass)
            carry, (samples, accept, nsteps) = jax.lax.scan(
                sample_step, carry, jax.random.split(k_samp, num_samples)
            )
            theta, logp, grad, eps, inv_mass = carry
            return NUTSResult(samples, accept, nsteps, eps, inv_mass, logp)

        return run_sampling

    k_warm, k_samp = jax.random.split(key)
    if mesh is not None:
        from ..parallel.mesh import CHAIN_AXIS

        chain2 = NamedSharding(mesh, P(None, CHAIN_AXIS))
        chain1 = NamedSharding(mesh, P(CHAIN_AXIS))
        init = jax.device_put(init, chain1)
        # chain axis is dim 0 for all per-chain state (P('chain') leaves
        # trailing dims replicated); warm_nsteps is [num_warmup, chains]
        warm = jax.jit(
            run_warmup,
            out_shardings=(chain1, chain1, chain1, chain1, chain1, chain2),
        )(init, k_warm)
    else:
        warm = jax.jit(run_warmup)(init, k_warm)
    theta, logp, grad, eps, inv_mass, warm_nsteps = warm

    depth = max_tree_depth
    if adapt_max_depth and num_warmup >= 20:
        # second-half warmup tree sizes -> the depth the chains actually
        # use; nsteps ~ 2^d - 1 at a depth-d U-turn
        tail = np.asarray(warm_nsteps)[num_warmup // 2 :]
        q90 = float(np.quantile(tail, 0.9))
        depth = int(np.clip(int(np.ceil(np.log2(q90 + 1.0))) + 1, 2,
                            max_tree_depth))

    run_sampling = make_run_sampling(depth)
    if mesh is not None:
        run_s = jax.jit(
            run_sampling,
            out_shardings=NUTSResult(
                chain2, chain2, chain2, chain1, chain1, chain1
            ),
        )
        return run_s(theta, logp, grad, eps, inv_mass, k_samp)
    return jax.jit(run_sampling)(theta, logp, grad, eps, inv_mass, k_samp)
