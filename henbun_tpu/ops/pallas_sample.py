"""Fused reparameterized sample + KL for diagonal Normal posteriors.

The amortized-SVI inner loop (encoder slab -> local q -> sample -> KL,
`reference variationals.py:121-129,225-230`) reads the slab twice in the
naive formulation: once to build the sample, once for the KL. This kernel
tiles the batch axis and produces BOTH the posterior sample and the per-tile
KL partial sums in one VMEM pass over the slab:

    slab = [mu | log_sigma]  ([N, 2s]);  u ~ N(0,1)  ([N, s])
    raw  = mu + exp(log_sigma) * u
    KL   = -0.5 * sum(2*log_sigma + u^2 - raw^2)      (Normal._KL)

Gradients via custom VJP (recompute-from-inputs backward in plain XLA).
Composable with :mod:`pallas_mlp` for a fully fused encoder->sample->KL
chain; both are opt-in pending shapes where they beat XLA fusion (see
docs/PERF.md).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256


def _kernel(slab_ref, u_ref, sample_ref, kl_ref):
    s = u_ref.shape[-1]
    mu = slab_ref[:, :s]
    logsig = slab_ref[:, s:]
    u = u_ref[:]
    raw = mu + jnp.exp(logsig) * u
    sample_ref[:] = raw
    kl_ref[0, 0] = -0.5 * jnp.sum(
        2.0 * logsig + jnp.square(u) - jnp.square(raw)
    )


def _fused_pallas(slab, u, interpret):
    n, s = u.shape
    assert slab.shape == (n, 2 * s)
    n_pad = -(-n // TILE_N) * TILE_N
    if n_pad != n:
        # pad with zeros: mu=0, logsig=0, u=0 -> raw=0, KL contribution
        # -0.5*(0+0-0)=0 per padded element... logsig=0 contributes 0; exact
        slab = jnp.pad(slab, ((0, n_pad - n), (0, 0)))
        u = jnp.pad(u, ((0, n_pad - n), (0, 0)))
    grid = (n_pad // TILE_N,)
    sample, kl_parts = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, 2 * s), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_N, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, s), slab.dtype),
            jax.ShapeDtypeStruct((grid[0], 1), slab.dtype),
        ],
        interpret=interpret,
    )(slab, u)
    return sample[:n], jnp.sum(kl_parts)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_normal_sample_kl(slab, u, interpret=False):
    """(sample [N, s], KL scalar) from a [mu | log_sigma] slab and noise u."""
    return _fused_pallas(slab, u, interpret)


def _fwd(slab, u, interpret):
    out = _fused_pallas(slab, u, interpret)
    return out, (slab, u)


def _bwd(interpret, res, cotangents):
    slab, u = res
    g_sample, g_kl = cotangents
    s = u.shape[-1]
    mu = slab[:, :s]
    logsig = slab[:, s:]
    e = jnp.exp(logsig)
    raw = mu + e * u
    d_mu = g_sample + g_kl * raw
    d_logsig = g_sample * e * u + g_kl * (raw * e * u - 1.0)
    d_u = g_sample * e + g_kl * (raw * e - u)
    return jnp.concatenate([d_mu, d_logsig], axis=-1), d_u


fused_normal_sample_kl.defvjp(_fwd, _bwd)
