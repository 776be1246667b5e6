"""Encoder-slab conditioning for packed fullrank LOCAL posteriors.

A `fullrank_packed` local's slab feeds FACTOR entries directly (no log
transform like the diagonal family), so a fresh encoder's ~0 outputs start
every local near-singular (logdet ~ -46/dim dominates the KL), and O(1) raw
outputs wobble the factor exactly while the decoder is deciding whether to
use the latent at all — measured on the v5e at d_z=8, n=1e6: the run
collapses to an ignored latent paying 1-4 nats/point of junk-factor KL
(tail ELBO/n -11 vs -0.32; docs/PERF.md §Amortized). The cure, shared by
every amortized family here: bias the slab's diagonal slots +1 (factor
starts ~identity, the prior-matched init the non-LOCAL packed family also
uses) and scale the factor slots 0.1x (the encoder can still express any
factor through 10x output weights; only the init noise shrinks).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def packed_slab_conditioning(d_z, feed_size):
    """(bias, scale) arrays for a fullrank_packed local of latent dim d_z.

    Callers gate on q_local: families that need no conditioning simply don't
    call this (``condition_slab`` treats ``bias=None`` as identity)."""
    from henbun_tpu.ops.linalg import fill_triangular_diag_indices

    diag_slots = d_z + np.asarray(fill_triangular_diag_indices(d_z))
    bias = np.zeros(feed_size, np.float32)
    bias[diag_slots] = 1.0
    scale = np.full(feed_size, 0.1, np.float32)
    scale[:d_z] = 1.0
    return bias, scale


def condition_slab(slab, bias, scale):
    """Apply (bias, scale) to a raw encoder slab; identity when bias is None."""
    if bias is None:
        return slab
    return slab * jnp.asarray(scale) + jnp.asarray(bias)
