"""Device-mesh helpers.

The reference is single-process/single-device (`SURVEY.md` §2.6-2.7: no
parallelism, no communication backend). The TPU-native scaling design: ONE
`jax.sharding.Mesh` per job with named axes ``('data', 'chain')`` — minibatches
and local-parameter slabs shard over ``data``, MCMC chains / SMC particles
over ``chain``, global parameters replicate. Collectives (gradient psum,
resampling all_gathers) are inserted by XLA's GSPMD partitioner from the
sharding annotations; ICI intra-slice and DCN inter-slice routing is handled
by the compiler.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
CHAIN_AXIS = "chain"


def make_mesh(n_data=None, n_chain=1, devices=None):
    """A Mesh over the given devices with ('data', 'chain') axes.

    By default all devices go to the data axis. In a multi-host job call
    jax.distributed.initialize() first; jax.devices() then spans the slice.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_chain
    if n_data * n_chain != n:
        raise ValueError(
            "mesh %dx%d does not cover %d devices" % (n_data, n_chain, n)
        )
    dev_array = np.asarray(devices).reshape(n_data, n_chain)
    return Mesh(dev_array, (DATA_AXIS, CHAIN_AXIS))


def replicated(mesh):
    return NamedSharding(mesh, P())


def data_sharded(mesh, ndim=None):
    """First axis sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def chain_sharded(mesh):
    """First axis sharded over the chain axis."""
    return NamedSharding(mesh, P(CHAIN_AXIS))


def shard_batch(mesh, arr):
    """Place an array with its leading axis sharded over `data`."""
    return jax.device_put(arr, data_sharded(mesh))


def initialize_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host bring-up (`jax.distributed.initialize`); a no-op for
    single-process jobs. Safe to call unconditionally at program start."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
