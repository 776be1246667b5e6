"""Host-side RNG used for parameter initialization.

The reference relies on TF's implicit graph-level seed for its
``tf.truncated_normal`` initializers (`/root/reference/Henbun/param.py:206-209`).
Here initialization happens eagerly on host with numpy; ``set_seed`` makes it
reproducible (the analog of ``tf.set_random_seed`` in the reference tests,
e.g. `testing/test_variationals.py:32-33`).

Device-side randomness (reparameterization noise, minibatch indices, samplers)
never touches this module — it flows through explicit `jax.random` keys
threaded by the trace context and the training driver.
"""
from __future__ import annotations

import numpy as np

_rng = np.random.default_rng(0)


def set_seed(seed):
    """Reset the host init RNG (and return it)."""
    global _rng
    _rng = np.random.default_rng(seed)
    return _rng


def get_rng():
    return _rng


def truncated_normal(shape, mean=0.0, stddev=1.0, dtype=np.float32):
    """Normal(mean, stddev) with draws beyond 2 stddev re-drawn, matching the
    semantics of the reference's tf.truncated_normal initializer."""
    shape = tuple(int(s) for s in shape)
    out = _rng.standard_normal(shape)
    for _ in range(8):
        bad = np.abs(out) > 2.0
        if not bad.any():
            break
        out[bad] = _rng.standard_normal(int(bad.sum()))
    out = np.clip(out, -2.0, 2.0)
    return (mean + stddev * out).astype(dtype)
