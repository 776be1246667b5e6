"""Trace context: the functional replacement for the reference's ``tf_mode``.

The reference flips a mutable ``_tf_mode`` flag across the whole tree and
swaps attribute access to graph tensors (`/root/reference/Henbun/param.py:342-453`).
On TPU the natural boundary is the `jit` trace: a model objective is an
ordinary Python method, executed once under `jax.jit` with a
:class:`TraceContext` active. During that execution:

* global ``Variable`` leaves read their *free* value from ``ctx.params`` and
  return the transformed tensor,
* ``Data`` leaves read from ``ctx.data`` (minibatch already gathered on
  device),
* LOCAL leaves read what the encoder fed via ``ctx.feeds`` (the
  "assignment = feeding" idiom, cf. `param.py:384-394`),
* ``Variational`` nodes draw their reparameterization noise once per trace
  with a key derived deterministically from the node path, and cache the
  sample in ``ctx.samples`` so that ``KL()`` sees the same noise
  (single-sample estimator, cf. `variationals.py:100-110,198-209`).

The context is thread-local and re-entrant; nothing is mutated on the model
objects themselves, so the traced function is pure and can be jitted,
vmapped (HMC chains) and pjitted (mesh sharding) freely.
"""
from __future__ import annotations

import threading
import zlib
from contextlib import contextmanager

import jax

_STATE = threading.local()


def current():
    """The innermost active TraceContext, or None outside any trace."""
    return getattr(_STATE, "ctx", None)


class TraceContext:
    __slots__ = (
        "root",
        "params",
        "data",
        "key",
        "feeds",
        "samples",
        "rng_counts",
        "training",
        "diagnostics",
        "diagnostic_guards",
    )

    def __init__(self, root, params, data, key, training=True):
        self.root = root
        self.params = params  # {path: free-space jnp array} for global Variables
        self.data = data      # {path: jnp array} for Data nodes (already minibatched)
        self.key = key        # base PRNG key for this trace
        self.feeds = {}       # {path: raw fed tensor} for LOCAL Variables
        self.samples = {}     # {path: dict(u=..., raw=..., transformed=...)} per Variational
        self.rng_counts = {}  # {tag: draw count} for tagged_key
        self.training = training
        self.diagnostics = {}        # {name: traced scalar} side-channel
        self.diagnostic_guards = {}  # {name: (tol, hint)} static guard specs

    def report_diagnostic(self, name, value, guard_tol=None, hint=""):
        """Expose a traced scalar to the training driver.

        An objective's internal validity signal (e.g. EP's last-sweep site
        change, whose stationarity gradient is only exact at convergence) has
        no path out of a jitted scan through the scalar objective. Reported
        diagnostics ride the chunk outputs: the Optimizer stacks them per
        step, records the latest value in StepMetrics, and — when
        ``guard_tol`` is given — aborts the run with ``hint`` in the message
        on a PERSISTENT violation (chunk ends above tol, or >25% of its
        steps violate; isolated transient spikes only warn — the nan-guard
        'fail usefully' pattern, model.py:optimize). Values must be
        scalars; tol/hint must be static Python
        values. Repeated reports under one name within a trace keep the
        elementwise MAX (several EP blocks in one objective guard on the
        worst one)."""
        if name in self.diagnostics:
            import jax.numpy as jnp

            value = jnp.maximum(self.diagnostics[name], value)
        self.diagnostics[name] = value
        if guard_tol is not None:
            self.diagnostic_guards[name] = (float(guard_tol), str(hint))

    def node_key(self, path):
        """A PRNG key unique to a tree node, stable across mesh shapes and
        process counts: derived only from the trace key and the node path."""
        return jax.random.fold_in(self.key, zlib.crc32(path.encode()) & 0x7FFFFFFF)

    def tagged_key(self, tag):
        """A fresh key per call for a given tag — used by ops that draw noise
        several times in one trace (e.g. SparseGP correction noise)."""
        c = self.rng_counts.get(tag, 0)
        self.rng_counts[tag] = c + 1
        return jax.random.fold_in(self.node_key(tag), c)


@contextmanager
def trace(root, params, data, key, training=True):
    prev = getattr(_STATE, "ctx", None)
    _STATE.ctx = TraceContext(root, params, data, key, training=training)
    try:
        yield _STATE.ctx
    finally:
        _STATE.ctx = prev
