"""Profiling and observability.

The reference ships ``[profiling] dump_timeline / dump_tensorboard`` config
keys with NO consuming code (`/root/reference/Henbun/henbunrc:17-19`,
SURVEY.md §5.1). Here they are honored for real: when enabled, training
drivers wrap hot sections in `jax.profiler` traces that TensorBoard (with the
profile plugin) can open, and `annotate` exposes named scopes for the trace
viewer.
"""
from __future__ import annotations

import contextlib
import os

import jax

from .._settings import settings


def profile_dir():
    d = settings.profiling.profile_dir
    os.makedirs(d, exist_ok=True)
    return d


@contextlib.contextmanager
def trace_if_enabled(name="henbun"):
    """Wrap a block in a jax.profiler trace when [profiling] dump_timeline or
    dump_tensorboard is set; a no-op otherwise."""
    enabled = bool(settings.profiling.dump_timeline) or bool(
        settings.profiling.dump_tensorboard
    )
    if not enabled:
        yield
        return
    d = profile_dir()
    jax.profiler.start_trace(d)
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named scope visible in profiler traces (and XLA HLO metadata)."""
    return jax.named_scope(name)


class StepMetrics:
    """Lightweight host-0 training metrics: objective, steps/s, grad norm.

    The reference's only observability is print('compiling...')
    (`model.py:216,230`); this replaces it with per-chunk metrics honoring
    the [verbosity] optimisation_verb flag.
    """

    def __init__(self, log_every=1):
        self.log_every = log_every
        self.rows = []

    def record(self, step, objective, seconds, n_steps, extra=None):
        import numpy as np

        row = {
            "step": int(step),
            "objective": float(np.asarray(objective).reshape(-1)[-1]),
            "steps_per_s": float(n_steps / seconds) if seconds > 0 else float("inf"),
        }
        if extra:
            row.update(extra)
        self.rows.append(row)
        if settings.verbosity.optimisation_verb and jax.process_index() == 0:
            if len(self.rows) % self.log_every == 0:
                print(
                    "[henbun] step %(step)d  objective %(objective).6g  "
                    "%(steps_per_s).1f steps/s" % row
                )
        return row
