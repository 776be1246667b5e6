"""Name scoping (API parity with `/root/reference/Henbun/scoping.py:21-41`).

``NameScoped`` wraps a function in a `jax.named_scope`, so the scope name
shows up in profiler traces and XLA HLO metadata — the role tf.name_scope
played for TF graph readability. ``Parameterized.scoped_keys`` methods get
this automatically during a trace.
"""
from __future__ import annotations

import functools

import jax


class NameScoped:
    def __init__(self, name):
        self.name = name

    def __call__(self, fn):
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            with jax.named_scope(self.name):
                return fn(*args, **kwargs)

        return wrapped
