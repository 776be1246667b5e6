"""Serving: ahead-of-time export of trained predictors as portable,
self-contained StableHLO artifacts.

The reference has no deployment story — prediction is ``session.run`` inside
the training process (`/root/reference/Henbun/model.py:84-96`, notebooks
drawing posterior bands in Python loops). For production serving the TPU-native
inverse of the training design is wanted: a versioned, compiled artifact with
the trained parameters and training data baked in as constants, callable
without the model object, the model class, or this package — only ``jax``.
``jax.export`` provides exactly that (serialized StableHLO with forward/
backward-compatibility guarantees and multi-platform lowering), so this module
is a thin adapter from the model-tree world onto it:

* :func:`export_predictor` — a deterministic function of the model
  (``predict_f``, EP/Laplace marginals, quadrature class probabilities …)
  becomes ``artifact(x_new, ...)``.
* :func:`export_sampler` — a stochastic function (posterior draws) becomes
  ``artifact(seed, x_new, ...) -> [num_draws, ...]`` with the draw loop
  vmapped inside the artifact (the reference looped ``session.run`` per draw,
  GaussianProcess.ipynb cell 17).
* ``batch_polymorphic=True`` marks the leading axis of every array argument
  symbolic, so ONE artifact serves any batch size without retracing or
  re-export (shape-polymorphic StableHLO).

Artifacts are cross-platform by default (``platforms=("cpu", "tpu")``): the
same saved file serves from a TPU pod or a CPU canary.
"""
from __future__ import annotations

import pathlib

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as _jx

from .core import context as _ctx
from .model import _resolve_method

__all__ = [
    "ServingArtifact",
    "export_predictor",
    "export_sampler",
    "load",
    "deserialize",
]

_DEFAULT_PLATFORMS = ("cpu", "tpu")


class ServingArtifact:
    """A compiled, self-contained predictor.

    Wraps a ``jax.export.Exported``: call it like a function, ``save`` it to
    disk, or ``serialize()`` to bytes. Loading needs only jax —
    ``henbun_tpu.serving.load`` is a convenience, equivalent to
    ``jax.jit(jax.export.deserialize(blob).call)``.
    """

    def __init__(self, exported: "_jx.Exported"):
        self._exported = exported
        self._call = jax.jit(exported.call)

    def __call__(self, *args):
        return self._call(*args)

    # ------------------------------------------------------------ persistence
    def serialize(self) -> bytes:
        return self._exported.serialize()

    def save(self, path) -> None:
        pathlib.Path(path).write_bytes(self.serialize())

    # ---------------------------------------------------------- introspection
    @property
    def platforms(self):
        return tuple(self._exported.platforms)

    @property
    def in_avals(self):
        return self._exported.in_avals

    @property
    def out_avals(self):
        return self._exported.out_avals

    def __repr__(self):
        return "ServingArtifact(platforms=%r, in=%s, out=%s)" % (
            list(self.platforms),
            list(self.in_avals),
            list(self.out_avals),
        )


def load(path) -> ServingArtifact:
    """Load an artifact saved by :meth:`ServingArtifact.save`."""
    return deserialize(pathlib.Path(path).read_bytes())


def deserialize(blob: bytes) -> ServingArtifact:
    return ServingArtifact(_jx.deserialize(bytearray(blob)))


# --------------------------------------------------------------------- export
def _frozen_state(model):
    """Committed parameters and device data, captured by value — these become
    embedded constants in the exported module, making it self-contained."""
    model.initialize()
    params = {k: jnp.asarray(v) for k, v in model.param_dict().items()}
    data = {k: jnp.asarray(v) for k, v in model._gather_data(None).items()}
    return params, data


def _example_specs(example_args, batch_polymorphic):
    if not batch_polymorphic:
        return tuple(example_args)
    # every array argument's leading axis becomes the same symbolic dim, so
    # one artifact serves any batch size; scalars pass through untouched.
    # ONE symbol shared across arguments — per-argument symbolic_shape calls
    # create distinct SymbolicScopes and jax.export rejects the mix.
    (b,) = _jx.symbolic_shape("b")
    specs = []
    for a in example_args:
        arr = np.asarray(a)
        if arr.ndim == 0:
            specs.append(jax.ShapeDtypeStruct(arr.shape, arr.dtype))
        else:
            specs.append(
                jax.ShapeDtypeStruct((b,) + arr.shape[1:], arr.dtype)
            )
    return tuple(specs)


def export_predictor(
    model,
    fn,
    *example_args,
    platforms=_DEFAULT_PLATFORMS,
    batch_polymorphic=False,
):
    """Export a deterministic model function as a serving artifact.

    ``fn`` is a model method in any of the usual shapes (bound method,
    unbound function, method-name string, @AutoOptimize objective); it is
    traced once with the CURRENT committed parameters and data baked in as
    constants. Any reparameterization noise drawn inside is pinned to a fixed
    key — use :func:`export_sampler` for genuinely stochastic outputs.

    >>> art = serving.export_predictor(m, GPRMarginal.predict_f, grid)
    >>> art.save("gpr.hlo")                  # later, anywhere:
    >>> mean, var = serving.load("gpr.hlo")(grid2)
    """
    method = _resolve_method(model, fn)
    params, data = _frozen_state(model)
    fixed_key = jax.random.PRNGKey(0)

    def pure(*args):
        with _ctx.trace(model, params, data, fixed_key, training=False):
            return method(model, *args)

    specs = _example_specs(example_args, batch_polymorphic)
    exported = _jx.export(jax.jit(pure), platforms=tuple(platforms))(*specs)
    return ServingArtifact(exported)


def export_sampler(
    model,
    fn,
    num,
    *example_args,
    platforms=_DEFAULT_PLATFORMS,
    batch_polymorphic=False,
):
    """Export a stochastic model function as ``artifact(seed, *args)``
    returning ``num`` posterior draws stacked on the leading axis.

    The draw loop is vmapped INSIDE the artifact (one device call for all
    draws, like :meth:`Model.draws`); ``seed`` is a scalar uint32/int so
    callers control reproducibility without shipping jax PRNG internals
    across the serialization boundary.
    """
    method = _resolve_method(model, fn)
    params, data = _frozen_state(model)

    def pure(seed, *args):
        keys = jax.random.split(jax.random.PRNGKey(seed), num)

        def one(k):
            with _ctx.trace(model, params, data, k, training=False):
                return method(model, *args)

        return jax.vmap(one)(keys)

    specs = _example_specs(example_args, batch_polymorphic)
    exported = _jx.export(jax.jit(pure), platforms=tuple(platforms))(
        jax.ShapeDtypeStruct((), np.uint32), *specs
    )
    return ServingArtifact(exported)
