"""Vectorized log-probability builder: model objective -> flat density.

The north-star capability (BASELINE.json): compile the same Parameterized
model tree used for VI into a pure ``log_prob(theta)`` over a flat
unconstrained vector, suitable for HMC/NUTS/SMC. Transform log-Jacobians for
constrained Variables are added so samplers run in free space but target the
constrained-space posterior (change of variables).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..core import context as _ctx
from ..core.param import MinibatchData, graph_key


@dataclass
class FlatLogProb:
    """A flat view of a model's log density over a parameter collection.

    Attributes:
      log_prob: theta [dim] -> scalar log density (jit/vmap/grad-safe)
      dim: flat dimension
      unravel / ravel: flat vector <-> {path: free-space array}
      initial: the model's current free values, flattened
    """

    log_prob: Callable
    dim: int
    paths: list
    shapes: list
    initial: jnp.ndarray
    _model: object = None
    _collection: object = None

    def unravel(self, theta):
        out = {}
        off = 0
        for path, shape in zip(self.paths, self.shapes):
            size = int(np.prod(shape)) if len(shape) else 1
            out[path] = jnp.reshape(theta[off : off + size], shape)
            off += size
        return out

    def ravel(self, params):
        return jnp.concatenate(
            [jnp.ravel(jnp.asarray(params[p])) for p in self.paths]
        )

    def set_model_state(self, theta):
        """Write a flat sample back into the model tree (free space)."""
        self._model.set_param_dict(
            {k: np.asarray(v) for k, v in self.unravel(theta).items()}
        )


def make_log_prob(
    model,
    method,
    collection=None,
    add_transform_jacobians=True,
    minibatch_index=None,
):
    """Build a FlatLogProb from an objective method of `model`.

    - method: a raw method, an @AutoOptimize-decorated method, a method name,
      or an Optimizer instance — the traced body must return the log density
      (e.g. the MAP ``logp`` objectives of the reference's notebooks).
    - collection: which Variables form theta; everything else is frozen at its
      current value.
    - add_transform_jacobians: include sum_i log|J_i| for constrained
      Variables in the collection so sampling in free space targets the
      constrained posterior.

    The model must not contain unfed LOCAL variables on the traced path.
    """
    from ..model import Optimizer as _Opt

    if isinstance(method, str):
        method = getattr(type(model), method)
    if isinstance(method, _Opt):
        method = method.likelihood_method
    method = getattr(method, "__wrapped__", method)

    model.initialize()
    target = model.param_dict(collection)
    frozen = model.param_dict(exclude=collection) if collection is not None else {}
    if len(target) == 0:
        raise ValueError("no variables in collection %r" % (collection,))
    paths = sorted(target.keys())
    shapes = [tuple(np.asarray(target[p]).shape) for p in paths]
    sizes = [int(np.prod(s)) if len(s) else 1 for s in shapes]
    dim = int(np.sum(sizes))
    initial = jnp.concatenate([jnp.ravel(jnp.asarray(target[p])) for p in paths])

    data = {}
    for v in model.get_variables(graph_key.DATA):
        path = v.path_to(model)
        arr = jnp.asarray(v.data)
        if isinstance(v, MinibatchData) and minibatch_index is not None:
            arr = arr[jnp.asarray(minibatch_index)]
        data[path] = arr

    transforms_by_path = {
        v.path_to(model): v.transform for v in model.get_variables(collection)
        if v.collections not in graph_key.not_parameters
    }

    def log_prob(theta, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        params = dict(frozen)
        off = 0
        for path, shape, size in zip(paths, shapes, sizes):
            params[path] = jnp.reshape(theta[off : off + size], shape)
            off += size
        with _ctx.trace(model, params, data, key):
            lp = method(model)
        if add_transform_jacobians:
            off = 0
            for path, shape, size in zip(paths, shapes, sizes):
                t = transforms_by_path.get(path)
                if t is not None:
                    lp = lp + jnp.sum(
                        t.tf_log_jacobian(jnp.reshape(theta[off : off + size], shape))
                    )
                off += size
        return lp

    return FlatLogProb(
        log_prob=log_prob,
        dim=dim,
        paths=paths,
        shapes=shapes,
        initial=initial,
        _model=model,
        _collection=collection,
    )
