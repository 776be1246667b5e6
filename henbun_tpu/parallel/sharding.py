"""Sharded (multi-chip) training: data-parallel ELBO steps over a Mesh.

The strategy (SURVEY.md §2.6/§5.8, scaling-book recipe): global parameters
and optimizer state REPLICATE; (minibatch) data arrays shard their leading
axis over the ``data`` mesh axis; the per-step minibatch gather, forward,
gradient and Adam update run inside one pjit-compiled scan. The gradient
all-reduce (psum over ``data``) is inserted by XLA's GSPMD partitioner from
the sharding annotations — no hand-written collectives, so the same code runs
on 1 chip, a v5e slice, or a multi-host pod (ICI/DCN routing is the
compiler's job).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from .._settings import settings
from ..core import context as _ctx
from ..core.param import MinibatchData, graph_key
from . import mesh as mesh_mod


class ShardedOptimizer:
    """A data-parallel analog of :class:`henbun_tpu.model.Optimizer`.

    Shards every MinibatchData array's leading axis over the mesh's ``data``
    axis and keeps parameters replicated. The jitted scan chunk carries the
    same semantics as the single-chip driver; with B the global minibatch
    size, each device gathers B/n_data local rows and XLA all-reduces the
    gradient.
    """

    def __init__(self, model, likelihood_method, mesh=None):
        self.model = model
        # accept: a raw method, an @AutoOptimize-decorated method (unwrap),
        # a method name string, or an Optimizer instance
        from ..model import Optimizer as _Opt

        if isinstance(likelihood_method, str):
            likelihood_method = getattr(type(model), likelihood_method)
        if isinstance(likelihood_method, _Opt):
            likelihood_method = likelihood_method.likelihood_method
        likelihood_method = getattr(
            likelihood_method, "__wrapped__", likelihood_method
        )
        self.likelihood_method = likelihood_method
        self.mesh = mesh if mesh is not None else mesh_mod.make_mesh()
        self.optimizer = None
        self.opt_state = None
        self._trainable = None
        self._frozen = None
        self._chunk_cache = {}
        self.history = []

    # -------------------------------------------------------------- sharding
    def _repl(self):
        return NamedSharding(self.mesh, P())

    def _data_sharding(self, path):
        if path in self._mb_paths:
            return NamedSharding(self.mesh, P(mesh_mod.DATA_AXIS))
        return self._repl()

    def compile(self, optimizer=None, collection=graph_key.VARIABLES,
                learning_rate=0.001, num_elbo_samples=1):
        model = self.model
        self.optimizer = optimizer if optimizer is not None else optax.adam(learning_rate)
        self.collection = collection
        model.initialize()
        model.validate()
        self._mb_paths = frozenset(
            v.path_to(model)
            for v in model.get_variables(graph_key.DATA)
            if isinstance(v, MinibatchData)
        )
        repl = self._repl()
        self._trainable = {
            k: jax.device_put(v, repl)
            for k, v in model.param_dict(collection).items()
        }
        self._frozen = {
            k: jax.device_put(v, repl)
            for k, v in model.param_dict(exclude=collection).items()
        }
        self.opt_state = jax.device_put(
            self.optimizer.init(self._trainable), repl
        )
        method = self.likelihood_method
        mb_paths = self._mb_paths

        def evaluate_one(trainable, frozen, data, idx, key):
            params = dict(trainable)
            params.update(frozen)
            d = {}
            for path, arr in data.items():
                if idx is not None and path in mb_paths:
                    d[path] = jnp.take(arr, idx, axis=0)
                else:
                    d[path] = arr
            with _ctx.trace(model, params, d, key):
                return method(model)

        if num_elbo_samples > 1:
            S = int(num_elbo_samples)

            def evaluate(trainable, frozen, data, idx, key):
                keys = jax.random.split(key, S)
                vals = jax.vmap(
                    lambda k: evaluate_one(trainable, frozen, data, idx, k)
                )(keys)
                return jnp.mean(vals)

        else:
            evaluate = evaluate_one

        self._evaluate = evaluate
        return self

    def _sharded_data(self):
        out = {}
        for v in self.model.get_variables(graph_key.DATA):
            path = v.path_to(self.model)
            out[path] = jax.device_put(
                v.device_value(), self._data_sharding(path)
            )
        return out

    def _get_chunk(self, minibatch_size, n_steps, train_size):
        cache_key = (minibatch_size, n_steps, train_size)
        if cache_key in self._chunk_cache:
            return self._chunk_cache[cache_key]
        evaluate = self._evaluate
        tx = self.optimizer
        mb = minibatch_size

        def chunk(trainable, opt_state, frozen, data, keys, train_idx):
            def one_step(carry, key):
                trainable, opt_state = carry
                if mb is None:
                    idx, k_s = None, key
                else:
                    k_i, k_s = jax.random.split(key)
                    sel = jax.random.randint(k_i, (mb,), 0, train_size)
                    idx = jnp.take(train_idx, sel)
                loss, grads = jax.value_and_grad(
                    lambda t: -evaluate(t, frozen, data, idx, k_s)
                )(trainable)
                updates, opt_state = tx.update(grads, opt_state, trainable)
                trainable = optax.apply_updates(trainable, updates)
                return (trainable, opt_state), -loss

            (trainable, opt_state), objs = jax.lax.scan(
                one_step, (trainable, opt_state), keys
            )
            return trainable, opt_state, objs

        repl = self._repl()
        data_sh = {
            v.path_to(self.model): self._data_sharding(v.path_to(self.model))
            for v in self.model.get_variables(graph_key.DATA)
        }
        train_p_sh = jax.tree_util.tree_map(lambda _: repl, self._trainable)
        frozen_sh = jax.tree_util.tree_map(lambda _: repl, self._frozen)
        opt_sh = jax.tree_util.tree_map(lambda _: repl, self.opt_state)
        fn = jax.jit(
            chunk,
            in_shardings=(train_p_sh, opt_sh, frozen_sh, data_sh, repl, repl),
            out_shardings=(train_p_sh, opt_sh, repl),
            donate_argnums=(0, 1),
        )
        self._chunk_cache[cache_key] = fn
        return fn

    def _refresh_params(self):
        """Pick up staged assignments made since the last call (parity with
        Optimizer._refresh_params)."""
        model = self.model
        if model.initialize_ops:
            model.initialize()
            repl = self._repl()
            self._trainable = {
                k: jax.device_put(v, repl)
                for k, v in model.param_dict(self.collection).items()
            }
            self._frozen = {
                k: jax.device_put(v, repl)
                for k, v in model.param_dict(exclude=self.collection).items()
            }
        model.validate()

    def optimize(self, maxiter=1, minibatch_size=None):
        model = self.model
        self._refresh_params()
        data = self._sharded_data()
        if minibatch_size is not None:
            train_idx = jnp.asarray(model._index._train_index)
            train_size = int(model._index.train_size)
        else:
            train_idx = jnp.zeros((1,), dtype=jnp.int32)
            train_size = 1
        chunk_size = int(settings.tpu.scan_chunk)
        trainable, opt_state = self._trainable, self.opt_state
        done = 0
        try:
            while done < maxiter:
                n = min(chunk_size, maxiter - done)
                keys = jax.random.split(model._next_key(), n)
                fn = self._get_chunk(minibatch_size, n, train_size)
                trainable, opt_state, objs = fn(
                    trainable, opt_state, self._frozen, data, keys, train_idx
                )
                done += n
                self.history.append(np.asarray(objs))
        finally:
            self._trainable = trainable
            self.opt_state = opt_state
            self.model.set_param_dict(
                {k: np.asarray(v) for k, v in trainable.items()}
            )
        return self

    def run(self, key=None):
        data = self._sharded_data()
        if key is None:
            key = self.model._next_key()
        if not hasattr(self, "_run_jit"):
            self._run_jit = jax.jit(
                lambda t, f, d, k: self._evaluate(t, f, d, None, k)
            )
        return np.asarray(
            self._run_jit(self._trainable, self._frozen, data, key)
        )
