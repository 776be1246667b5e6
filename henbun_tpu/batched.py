"""Batched multi-model training: N independent model fits in ONE device
program.

The reference's only vectorization idiom is the ``n_layers`` leading axis on
individual Variables (`/root/reference/Henbun/param.py:157-179`). This module
generalizes it to WHOLE MODELS: N structurally-identical models (e.g.
per-output, per-fold, or per-restart fits) have their parameter trees stacked
on a new leading axis and their objectives vmapped, so one jitted
``lax.scan`` chunk advances all N fits per step. On TPU this turns N
latency-bound small-model runs into one MXU-friendly batched program — the
per-step cost grows far slower than N (measured in
``benchmarks/batched_bench.py``).

Because Adam (and every elementwise optax transform) is per-parameter, the
stacked update IS N independent optimizer runs — no semantic change versus N
separate :class:`~henbun_tpu.model.Optimizer` loops beyond sharing the step
schedule. Gradients decouple: the summed objective's gradient w.r.t. model
i's parameters is exactly model i's gradient.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ._settings import settings
from .core import context as _ctx
from .core.param import MinibatchData, graph_key
from .model import Optimizer, _resolve_method


class BatchedOptimizer(Optimizer):
    """Train N structurally-identical models as one program.

    - models: list of Model instances with identical tree structure and
      identical data shapes (different data VALUES are the point).
    - The recorded per-step objective is the SUM over models (per-model
      histories decouple; inspect each model's parameters after training).
    - Inherits the unified driver: scan chunks, nan-guard rollback, orbax
      save/restore of the stacked state, callbacks, StepMetrics, and both
      minibatch modes (selection is drawn independently per model).
    """

    def __init__(self, models, likelihood_method):
        if len(models) < 1:
            raise ValueError("need at least one model")
        super().__init__(models[0], _resolve_method(models[0], likelihood_method))
        self.models = list(models)

    # ------------------------------------------------------------ structure
    def _check_structure(self):
        ref_p = {k: np.shape(v) for k, v in self.models[0].param_dict().items()}
        ref_d = {k: np.shape(v) for k, v in self.models[0].data_dict().items()}
        for i, m in enumerate(self.models[1:], 1):
            p = {k: np.shape(v) for k, v in m.param_dict().items()}
            d = {k: np.shape(v) for k, v in m.data_dict().items()}
            if p != ref_p or d != ref_d:
                raise ValueError(
                    "model %d does not match model 0's tree structure "
                    "(params %r vs %r; data %r vs %r)" % (i, p, ref_p, d, ref_d)
                )

    def _stack(self, dicts):
        return {
            k: jnp.stack([np.asarray(d[k]) for d in dicts]) for k in dicts[0]
        }

    # ---------------------------------------------------------------- build
    def compile(self, optimizer=None, collection=graph_key.VARIABLES,
                global_step=None, learning_rate=0.001, num_elbo_samples=1):
        if global_step is not None:
            raise ValueError(
                "compile(global_step=...) is not supported: pass the "
                "schedule inside the optimizer, e.g. "
                "optax.adam(optax.exponential_decay(...))."
            )
        if settings.verbosity.tf_compile_verb:
            print("compiling (batched x%d)..." % len(self.models))
        self.optimizer = (
            optimizer if optimizer is not None else optax.adam(learning_rate)
        )
        self.collection = collection
        self._check_structure()
        for m in self.models:
            m.initialize()
            m.validate()
        sizes = {m._index.data_size for m in self.models}
        if len(sizes) > 1:
            raise ValueError(
                "batched minibatch training needs equal data sizes; got %r"
                % sorted(s for s in sizes if s is not None)
            )

        model = self.model
        self._mb_paths = frozenset(
            v.path_to(model)
            for v in model.get_variables(graph_key.DATA)
            if isinstance(v, MinibatchData)
        )
        self._trainable = self._stack(
            [m.param_dict(collection) for m in self.models]
        )
        self._frozen = self._stack(
            [m.param_dict(exclude=collection) for m in self.models]
        )
        if len(self._trainable) == 0:
            raise ValueError(
                "no variables found in collection %r" % (collection,)
            )
        self.opt_state = self.optimizer.init(self._trainable)

        method = self.likelihood_method
        mb_paths = self._mb_paths
        M = len(self.models)

        self._diag_guards = guards = {}

        def one_model(trainable_i, frozen_i, d_i, key_i):
            params = dict(trainable_i)
            params.update(frozen_i)
            with _ctx.trace(model, params, d_i, key_i) as ctx:
                val = method(model)
                diags = dict(ctx.diagnostics)
                guards.update(ctx.diagnostic_guards)
            return val, diags

        def evaluate_core_aux(trainable, frozen, d, key):
            vals, diags = jax.vmap(one_model)(
                trainable, frozen, d, jax.random.split(key, M)
            )
            # guard on the worst model in the fleet
            return jnp.sum(vals), jax.tree_util.tree_map(
                lambda a: jnp.max(a, axis=0), diags
            )

        if num_elbo_samples > 1:
            S = int(num_elbo_samples)
            _core_one = evaluate_core_aux

            def evaluate_core_aux(trainable, frozen, d, key):
                keys = jax.random.split(key, S)
                vals, diags = jax.vmap(
                    lambda k: _core_one(trainable, frozen, d, k)
                )(keys)
                return jnp.mean(vals), jax.tree_util.tree_map(
                    lambda a: jnp.max(a, axis=0), diags
                )

        def evaluate_core(trainable, frozen, d, key):
            return evaluate_core_aux(trainable, frozen, d, key)[0]

        self._evaluate_core_aux = evaluate_core_aux

        def evaluate(trainable, frozen, data, idx, key):
            d = {}
            for path, arr in data.items():
                if idx is not None and path in mb_paths:
                    d[path] = jnp.take(arr, idx, axis=1)  # shared eval rows
                else:
                    d[path] = arr
            return evaluate_core(trainable, frozen, d, key)

        self._evaluate_core = evaluate_core
        self._evaluate = evaluate

        data_shapes = {
            k: jax.ShapeDtypeStruct(v.shape, v.dtype)
            for k, v in self._data_args().items()
        }
        jax.eval_shape(
            lambda t, f, d, k: evaluate(t, f, d, None, k),
            self._trainable, self._frozen, data_shapes, jax.random.PRNGKey(0),
        )
        self._eval_jit = jax.jit(evaluate)
        self._eval_full_jit = jax.jit(
            lambda t, f, data, key: evaluate(t, f, data, None, key)
        )
        self._chunk_cache = {}
        self._compiled = True
        if settings.verbosity.tf_compile_verb:
            print("finished.")
        return self

    # ------------------------------------------------------ Optimizer hooks
    def _data_args(self):
        per_model = []
        for m in self.models:
            per_model.append(
                {
                    v.path_to(m): np.asarray(v.device_value())
                    for v in m.get_variables(graph_key.DATA)
                }
            )
        return self._stack(per_model)

    def _commit_params(self, trainable):
        for i, m in enumerate(self.models):
            m.set_param_dict({k: v[i] for k, v in trainable.items()})

    def _refresh_params(self):
        if any(m.initialize_ops for m in self.models):
            for m in self.models:
                m.initialize()
            self._trainable = self._stack(
                [m.param_dict(self.collection) for m in self.models]
            )
            self._frozen = self._stack(
                [m.param_dict(exclude=self.collection) for m in self.models]
            )
        for m in self.models:
            m.validate()

    def _prepare_optimize_data(self, data, minibatch_size, mode):
        model = self.model
        if minibatch_size is None:
            return data, jnp.zeros((1,), dtype=jnp.int32), 1
        if model._index.data_size is None:
            raise ValueError(
                "minibatch_size=%r was passed but the models have no "
                "MinibatchData." % (minibatch_size,)
            )
        train_idx = jnp.asarray(model._index._train_index)
        train_size = int(model._index.train_size)
        if mode == "block":
            data = {
                path: (
                    jnp.take(arr, train_idx, axis=1)
                    if path in self._mb_paths
                    else arr
                )
                for path, arr in data.items()
            }
        return data, train_idx, train_size

    def _make_select_batch(self, minibatch_size, train_size, mode):
        """Independent per-model row selection (vmapped over the model axis),
        matching N separate Indexer streams."""
        if minibatch_size is None:
            return lambda data, train_idx, key: (data, key)
        mb_paths = self._mb_paths
        mb = minibatch_size
        M = len(self.models)

        if mode == "block":

            def select(data, train_idx, key):
                k_i, k_s = jax.random.split(key)
                starts = jax.random.randint(
                    k_i, (M,), 0, max(train_size - mb + 1, 1)
                )
                take = jax.vmap(
                    lambda a, s: jax.lax.dynamic_slice_in_dim(a, s, mb, 0)
                )
                d = {
                    path: (take(arr, starts) if path in mb_paths else arr)
                    for path, arr in data.items()
                }
                return d, k_s

            return select

        def select(data, train_idx, key):
            k_i, k_s = jax.random.split(key)
            sel = jax.random.randint(k_i, (M, mb), 0, train_size)
            idx = jnp.take(train_idx, sel)  # [M, mb]
            gather = jax.vmap(lambda a, i: jnp.take(a, i, axis=0))
            d = {
                path: (gather(arr, idx) if path in mb_paths else arr)
                for path, arr in data.items()
            }
            return d, k_s

        return select
