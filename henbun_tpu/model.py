"""Model base class and the compiled training driver.

Capability parity with `/root/reference/Henbun/model.py` (269 LoC): ``Model``
(tree root, ``setUp``, ``initialize``, ``run``, ``validate``,
``test_feed_dict``), ``Indexer`` (shuffled 90/10 train/test split with
random-with-replacement minibatch draws), the ``AutoOptimize`` decorator and
the ``Optimizer`` (``compile`` / ``run`` / ``optimize``).

TPU-native redesign of the hot loop: the reference runs ONE optimizer step per
``session.run``, crossing the Python↔runtime boundary and feeding the
minibatch host→device every iteration (`model.py:255-269`). Here the
objective, gradient, Adam update and the minibatch *gather* are one jitted
function, and `lax.scan` runs ``settings.tpu.scan_chunk`` optimization steps
per device call with donated parameter buffers. Data lives on device; the
per-step minibatch index is drawn on device with `jax.random`. This removes
both the per-step dispatch overhead and the per-step host feed.
"""
from __future__ import annotations

import time
from functools import wraps

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ._settings import settings, np_float
from .core import context as _ctx
from .core import rng as _rng
from .core.param import (
    Parentable,
    Variable,
    Parameterized,
    Data,
    MinibatchData,
    graph_key,
)


class Model(Parameterized):
    """Tree root; subclasses define parameters in setUp and objectives as
    methods decorated with @AutoOptimize() (cf. model.py:13-123)."""

    def __init__(self, name="model", seed=None, **kw):
        Parameterized.__init__(self)
        self._name = name
        self._index = Indexer()
        if seed is None:
            seed = int(_rng.get_rng().integers(0, 2**31 - 1))
        self._base_key = jax.random.PRNGKey(seed)
        self._key_count = 0
        self.setUp(**kw)

    @property
    def name(self):
        return self._name

    def setUp(self):
        """Parameter definitions belong here; overridden by subclasses."""
        pass

    def _next_key(self):
        self._key_count += 1
        return jax.random.fold_in(self._base_key, self._key_count)

    def run(self, fn, feed_dict=None, minibatch_index=None, key=None, training=True):
        """Evaluate `fn(model)` under a trace with the full data (or the given
        minibatch index) and the current committed parameters.

        The functional analog of the reference's ``Model.run(tensor)``
        (model.py:84-96): each call draws fresh reparameterization noise, so
        repeated calls give fresh posterior samples.
        """
        self.initialize()
        params = self.param_dict()
        data = self._gather_data(minibatch_index)
        if feed_dict:
            data.update(feed_dict)
        if key is None:
            key = self._next_key()
        with _ctx.trace(self, params, data, key, training=training):
            return fn(self)

    def draws(self, fn, num, key=None, minibatch_index=None):
        """`num` posterior draws of `fn(model)` as one vmapped+jitted call.

        The reference's notebooks loop `model.run(op)` 30-50 times for
        posterior bands (GaussianProcess.ipynb cell 17) — a session round-trip
        per draw. Here the trace is pure, so draws vectorize over PRNG keys
        into a single device call; the leading axis of the result is the draw
        axis.

        The jitted program is cached per objective function (bound methods
        hash by their underlying function), so repeated calls — and calls
        after committing new parameter values — reuse the same executable;
        only a change of `num` or of data shapes retraces.
        """
        self.initialize()
        params = self.param_dict()
        data = self._gather_data(minibatch_index)
        if key is None:
            key = self._next_key()

        cache = self.__dict__.setdefault("_draws_jit_cache", {})
        cache_key = getattr(fn, "__func__", fn)
        jitted = cache.get(cache_key)
        if jitted is None:

            def batched(params, data, keys):
                def one(k):
                    with _ctx.trace(self, params, data, k):
                        return fn(self)

                return jax.vmap(one)(keys)

            jitted = jax.jit(batched)
            # a fresh lambda can never be hit again — don't let plotting
            # loops fill the cache with dead entries (each pins its program
            # and closed-over arrays)
            if getattr(cache_key, "__name__", "") != "<lambda>":
                if len(cache) >= 32:  # evict oldest, keep the hot entries
                    cache.pop(next(iter(cache)))
                cache[cache_key] = jitted

        keys = jax.random.split(key, num)
        return jitted(params, data, keys)

    def _gather_data(self, minibatch_index=None):
        out = {}
        for v in self.get_variables(graph_key.DATA):
            path = v.path_to(self)
            if isinstance(v, MinibatchData) and minibatch_index is not None:
                out[path] = v.device_value()[jnp.asarray(minibatch_index)]
            else:
                out[path] = v.device_value()
        return out

    def validate(self):
        """Check minibatch data sizes agree and (re)set up the Indexer
        (cf. model.py:98-117). Unfed LOCAL variables are caught at trace time
        with the node's long_name in the error."""
        minibatch_data = [
            d
            for d in self.get_variables(graph_key.DATA)
            if isinstance(d, MinibatchData)
        ]
        if len(minibatch_data) > 1:
            for d in minibatch_data:
                if d.data_size != minibatch_data[0].data_size:
                    raise ValueError(
                        "Minibatch data " + d.long_name + " is not the same size."
                    )
        if len(minibatch_data) > 0:
            data_size = minibatch_data[0].data_size
            if self._index.data_size is None or self._index.data_size != data_size:
                self._index.setUp(data_size)

    def test_feed_dict(self, minibatch_size=None):
        """Indices of a random test minibatch (cf. model.py:119-123)."""
        return self._index.test_index(minibatch_size)


class Indexer:
    """Shuffled train/test split with random-with-replacement minibatch
    index draws (cf. model.py:126-153).

    ``test_frac`` (reference-matching default 0.1) is a plain attribute read
    at every ``setUp``; set it BEFORE compile()/optimize() to resize the
    held-out split — ``test_frac = 0.0`` trains on every row (what
    ``io.optimize_streaming`` does: holding out 10% of each megabatch would
    silently discard data that was read from disk and never evaluated)."""

    def __init__(self, test_frac=0.1):
        self.data_size = None
        self.test_frac = test_frac

    def setUp(self, data_size):
        self.data_size = data_size
        self.test_size = int(np.floor(self.data_size * self.test_frac))
        self.train_size = data_size - self.test_size
        index = np.arange(self.data_size)
        _rng.get_rng().shuffle(index)
        self._train_index = index[: self.train_size]
        self._test_index = index[self.train_size :]

    def train_index(self, minibatch_size):
        return self._train_index[
            _rng.get_rng().integers(0, self.train_size, minibatch_size)
        ]

    def test_index(self, minibatch_size):
        if minibatch_size is None:
            return None
        if self.test_size == 0:
            raise ValueError(
                "no held-out rows: the Indexer was set up with test_frac=0 "
                "(streaming does this — every row trains). Set "
                "model._index.test_frac before optimize/compile to keep a "
                "test split."
            )
        return self._test_index[
            _rng.get_rng().integers(0, self.test_size, minibatch_size)
        ]


def _resolve_method(model, method):
    """Accept an objective in any of the shapes users hold one in: a plain
    method, an @AutoOptimize-decorated method (unwrap), a method-name string,
    or an existing Optimizer (take its objective)."""
    if isinstance(method, str):
        method = getattr(type(model), method)
    if isinstance(method, Optimizer):
        method = method.likelihood_method
    return getattr(method, "__wrapped__", method)


class AutoOptimize:
    """Decorator turning a model method into a compilable objective; the
    Optimizer is created on first access and cached on the instance
    (cf. model.py:155-188)."""

    def __init__(self):
        pass

    def __call__(self, method):
        @wraps(method)
        def runnable(instance):
            optimizer_name = "_" + method.__name__ + "_AF_optimizer"
            if hasattr(instance, optimizer_name):
                optimizer = getattr(instance, optimizer_name)
            else:
                optimizer = Optimizer(instance, method)
                setattr(instance, optimizer_name, optimizer)
            return optimizer

        return runnable


class Optimizer:
    """Compiled objective: evaluation and scan-chunked optimization
    (cf. model.py:190-269)."""

    def __init__(self, model_instance, likelihood_method):
        self.model = model_instance
        self.likelihood_method = likelihood_method
        self.optimizer = None         # optax GradientTransformation
        self.collection = None
        self.opt_state = None
        self.global_step = 0
        self.history = []             # per-chunk objective traces (host arrays)
        from .utils.profiling import StepMetrics

        self.metrics = StepMetrics()
        self._trainable = None
        self._frozen = None
        self._mb_paths = None
        self._evaluate = None
        self._evaluate_core_aux = None  # (value, diagnostics) variant
        self._diag_guards = {}          # {name: (tol, hint)}, filled at trace
        self._eval_jit = None
        self._chunk_cache = {}
        self._compiled = False

    # ------------------------------------------------------------------ build
    def compile(self, optimizer=None, collection=graph_key.VARIABLES,
                global_step=None, learning_rate=0.001, num_elbo_samples=1):
        """Build the pure objective and initialize the optax state.

        args mirror the reference (model.py:206-230):
        - optimizer: an optax GradientTransformation (default: adam(lr)).
          LR schedules replace the reference's `global_step` mechanism —
          pass e.g. ``optax.adam(optax.exponential_decay(...))``.
        - collection: the variable tag to optimize; everything else is frozen.
        - num_elbo_samples: S > 1 averages S independent reparameterized
          samples of the objective per step (vmapped over noise keys inside
          one XLA program) — an S-fold gradient-variance reduction the
          reference cannot express, nearly free on TPU while the chip is
          latency-bound.
        """
        if global_step is not None:
            raise ValueError(
                "compile(global_step=...) is not supported: the reference "
                "used it to drive TF learning-rate schedules "
                "(/root/reference/Henbun/model.py:207,213-215); here the "
                "schedule lives in the optimizer — pass e.g. "
                "optax.adam(optax.exponential_decay(...)). The step counter "
                "itself is Optimizer.global_step, restored by "
                "restore_state()."
            )
        if settings.verbosity.tf_compile_verb:
            print("compiling...")
        self.optimizer = optimizer if optimizer is not None else optax.adam(learning_rate)
        self.collection = collection
        model = self.model
        model.initialize()
        model.validate()

        self._mb_paths = frozenset(
            v.path_to(model)
            for v in model.get_variables(graph_key.DATA)
            if isinstance(v, MinibatchData)
        )
        self._trainable = self._place(model.param_dict(self.collection))
        self._frozen = self._place(model.param_dict(exclude=self.collection))
        if len(self._trainable) == 0:
            raise ValueError(
                "no variables found in collection %r" % (self.collection,)
            )
        self.opt_state = self._place(self.optimizer.init(self._trainable))

        method = self.likelihood_method
        mb_paths = self._mb_paths

        # static {name: (tol, hint)} registry, filled the first time the
        # objective actually traces (diagnostic specs are Python constants)
        self._diag_guards = guards = {}

        def evaluate_core_aux(trainable, frozen, d, key):
            """Objective + reported diagnostics on a per-step data dict."""
            params = dict(trainable)
            params.update(frozen)
            with _ctx.trace(model, params, d, key) as ctx:
                val = method(model)
                diags = dict(ctx.diagnostics)
                guards.update(ctx.diagnostic_guards)
            return val, diags

        if num_elbo_samples > 1:
            # S > 1 averages S independent reparameterized samples of the
            # objective per step (vmapped over noise keys inside one XLA
            # program) — an S-fold gradient-variance reduction the reference
            # cannot express, nearly free while the chip is latency-bound.
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
                    d[path] = jnp.take(arr, idx, axis=0)
                else:
                    d[path] = arr
            return evaluate_core(trainable, frozen, d, key)

        self._evaluate_core = evaluate_core
        self._evaluate = evaluate

        # eager validation: abstractly trace the objective once so unfed
        # LOCAL variables / shape errors surface at compile() like the
        # reference's graph build (model.py:216-229). eval_shape
        # materializes nothing, so this is cheap even at n=1e6.
        data_shapes = {
            k: jax.ShapeDtypeStruct(np.shape(v), np.asarray(v).dtype)
            for k, v in self.model.data_dict().items()
        }
        jax.eval_shape(
            lambda t, f, d, k: evaluate(t, f, d, None, k),
            self._trainable,
            self._frozen,
            data_shapes,
            jax.random.PRNGKey(0),
        )
        self._eval_jit = jax.jit(evaluate, static_argnames=())
        self._eval_full_jit = jax.jit(
            lambda t, f, data, key: evaluate(t, f, data, None, key)
        )
        self._chunk_cache = {}
        self._compiled = True
        if settings.verbosity.tf_compile_verb:
            print("finished.")
        return self

    def _require_compiled(self):
        if not self._compiled:
            self.compile()

    # ------------------------------------------------- placement/jit hooks
    # ShardedOptimizer (parallel/sharding.py) overrides these five hooks;
    # everything else — nan_guard, save/restore_state, callbacks, metrics,
    # block mode, the scan-chunk loop — is shared driver code.
    def _place(self, tree):
        """Place a parameter/optimizer pytree on device (replicated over the
        mesh in the sharded driver). Identity on a single chip: jit moves
        host arrays as needed."""
        return tree

    def _place_data(self, path, arr):
        """Place one data array (leading axis sharded over the mesh 'data'
        axis in the sharded driver)."""
        return arr

    def _commit_params(self, trainable):
        """Write optimized free-space values back into the model tree(s)."""
        self.model.set_param_dict(dict(trainable))

    def _jit_chunk(self, chunk):
        """Compile the scan-chunk function, donating params + opt state."""
        return jax.jit(chunk, donate_argnums=(0, 1))

    def _make_select_batch(self, minibatch_size, train_size, mode):
        """Return select(data, train_idx, key) -> (per-step data dict, sample
        key), traced inside the step. 'random' draws uniform rows with
        replacement through the permuted train index (the reference Indexer's
        semantics, model.py:147-153); 'block' takes a random CONTIGUOUS block
        of the pre-gathered permuted train split — a dynamic_slice streams
        from HBM where large-table random row gathers are latency-bound."""
        mb_paths = self._mb_paths
        mb = minibatch_size
        if mb is None:
            return lambda data, train_idx, key: (data, key)
        if mode == "block":

            def select(data, train_idx, key):
                k_i, k_s = jax.random.split(key)
                start = jax.random.randint(
                    k_i, (), 0, max(train_size - mb + 1, 1)
                )
                d = {
                    path: (
                        jax.lax.dynamic_slice_in_dim(arr, start, mb, 0)
                        if path in mb_paths
                        else arr
                    )
                    for path, arr in data.items()
                }
                return d, k_s

            return select

        def select(data, train_idx, key):
            k_i, k_s = jax.random.split(key)
            sel = jax.random.randint(k_i, (mb,), 0, train_size)
            idx = jnp.take(train_idx, sel)
            d = {
                path: (
                    jnp.take(arr, idx, axis=0) if path in mb_paths else arr
                )
                for path, arr in data.items()
            }
            return d, k_s

        return select

    def _prepare_optimize_data(self, data, minibatch_size, mode):
        """Host-side data staging for optimize(): returns
        (data, train_idx, train_size). Block mode gathers the permuted train
        split ONCE up front so every step reads a contiguous block."""
        model = self.model
        if minibatch_size is None:
            return data, jnp.zeros((1,), dtype=jnp.int32), 1
        if model._index.data_size is None:
            raise ValueError(
                "minibatch_size=%r was passed but model %r has no "
                "MinibatchData — declare minibatched arrays with "
                "hb.MinibatchData, or drop minibatch_size."
                % (minibatch_size, model.name)
            )
        train_idx = jnp.asarray(model._index._train_index)
        train_size = int(model._index.train_size)
        if mode == "block":
            data = {
                path: (
                    self._place_data(path, jnp.take(arr, train_idx, axis=0))
                    if path in self._mb_paths
                    else arr
                )
                for path, arr in data.items()
            }
        return data, train_idx, train_size

    # --------------------------------------------------------------- resume
    def save_state(self, path):
        """Checkpoint the FULL training state (trainable params, optimizer
        slots, global step, RNG counter) for exact resume — beyond the
        reference's variables-only Saver (param.py:562-603). Orbax format;
        multi-host safe for sharded states."""
        from .utils import checkpoint

        self._require_compiled()
        self._refresh_params()  # staged assignments belong in the checkpoint
        checkpoint.save_orbax(
            path,
            {
                "trainable": dict(self._trainable),
                "opt_state": self.opt_state,
                "global_step": np.array(self.global_step, np.int64),
                "key_count": np.array(self.model._key_count, np.int64),
            },
        )

    def restore_state(self, path):
        """Inverse of :meth:`save_state`: resuming a run after this produces
        the exact step sequence the uninterrupted run would have (same
        params, Adam slots, and per-chunk noise keys)."""
        from .utils import checkpoint

        self._require_compiled()
        # consume any pending staged assignments NOW, onto the pre-restore
        # values they targeted — otherwise the next _refresh_params would
        # apply them over the restored parameters
        self._refresh_params()
        like = {
            "trainable": dict(self._trainable),
            "opt_state": self.opt_state,
            "global_step": np.array(self.global_step, np.int64),
            "key_count": np.array(self.model._key_count, np.int64),
        }
        st = checkpoint.restore_orbax(path, like)
        self._trainable = self._place(dict(st["trainable"]))
        self.opt_state = self._place(st["opt_state"])
        self.global_step = int(st["global_step"])
        self.model._key_count = int(st["key_count"])
        self._commit_params(self._trainable)
        return self

    def _refresh_params(self):
        """Pick up any staged assignments made since the last call
        (the reference re-runs initialize() before every run, model.py:93)."""
        model = self.model
        if model.initialize_ops:
            model.initialize()
            self._trainable = self._place(model.param_dict(self.collection))
            self._frozen = self._place(
                model.param_dict(exclude=self.collection)
            )
        model.validate()

    def _data_args(self):
        return {
            v.path_to(self.model): self._place_data(
                v.path_to(self.model), v.device_value()
            )
            for v in self.model.get_variables(graph_key.DATA)
        }

    def _get_chunk(self, minibatch_size, n_steps, train_size, mode="random"):
        """A jitted function running `n_steps` optimization steps via
        lax.scan, with the minibatch gather (or block slice) inside the
        step."""
        cache_key = (minibatch_size, n_steps, train_size, mode)
        if cache_key in self._chunk_cache:
            return self._chunk_cache[cache_key]

        tx = self.optimizer
        core_aux = self._evaluate_core_aux
        if core_aux is None:
            _core = self._evaluate_core

            def core_aux(trainable, frozen, d, key):
                return _core(trainable, frozen, d, key), {}

        select = self._make_select_batch(minibatch_size, train_size, mode)

        def chunk(trainable, opt_state, frozen, data, keys, train_idx):
            def one_step(carry, key):
                trainable, opt_state = carry
                d, k_s = select(data, train_idx, key)

                def neg(t):
                    val, diags = core_aux(t, frozen, d, k_s)
                    return -val, diags

                (loss, diags), grads = jax.value_and_grad(
                    neg, has_aux=True
                )(trainable)
                updates, opt_state = tx.update(grads, opt_state, trainable)
                trainable = optax.apply_updates(trainable, updates)
                return (trainable, opt_state), (-loss, diags)

            (trainable, opt_state), (objs, diags) = jax.lax.scan(
                one_step, (trainable, opt_state), keys
            )
            # objs and diags travel as ONE output subtree so the sharded
            # drivers' 3-tuple out_shardings prefix covers them unchanged
            return trainable, opt_state, (objs, diags)

        fn = self._jit_chunk(chunk)
        self._chunk_cache[cache_key] = fn
        return fn

    # ------------------------------------------------------------------- eval
    def feed_dict(self, minibatch_size=None, training=True):
        """Minibatch indices for evaluation, routed like the reference
        (model.py:232-243): None → full data, training → train split,
        else → test split."""
        if minibatch_size is None:
            return None
        if self.model._index.data_size is None:
            raise ValueError(
                "minibatch_size=%r was passed but model %r has no "
                "MinibatchData — declare minibatched arrays with "
                "hb.MinibatchData, or drop minibatch_size."
                % (minibatch_size, self.model.name)
            )
        if training:
            return self.model._index.train_index(minibatch_size)
        return self.model._index.test_index(minibatch_size)

    def run(self, minibatch_size=None, training=True, key=None):
        """Evaluate the objective at the current parameters (fresh noise)."""
        self._require_compiled()
        self._refresh_params()
        data = self._data_args()
        if key is None:
            key = self.model._next_key()
        idx = self.feed_dict(minibatch_size, training)
        if idx is None:
            val = self._eval_full_jit(self._trainable, self._frozen, data, key)
        else:
            val = self._eval_jit(
                self._trainable, self._frozen, data, jnp.asarray(idx), key
            )
        return np.asarray(val)

    # --------------------------------------------------------------- optimize
    def optimize(self, maxiter=1, minibatch_size=None, callback=None,
                 nan_guard=True, minibatch_mode="random"):
        """Run `maxiter` optimization steps (scan-chunked on device).

        minibatch_mode: 'random' (uniform rows with replacement, the
        reference's Indexer semantics) or 'block' (a random CONTIGUOUS block
        of the pre-shuffled train split per step — a contiguous dynamic_slice
        streams from HBM where large-table random row gathers are
        latency-bound; the usual large-N practical compromise).

        KeyboardInterrupt-safe like the reference loop (model.py:255-269):
        parameters advanced so far are committed back into the model tree.

        nan_guard: if a chunk produces a non-finite objective, roll the
        parameters and optimizer state back to the chunk start and retry once
        with fresh noise keys; a second failure raises. This is the failure
        detection the reference lacks (SURVEY.md §5.3) — a single divergent
        stochastic step cannot silently destroy a long run.
        """
        self._require_compiled()
        self._refresh_params()
        model = self.model
        data, train_idx, train_size = self._prepare_optimize_data(
            self._data_args(), minibatch_size, minibatch_mode
        )

        from .utils.profiling import trace_if_enabled

        chunk_size = int(settings.tpu.scan_chunk)
        trainable, opt_state = self._trainable, self.opt_state
        done = 0
        try:
            with trace_if_enabled("optimize"):
                while done < maxiter:
                    n = min(chunk_size, maxiter - done)
                    fn = self._get_chunk(
                        minibatch_size, n, train_size, minibatch_mode
                    )
                    if nan_guard:
                        # snapshot host copies so a bad chunk can be rolled
                        # back (donated buffers make device copies unusable)
                        snap_t = jax.tree_util.tree_map(np.asarray, trainable)
                        snap_o = jax.tree_util.tree_map(np.asarray, opt_state)
                    t0 = time.perf_counter()
                    keys = jax.random.split(model._next_key(), n)
                    trainable, opt_state, (objs, diags) = fn(
                        trainable, opt_state, self._frozen, data, keys, train_idx
                    )
                    objs_host = np.asarray(objs)  # device sync, once per chunk
                    if nan_guard and not np.isfinite(objs_host).all():
                        bad_at = int(np.argmax(~np.isfinite(objs_host)))
                        trainable = self._place(
                            jax.tree_util.tree_map(jnp.asarray, snap_t)
                        )
                        opt_state = self._place(
                            jax.tree_util.tree_map(jnp.asarray, snap_o)
                        )
                        keys = jax.random.split(model._next_key(), n)
                        trainable, opt_state, (objs, diags) = fn(
                            trainable, opt_state, self._frozen, data, keys,
                            train_idx,
                        )
                        objs_host = np.asarray(objs)
                        if not np.isfinite(objs_host).all():
                            # leave the model at the last GOOD state, not the
                            # diverged one (the finally block commits
                            # `trainable` back into the tree)
                            trainable = self._place(
                                jax.tree_util.tree_map(jnp.asarray, snap_t)
                            )
                            opt_state = self._place(
                                jax.tree_util.tree_map(jnp.asarray, snap_o)
                            )
                            hint = ""
                            model_hint = getattr(model, "_nan_hint", None)
                            if model_hint:
                                # a model-declared failure hint (the evidence
                                # families name their own remedies) beats the
                                # generic optimizer-pairing one
                                hint = " " + model_hint
                            elif getattr(self.optimizer, "henbun_natgrad",
                                         False):
                                hint = (
                                    " Likely cause with natural gradients: a"
                                    " stochastic (MC) objective with gamma"
                                    " beyond the gradient estimate's accuracy"
                                    " — the pairing rule is MC ELBO -> Adam"
                                    " (or natural_gradient(..., gamma<=0.01,"
                                    " adaptive=True)); analytic/deterministic"
                                    " ELBO -> unit-gamma natgrad"
                                    " (docs/PERF.md §SVGP)."
                                )
                            raise FloatingPointError(
                                "objective went non-finite at step ~%d twice "
                                "in a row; aborting (first failure at chunk "
                                "offset %d).%s"
                                % (self.global_step + n, bad_at, hint)
                            )
                        if settings.verbosity.optimisation_verb:
                            print(
                                "[henbun] non-finite objective at chunk offset"
                                " %d — rolled back and retried with fresh keys"
                                % bad_at
                            )
                    dt = time.perf_counter() - t0
                    extra = None
                    if diags:
                        # Reported diagnostics: log the latest value; a
                        # guarded one aborts on a PERSISTENT violation (the
                        # chunk ends above tolerance, or >25% of its steps
                        # violate) — rolled back to the chunk-start snapshot
                        # when one exists, so the model is not left trained
                        # on invalid gradients. An isolated transient spike
                        # only warns: parallel EP on non-log-concave
                        # likelihoods is bistable at odd single hyper points
                        # along an otherwise-converged Adam trajectory
                        # (measured: one step at delta 0.22 between steps at
                        # 2e-6 on the Student-t GPR), and one biased step in
                        # a chunk is noise to Adam, not a broken premise.
                        extra = {}
                        for dname, darr in sorted(diags.items()):
                            dhost = np.asarray(darr).reshape(-1)
                            extra[dname] = float(dhost[-1])
                            guard = self._diag_guards.get(dname)
                            if guard is None:
                                continue
                            tol, hint = guard
                            worst = float(np.max(dhost))
                            if worst <= tol:
                                continue
                            viol_frac = float(np.mean(dhost > tol))
                            if dhost[-1] > tol or viol_frac > 0.25:
                                if nan_guard:
                                    trainable = self._place(
                                        jax.tree_util.tree_map(
                                            jnp.asarray, snap_t
                                        )
                                    )
                                    opt_state = self._place(
                                        jax.tree_util.tree_map(
                                            jnp.asarray, snap_o
                                        )
                                    )
                                raise FloatingPointError(
                                    "diagnostic %r exceeded tolerance %.3g "
                                    "persistently during steps %d-%d (worst "
                                    "%.3g, %d%% of steps, final %.3g); "
                                    "aborting%s.%s"
                                    % (
                                        dname,
                                        tol,
                                        self.global_step,
                                        self.global_step + n,
                                        worst,
                                        int(round(100 * viol_frac)),
                                        float(dhost[-1]),
                                        " (chunk rolled back)"
                                        if nan_guard
                                        else "",
                                        hint,
                                    )
                                )
                            if settings.verbosity.optimisation_verb:
                                print(
                                    "[henbun] diagnostic %r spiked to %.3g "
                                    "(> %.3g) transiently in steps %d-%d "
                                    "(%d%% of steps); continuing"
                                    % (
                                        dname,
                                        worst,
                                        tol,
                                        self.global_step,
                                        self.global_step + n,
                                        int(round(100 * viol_frac)),
                                    )
                                )
                    done += n
                    self.global_step += n
                    self.history.append(objs_host)
                    self.metrics.record(
                        self.global_step, objs_host, dt, n, extra=extra
                    )
                    if callback is not None:
                        callback(self.global_step, objs_host)
        except KeyboardInterrupt:
            pass
        finally:
            self._trainable = trainable
            self.opt_state = opt_state
            self._commit_params(trainable)
        return self
