"""Sharded (multi-chip) training: data-parallel ELBO steps over a Mesh.

The strategy (SURVEY.md §2.6/§5.8, scaling-book recipe): global parameters
and optimizer state REPLICATE; (minibatch) data arrays shard their leading
axis over the ``data`` mesh axis; the per-step minibatch selection, forward,
gradient and Adam update run inside one pjit-compiled scan. The gradient
all-reduce (psum over ``data``) is inserted by XLA's GSPMD partitioner from
the sharding annotations — no hand-written collectives, so the same code runs
on 1 chip, a v5e slice, or a multi-host pod (ICI/DCN routing is the
compiler's job).

:class:`ShardedOptimizer` is a SUBCLASS of the single-chip driver
(:class:`henbun_tpu.model.Optimizer`): nan-guard rollback, orbax
``save_state``/``restore_state``, callbacks, ``StepMetrics``, and
``minibatch_mode='block'`` are all inherited — only the placement, the jit
shardings, and the per-step minibatch selection are overridden here.

Per-step minibatch selection is collective-free by construction: the permuted
train split is gathered ONCE at ``optimize()`` start and laid out with its
leading axis sharded over ``data``; each step, every device draws its B/n_data
rows from ITS OWN shard inside a ``shard_map``. (A replicated index gather
over a sharded table — the previous design — makes GSPMD lower the gather as
mask-and-combine: an extra per-step ``all-reduce`` of the full [B, row] batch,
verified on lowered HLO; with the shard_map selection the ONLY collective left
in the step is the gradient all-reduce — see tests/test_parallel.py's
HLO-inspection test.) Sampling is therefore stratified by shard — unbiased,
since the Indexer's permutation randomizes the partition.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.param import graph_key
from ..batched import BatchedOptimizer
from ..model import Optimizer, _resolve_method
from . import mesh as mesh_mod


class ShardedOptimizer(Optimizer):
    """Data-parallel subclass of :class:`henbun_tpu.model.Optimizer`.

    Shards every MinibatchData array's leading axis over the mesh's ``data``
    axis and keeps parameters replicated. With B the global minibatch size,
    each device selects B/n_data local rows per step and XLA all-reduces the
    gradient. Everything else (chunked scan loop, nan_guard, checkpointing,
    metrics) is the single-chip driver, unchanged.
    """

    def __init__(self, model, likelihood_method, mesh=None):
        super().__init__(model, _resolve_method(model, likelihood_method))
        self.mesh = mesh if mesh is not None else mesh_mod.make_mesh()

    # -------------------------------------------------------------- sharding
    def _n_data(self):
        return int(self.mesh.shape[mesh_mod.DATA_AXIS])

    def _repl(self):
        return NamedSharding(self.mesh, P())

    def _data_sharding(self, path):
        if path in self._mb_paths:
            return NamedSharding(self.mesh, P(mesh_mod.DATA_AXIS))
        return self._repl()

    # ------------------------------------------------------- Optimizer hooks
    def _place(self, tree):
        return jax.device_put(tree, self._repl())

    def _place_data(self, path, arr):
        return jax.device_put(arr, self._data_sharding(path))

    def _sharded_data(self):
        """Back-compat alias: the data dict with mesh placements applied."""
        self._require_compiled()
        return self._data_args()

    def _jit_chunk(self, chunk):
        repl = self._repl()
        data_sh = {
            v.path_to(self.model): self._data_sharding(v.path_to(self.model))
            for v in self.model.get_variables(graph_key.DATA)
        }
        train_sh = jax.tree_util.tree_map(lambda _: repl, self._trainable)
        frozen_sh = jax.tree_util.tree_map(lambda _: repl, self._frozen)
        opt_sh = jax.tree_util.tree_map(lambda _: repl, self.opt_state)
        return jax.jit(
            chunk,
            in_shardings=(train_sh, opt_sh, frozen_sh, data_sh, repl, repl),
            out_shardings=(train_sh, opt_sh, repl),
            donate_argnums=(0, 1),
        )

    def _prepare_optimize_data(self, data, minibatch_size, mode):
        """Both minibatch modes pre-gather the permuted train split (one
        gather per optimize() call, not per step) and shard it over ``data``;
        the split is truncated to a multiple of n_data (drops < n_data rows).
        """
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
        nd = self._n_data()
        if minibatch_size % nd != 0:
            raise ValueError(
                "minibatch_size=%d must be divisible by the mesh data-axis "
                "size %d (each device takes an equal share of the batch)."
                % (minibatch_size, nd)
            )
        train_idx = np.asarray(model._index._train_index)
        train_size = (len(train_idx) // nd) * nd
        if train_size == 0:
            raise ValueError(
                "train split (%d rows) is smaller than the mesh data axis "
                "(%d devices)." % (len(train_idx), nd)
            )
        train_idx = jnp.asarray(train_idx[:train_size])
        data = {
            path: (
                self._place_data(path, jnp.take(arr, train_idx, axis=0))
                if path in self._mb_paths
                else arr
            )
            for path, arr in data.items()
        }
        return data, jnp.zeros((1,), dtype=jnp.int32), train_size

    def _make_select_batch(self, minibatch_size, train_size, mode):
        """Per-device selection from the local shard via shard_map: no
        cross-device traffic in the data path. 'random' draws B/n_data local
        rows with replacement; 'block' takes a contiguous B/n_data block of
        the local shard."""
        if minibatch_size is None:
            return lambda data, train_idx, key: (data, key)
        mb_paths = self._mb_paths
        mesh = self.mesh
        nd = self._n_data()
        local_mb = minibatch_size // nd
        local_n = train_size // nd
        block = mode == "block"

        def gather_local(key, *arrs):
            i = jax.lax.axis_index(mesh_mod.DATA_AXIS)
            k = jax.random.fold_in(key, i)
            if block:
                start = jax.random.randint(
                    k, (), 0, max(local_n - local_mb + 1, 1)
                )
                return tuple(
                    jax.lax.dynamic_slice_in_dim(a, start, local_mb, 0)
                    for a in arrs
                )
            sel = jax.random.randint(k, (local_mb,), 0, local_n)
            return tuple(jnp.take(a, sel, axis=0) for a in arrs)

        def select(data, train_idx, key):
            k_i, k_s = jax.random.split(key)
            paths = sorted(p for p in data if p in mb_paths)
            arrs = tuple(data[p] for p in paths)
            out = jax.shard_map(
                gather_local,
                mesh=mesh,
                in_specs=(P(),) + tuple(P(mesh_mod.DATA_AXIS) for _ in arrs),
                out_specs=tuple(P(mesh_mod.DATA_AXIS) for _ in arrs),
            )(k_i, *arrs)
            d = dict(data)
            d.update(zip(paths, out))
            return d, k_s

        return select


class ShardedBatchedOptimizer(BatchedOptimizer):
    """N independent model fits sharded over the mesh — multi-chip
    multi-model training.

    `BatchedOptimizer` stacks N structurally-identical models on a leading
    axis and advances all fits in one program on ONE chip; this subclass
    shards that model axis over the mesh's ``chain`` axis (the mesh axis for
    independent parallel units — MCMC chains, SMC particles, and now whole
    model replicas). The workload is embarrassingly parallel: every leaf of
    the stacked parameter/optimizer/data trees is sharded on the model axis,
    each device steps its own N/n_chain fits locally, and the ONLY collective
    GSPMD inserts is the all-reduce of the per-step summed-objective scalar
    for the history (asserted on lowered HLO in tests/test_parallel.py).

    The reference is single-device (SURVEY.md §2.6); this is the scaling
    story for its 'n_layers' many-fits idiom: 16 fits per chip x a pod
    slice's worth of chips.
    """

    def __init__(self, models, likelihood_method, mesh=None):
        super().__init__(models, likelihood_method)
        self.mesh = (
            mesh
            if mesh is not None
            else mesh_mod.make_mesh(n_data=1, n_chain=len(jax.devices()))
        )
        n_chain = int(self.mesh.shape[mesh_mod.CHAIN_AXIS])
        if len(models) % n_chain:
            raise ValueError(
                "model count %d must divide evenly over the mesh 'chain' "
                "axis (%d devices)" % (len(models), n_chain)
            )

    # -------------------------------------------------------------- sharding
    def _model_axis(self):
        return NamedSharding(self.mesh, P(mesh_mod.CHAIN_AXIS))

    def _repl(self):
        return NamedSharding(self.mesh, P())

    def _leaf_sharding(self, leaf):
        """Model-axis sharding for stacked leaves, replication for scalars
        (e.g. optax step counts)."""
        if getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] == len(self.models):
            return self._model_axis()
        return self._repl()

    # ------------------------------------------------------- Optimizer hooks
    def _place(self, tree):
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, self._leaf_sharding(jnp.asarray(a))),
            tree,
        )

    def _place_data(self, path, arr):
        return jax.device_put(arr, self._model_axis())

    def _jit_chunk(self, chunk):
        tree_sh = lambda tree: jax.tree_util.tree_map(self._leaf_sharding, tree)
        data_sh = {k: self._model_axis() for k in self._data_args()}
        repl = self._repl()
        return jax.jit(
            chunk,
            in_shardings=(
                tree_sh(self._trainable),
                tree_sh(self.opt_state),
                tree_sh(self._frozen),
                data_sh,
                repl,
                repl,
            ),
            out_shardings=(
                tree_sh(self._trainable),
                tree_sh(self.opt_state),
                repl,
            ),
            donate_argnums=(0, 1),
        )

    def compile(self, *args, **kwargs):
        super().compile(*args, **kwargs)
        self._trainable = self._place(self._trainable)
        self._frozen = self._place(self._frozen)
        self.opt_state = self._place(self.opt_state)
        return self
