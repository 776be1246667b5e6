"""Checkpointing: subtree-granular save/restore keyed by tree paths.

The reference uses a ``tf.train.Saver`` over ``{long_name: tensor}``
(`/root/reference/Henbun/param.py:562-603`), restorable on any subtree. Here
the same contract is kept — global parameters only, keyed by ``long_name``,
``global_step`` suffixing — with a plain ``.npz`` of free-space host arrays
(framework-agnostic, multi-host safe: every host computes identical bytes,
host 0 writes). For sharded training states prefer
:func:`save_orbax` / :func:`restore_orbax`, which wrap orbax-checkpoint.
"""
from __future__ import annotations

import os

import numpy as np
import jax

from ..core.param import graph_key


def _global_vars(subtree):
    return [
        v
        for v in subtree.get_variables()
        if v.collections not in graph_key.not_parameters
    ]


def save(subtree, save_path=None, global_step=None):
    """Save the subtree's global parameters (free-space values) keyed by
    long_name. Returns the written path."""
    if save_path is None:
        save_path = subtree.name + ".ckpt"
    if global_step is not None:
        save_path = "%s-%d" % (save_path, int(global_step))
    variables = _global_vars(subtree)
    if len(variables) == 0:
        raise ValueError("This class does not contain any global variables.")
    subtree.highest_parent.initialize()
    arrays = {v.long_name: np.asarray(v.free_value) for v in variables}
    # only process 0 writes in a multi-host job; all hosts hold identical values
    if jax.process_index() == 0:
        with open(save_path, "wb") as f:
            np.savez(f, **arrays)
    return save_path


def restore(subtree, save_path=None):
    """Restore free-space values into the subtree, keyed by long_name; clears
    assignment flags so a later initialize() won't clobber restored values
    (cf. param.py:594-603)."""
    if save_path is None:
        save_path = subtree.name + ".ckpt"
    variables = _global_vars(subtree)
    if len(variables) == 0:
        raise ValueError("This class does not contain any global variables.")
    with np.load(save_path) as archive:
        for v in variables:
            v.set_free_value(archive[v.long_name])
    for v in subtree.get_variables():
        v.finalize()


def save_orbax(path, pytree):
    """Save an arbitrary pytree (e.g. {'params': ..., 'opt_state': ...}) with
    orbax — handles sharded jax.Arrays across hosts."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), pytree)
    ckptr.wait_until_finished()


def restore_orbax(path, like=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)
