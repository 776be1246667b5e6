"""Streaming training: scan-chunked optimization over out-of-core data.

Bridges :class:`OutOfCoreLoader` megabatches into the scan-chunked Optimizer:
each device chunk trains `scan_chunk` steps against one prefetched megabatch
(minibatches drawn on device from within it), while the C++ workers prefetch
the next megabatch from disk — disk I/O, host staging and device compute all
overlap. Data swaps are jit-argument swaps, so nothing recompiles between
megabatches.
"""
from __future__ import annotations

import numpy as np

from .._settings import settings
from ..core.param import MinibatchData, graph_key


def optimize_streaming(
    optimizer,
    loader,
    column_slices,
    maxiter,
    minibatch_size,
    test_frac=0.0,
):
    """Run `maxiter` steps of `optimizer` streaming data from `loader`.

    - optimizer: a compiled henbun_tpu Optimizer whose model has
      MinibatchData nodes (name-sorted order must match `column_slices`).
    - loader: an OutOfCoreLoader yielding [megabatch_rows, row_floats].
    - column_slices: [(lo, hi), ...] column ranges of each MinibatchData node
      within a row, in the model's name-sorted MinibatchData order (as
      returned by `write_dataset`).
    - test_frac: held-out fraction of each megabatch, DEFAULT 0 — unlike the
      in-core Indexer default (0.1), streaming holds nothing out: a split
      would silently discard 10% of every megabatch read from disk without
      ever evaluating on it (streaming runs never call test_index). Set >0
      only if you evaluate per-megabatch yourself.
    """
    model = optimizer.model
    optimizer._require_compiled()
    model._index.test_frac = float(test_frac)
    mb_nodes = [
        v
        for v in model.get_variables(graph_key.DATA)
        if isinstance(v, MinibatchData)
    ]
    if len(mb_nodes) != len(column_slices):
        raise ValueError(
            "column_slices has %d entries for %d MinibatchData nodes"
            % (len(column_slices), len(mb_nodes))
        )

    chunk = int(settings.tpu.scan_chunk)
    done = 0
    while done < maxiter:
        mega = loader.next()
        for node, (lo, hi) in zip(mb_nodes, column_slices):
            shaped = mega[:, lo:hi].reshape((mega.shape[0],) + tuple(node.shape))
            node.data = shaped
        model._index.setUp(mega.shape[0])
        n = min(chunk, maxiter - done)
        optimizer.optimize(maxiter=n, minibatch_size=minibatch_size)
        done += n
    return optimizer
