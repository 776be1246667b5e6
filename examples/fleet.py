"""Fleet training: N independent model fits in one device program, and the
same fleet sharded over a device mesh.

The reference trains one model per process (its only vectorization idiom is
the per-Variable `n_layers` leading axis). Here the whole MODEL is the unit:
`BatchedOptimizer` stacks N structurally-identical models (per-dataset fits,
per-fold cross-validation, per-restart inits) and advances all of them per
step — 16 GPR fits cost ~2.1x one fit on a v5e with `[tpu] use_pallas`
(docs/PERF.md §Batched). `ShardedBatchedOptimizer` shards the model axis
over the mesh's 'chain' axis: fleets of fits across chips with zero
data-moving collectives.

Run: python examples/fleet.py [--models 16] [--iters 4000] [--use-pallas]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import optax

import henbun_tpu as hb
from henbun_tpu import models
from henbun_tpu.batched import BatchedOptimizer
from henbun_tpu.parallel import ShardedBatchedOptimizer, make_mesh


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", type=int, default=16)
    ap.add_argument("--n", type=int, default=40)
    ap.add_argument("--iters", type=int, default=4000)
    ap.add_argument("--use-pallas", action="store_true")
    args = ap.parse_args(argv)
    if args.use_pallas:
        hb.settings.tpu.use_pallas = True

    hb.set_seed(0)

    def fleet():
        ms = []
        for i in range(args.models):
            X, Y = models.make_sine_dataset(n=args.n, seed=i)
            ms.append(models.GPR(seed=i, X=X, Y=Y, analytic_kl=True))
        return ms

    # ---- one chip: N fits in one program --------------------------------
    ms = fleet()
    bo = BatchedOptimizer(ms, "ELBO_gaussian")
    bo.compile(optax.adam(0.01))
    t0 = time.time()
    bo.optimize(maxiter=args.iters)
    dt = time.time() - t0
    tail = np.asarray(bo.history[-1])[-50:].mean()
    print("batched x%d: %d steps in %.2fs (%.0f model-steps/s), "
          "summed tail ELBO %.1f"
          % (args.models, args.iters, dt, args.models * args.iters / dt, tail))

    # every model ends with its own learned hyperparameters
    ls = [float(np.asarray(m.kern.lengthscales.value)[0]) for m in ms]
    print("per-model lengthscales: min %.3f  median %.3f  max %.3f"
          % (min(ls), float(np.median(ls)), max(ls)))

    # ---- mesh: the same fleet sharded over the 'chain' axis -------------
    n_dev = len(jax.devices())
    n_chain = n_dev if args.models % n_dev == 0 else 1
    mesh = make_mesh(n_data=n_dev // n_chain, n_chain=n_chain)
    sb = ShardedBatchedOptimizer(fleet(), "ELBO_gaussian", mesh=mesh)
    sb.compile(optax.adam(0.01))
    t0 = time.time()
    sb.optimize(maxiter=args.iters)
    dt = time.time() - t0
    tail_sb = np.asarray(sb.history[-1])[-50:].mean()
    print("sharded over %d device(s) on the 'chain' axis: %d steps in %.2fs, "
          "summed tail ELBO %.1f" % (n_chain, args.iters, dt, tail_sb))


if __name__ == "__main__":
    main()
