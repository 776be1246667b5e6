"""Large-scale amortized SVI — BASELINE.json config 3: encoder-fed local
variational parameters, minibatch SVI on a synthetic 1e6-point regression.
Optionally data-parallel over all visible devices.

Run: python examples/amortized_svi.py [--n 1000000] [--sharded]
"""
import os
import sys

# Allow `python examples/<name>.py` without installing the package: Python
# puts the script's directory (not the cwd) on sys.path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np
import optax

import henbun_tpu as hb
from henbun_tpu import models


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=5000)
    ap.add_argument("--minibatch", type=int, default=1024)
    ap.add_argument("--d-z", type=int, default=4)
    ap.add_argument("--q-local", default="diagonal",
                    choices=["diagonal", "fullrank_packed"],
                    help="local posterior family; fullrank_packed gives "
                         "correlated d_z-dim locals from a slab of "
                         "d_z + d_z(d_z+1)/2 encoder outputs (half the "
                         "dense layout's width)")
    ap.add_argument("--sharded", action="store_true")
    args = ap.parse_args(argv)

    hb.set_seed(0)
    X, Y = models.make_synthetic_regression(n=args.n, d_x=8)
    m = models.AmortizedRegression(
        seed=0, X=X, Y=Y, d_z=args.d_z, hidden=64, q_local=args.q_local
    )

    if args.sharded:
        import jax
        from henbun_tpu.parallel import make_mesh, ShardedOptimizer

        mesh = make_mesh(n_data=len(jax.devices()), n_chain=1)
        opt = ShardedOptimizer(m, "ELBO", mesh=mesh)
        opt.compile(optax.adam(0.003))
    else:
        opt = m.ELBO()
        opt.compile(optax.adam(0.003))

    opt.optimize(maxiter=500, minibatch_size=args.minibatch)  # warm up/compile
    t0 = time.time()
    opt.optimize(maxiter=args.iters, minibatch_size=args.minibatch)
    dt = time.time() - t0
    per_elbo = np.concatenate(opt.history)[-100:].mean() / m.n_data
    print("steps/s: %.1f   examples/s: %.0f" % (args.iters / dt, args.iters / dt * args.minibatch))
    print("per-datapoint ELBO: %.4f" % per_elbo)


if __name__ == "__main__":
    main()
