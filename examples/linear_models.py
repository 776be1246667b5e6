"""Linear models, MAP and variational — the reference's Henbun_structure /
Henbun_structure2 tutorial workloads.

Run: python examples/linear_models.py [--map-iters 3000] [--vi-iters 50000]
"""
import argparse
import os
import sys

# Allow `python examples/<name>.py` without installing the package: Python
# puts the script's directory (not the cwd) on sys.path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import optax

import henbun_tpu as hb
from henbun_tpu import models


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--map-iters", type=int, default=3000)
    ap.add_argument("--vi-iters", type=int, default=50000)
    args = ap.parse_args(argv)

    hb.set_seed(0)
    X, Y = models.make_linear_dataset(n=200, a=1.0, b=2.0, noise=0.5)

    # --- MAP fit (Henbun_structure.ipynb) ---------------------------------
    m = models.MAPLinearModel(seed=0, X=X, Y=Y)
    opt = m.logp()
    opt.compile(optax.adam(0.05))
    opt.optimize(maxiter=args.map_iters)
    print("MAP: a=%.3f b=%.3f" % (float(m.a.value[0]), float(m.b.value[0])))

    # --- VI fit (Henbun_structure2.ipynb: 50k iterations) -----------------
    mv = models.VariationalLinearModel(seed=0, X=X, Y=Y)
    vopt = mv.elbo()
    vopt.compile(optax.adam(0.01))
    vopt.optimize(maxiter=args.vi_iters)
    a_mu = float(np.asarray(mv.a.q_mu.free_value)[0])
    a_sig = float(np.exp(np.asarray(mv.a.q_sqrt.free_value))[0])
    b_mu = float(np.asarray(mv.b.q_mu.free_value)[0])
    b_sig = float(np.exp(np.asarray(mv.b.q_sqrt.free_value))[0])
    print("VI:  a=%.3f±%.3f b=%.3f±%.3f" % (a_mu, a_sig, b_mu, b_sig))
    # posterior draws of the fit
    fits = np.stack([np.asarray(mv.run(lambda mm: mm.fit())) for _ in range(30)])
    print("fit band width (mean std):", fits.std(0).mean())


if __name__ == "__main__":
    main()
