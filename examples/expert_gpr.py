"""Mixture-of-experts GP regression — the reference's Expert_GPR.ipynb
workload: short- and long-lengthscale GPs gated by a third sigmoid GP,
initialized by a single-GP fit (with a temporarily raised jitter, as the
notebook's cells 11-14 demonstrate for the settings system).

Run: python examples/expert_gpr.py [--init-iters 3000] [--rounds 10] [--iters 1000]
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
    ap.add_argument("--init-iters", type=int, default=3000)
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--n", type=int, default=150)
    args = ap.parse_args(argv)

    hb.set_seed(0)
    X, Y = models.make_expert_dataset(n=args.n)
    m = models.ExpertGPR(seed=0, X=X, Y=Y)

    # initial single-GP estimate under a scoped settings override
    cfg = hb.settings.get_settings()
    cfg.numerics.jitter_level = 3e-4
    with hb.settings.temp_settings(cfg):
        init = m.ELBO_single()
        init.compile(optax.adam(0.01))
        init.optimize(maxiter=args.init_iters)
    print("single-GP ELBO:", float(init.run()))

    main_opt = m.ELBO()
    main_opt.compile(optax.adam(0.001))
    # the notebook runs 10 x 1000 iterations with live plotting;
    # here one metrics callback replaces the plot
    for _ in range(args.rounds):
        main_opt.optimize(maxiter=args.iters)
        print("ELBO:", float(main_opt.run()))

    draws = np.stack([np.asarray(m.run(lambda mm: mm.f_mixture())) for _ in range(30)])
    rmse = np.sqrt(np.mean((draws.mean(0) - Y) ** 2))
    print("fit RMSE:", rmse)
    return rmse


if __name__ == "__main__":
    main()
