"""Heteroscedastic GP regression: input-dependent noise, two latent GPs.

Fits y = f(x) + eps(x), eps ~ N(0, exp(g(x))), with whitened fullrank
posteriors over both f (the mean) and g (the log noise variance). The
deterministic objective uses the closed-form E[e^{-g}] lognormal identity
(`HeteroscedasticGPR.ELBO_analytic`) — zero gradient variance, no per-step
sampling; the reference-style single-sample MC estimator is run alongside
for comparison.

Run: python examples/heteroscedastic.py [--iters 4000]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np
import optax

import henbun_tpu as hb
from henbun_tpu import models


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4000)
    ap.add_argument("--n", type=int, default=120)
    args = ap.parse_args(argv)

    hb.set_seed(0)
    X, Y, sd_true = models.make_hetero_dataset(n=args.n, seed=0)

    m = models.HeteroscedasticGPR(seed=0, X=X, Y=Y)
    opt = m.ELBO_analytic()
    opt.compile(optax.adam(0.02))
    opt.optimize(maxiter=args.iters)
    print("deterministic ELBO:", float(opt.run()))

    grid = np.linspace(0.2, 5.8, 30).reshape(-1, 1).astype(np.float32)
    fmean, yvar = m.run(lambda mm: mm.predict_y(grid))
    gmean, _ = m.run(lambda mm: mm.predict_g(grid))
    learned_sd = np.exp(0.5 * np.asarray(gmean)[:, 0])
    rmse = float(np.sqrt(np.mean((np.asarray(fmean)[:, 0] - np.sin(grid[:, 0])) ** 2)))
    print("mean RMSE vs sin(x):", rmse)
    lo, hi = learned_sd[grid[:, 0] < 2].mean(), learned_sd[grid[:, 0] > 4].mean()
    print("learned noise sd: quiet region %.3f (true ~0.07), loud %.3f (true ~0.42)"
          % (lo, hi))

    # the reference-style MC estimator on the same data (slower convergence)
    m2 = models.HeteroscedasticGPR(seed=0, X=X, Y=Y, q_shape="diagonal",
                                   analytic_kl=False)
    opt2 = m2.ELBO_mc()
    opt2.compile(optax.adam(0.02))
    opt2.optimize(maxiter=args.iters)
    mc = np.mean([float(opt2.run()) for _ in range(20)])
    print("MC ELBO (20-draw mean):", mc)

    # inducing-point scale: the SAME closed-form objective at 100x the rows
    n_big = max(args.n * 100, 10000)
    Xb, Yb, _ = models.make_hetero_dataset(n=n_big, seed=1)
    mb = models.HeteroSVGP(seed=0, X=Xb, Y=Yb, num_inducing=32)
    ob = mb.ELBO_analytic()
    ob.compile(optax.adam(0.02))
    ob.optimize(maxiter=args.iters, minibatch_size=512)
    gb, _ = mb.run(lambda mm: mm.predict_g(grid))
    sdb = np.exp(0.5 * np.asarray(gb)[:, 0])
    fb, _ = mb.run(lambda mm: mm.predict_y(grid))
    print("HeteroSVGP n=%d: mean RMSE %.4f, sd quiet %.3f loud %.3f"
          % (n_big,
             float(np.sqrt(np.mean((np.asarray(fb)[:, 0] - np.sin(grid[:, 0])) ** 2))),
             sdb[grid[:, 0] < 2].mean(), sdb[grid[:, 0] > 4].mean()))


if __name__ == "__main__":
    main()
