"""GP regression with variational inference — the reference's
GaussianProcess.ipynb workload, end to end.

Fits y = f(x) + noise with a whitened fullrank variational posterior over f,
then refits with a Student-t likelihood for robustness to outliers.

Run: python examples/gaussian_process.py [--iters 20000]
"""
import os
import sys

# Allow `python examples/<name>.py` without installing the package: Python
# puts the script's directory (not the cwd) on sys.path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np
import optax

import henbun_tpu as hb
from henbun_tpu import models


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20000)
    args = ap.parse_args(argv)

    hb.set_seed(0)
    X, Y = models.make_sine_dataset(n=40, noise=0.3)
    m = models.GPR(seed=0, X=X, Y=Y)

    opt = m.ELBO_gaussian()
    opt.compile(optax.adam(0.01))
    opt.optimize(maxiter=args.iters)
    print("ELBO:", float(opt.run()))
    print("lengthscale:", m.kern.lengthscales.value)
    print("kernel var:", m.k_var.value, " noise var:", m.var.value)

    # posterior draws, vectorized (the notebook's cell 17 loops run(); here
    # 100 draws are one device call)
    draws = np.asarray(m.draws(lambda mm: mm.f_sample(), 100))
    rmse = np.sqrt(np.mean((draws.mean(0) - np.sin(X)) ** 2))
    print("posterior-mean RMSE vs sin(x):", rmse)

    # prediction at NEW inputs (no reference counterpart)
    grid = np.linspace(0, 6, 120).reshape(-1, 1).astype(np.float32)
    bands = np.asarray(m.draws(lambda mm: mm.predict_f(grid), 100))[:, :, 0]
    print("predictive band mean width:", 2 * bands.std(0).mean())

    # --- robust variant: Student-t likelihood against outliers ----------
    Y_out = Y.copy()
    Y_out[::8] += 3.0
    m2 = models.GPR(seed=0, X=X, Y=Y_out)
    opt2 = m2.ELBO_student()
    opt2.compile(optax.adam(0.01))
    opt2.optimize(maxiter=args.iters // 2)
    print("robust ELBO:", float(opt2.run()))

    # same fit with the DETERMINISTIC objective (Gauss-Hermite expected
    # Student-t log-lik + analytic KL) and dual-speed natural gradients —
    # converges in a small fraction of the MC loop's steps
    from henbun_tpu import optimizers as hopt

    m3 = models.GPR(seed=0, X=X, Y=Y_out, analytic_kl=True)
    opt3 = m3.ELBO_student_quadrature()
    opt3.compile(hopt.natural_gradient(m3, gamma=0.2, rest=optax.adam(0.02)))
    opt3.optimize(maxiter=max(800, args.iters // 20))
    print("robust ELBO (quadrature+natgrad):", float(opt3.run()))

    # third route: LAPLACE — no variational posterior at all; train the
    # hyperparameters on the Newton-mode evidence and read the latent
    # posterior (mean AND variance) deterministically
    m4 = models.GPR(seed=0, X=X, Y=Y_out)
    opt4 = m4.log_marginal_laplace_student()
    opt4.compile(optax.adam(0.02))
    opt4.optimize(maxiter=max(600, args.iters // 20))
    print("robust Laplace evidence:", float(opt4.run()))
    grid = np.linspace(X.min(), X.max(), 100, dtype=np.float32)[:, None]
    mean, var = m4.run(lambda mm: mm.predict_f_laplace(grid))
    rmse = float(np.sqrt(np.mean((np.asarray(mean)[:, 0] - np.sin(grid[:, 0])) ** 2)))
    print("robust Laplace posterior-mean RMSE vs sin(x):", rmse)


if __name__ == "__main__":
    main()
