"""Bayesian hyperparameters over the inducing-point (projected) evidences.

ML-II (evidence maximization) gives a point estimate of the kernel
hyperparameters; at n >= 1e5 the evidence surface is sharp enough that this
is usually fine — but whenever it is NOT (small data regions, heavy tails),
the full posterior p(theta | y) ~ exp(evidence(theta)) p(theta) is one call
away: `models.SparseGPC.log_posterior` / `models.SparseGPRobust.log_posterior`
bundle the sparse Laplace evidence with weak lognormal hyperpriors, and
`hb.inference.sample_posterior` runs ChEES-HMC over them — every chain's
gradient flows through the rectangular IFT Newton mode, chains vectorize on
chip (and shard over the mesh 'chain' axis when one is passed).

The reference's counterpart is hyperparameters-as-Variationals
(`/root/reference/Henbun/gp/kernels.py:43-51`); this is the exact-sampler
version of the same idea, at inducing-point scale.

Run: python examples/bayes_hypers_sparse.py [--n 20000] [--samples 300]
(drive on CPU with env JAX_PLATFORMS=cpu for a quick look; chip rates in
docs/PERF.md.)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np
import optax

import jax

import henbun_tpu as hb
from henbun_tpu import models
from henbun_tpu.inference import sample_posterior


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--samples", type=int, default=300)
    ap.add_argument("--chains", type=int, default=8)
    args = ap.parse_args(argv)

    rng = np.random.default_rng(0)
    X = np.sort(rng.uniform(0, 6, (args.n, 1))).astype(np.float32)
    p_true = 1.0 / (1.0 + np.exp(-3.0 * np.sin(X)))
    Y = (rng.uniform(size=X.shape) < p_true).astype(np.float32)

    # ML-II point estimate for contrast
    hb.set_seed(0)
    m_ml = models.SparseGPC(seed=0, X=X, Y=Y, num_inducing=args.m)
    opt = m_ml.log_posterior().compile(optax.adam(0.03))
    opt.optimize(maxiter=300)
    print("ML-II: k_var %.3f  lengthscale %.3f" % (
        float(np.asarray(m_ml.k_var.value)[0]),
        float(np.asarray(m_ml.gp.kern.lengthscales.value)[0]),
    ))

    m = models.SparseGPC(seed=1, X=X, Y=Y, num_inducing=args.m)
    res, post, diag = sample_posterior(
        m, "log_posterior", num_chains=args.chains,
        num_samples=args.samples, num_warmup=args.samples,
        sampler="chees", return_diagnostics=True,
        key=jax.random.PRNGKey(1),
    )
    for path in ("k_var", "gp.kern.lengthscales"):
        d = np.asarray(post[path]).reshape(-1)
        lo, med, hi = np.quantile(d, [0.05, 0.5, 0.95])
        print("%-22s median %.3f  90%% CI [%.3f, %.3f]" % (path, med, lo, hi))
    print("R-hat max %.3f  min bulk ESS %.0f" % (
        diag["rhat_max"], diag["ess_bulk_min"]))


if __name__ == "__main__":
    main()
