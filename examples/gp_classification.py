"""Binary GP classification five ways — the deterministic engines side by
side on the same generator:

  * exact-gram Laplace (`models.GPC`, inference/laplace.py): Newton mode +
    curvature, evidence-trained hyperparameters;
  * exact-gram expectation propagation (GPC.log_marginal_ep,
    inference/ep.py): moment-matched sites, the accuracy reference;
  * inducing-point SVGP with the deterministic quadrature ELBO and natural
    gradients (`models.SVGPClassification`) for the large-n regime;
  * inducing-point Laplace (`models.SparseGPC`): the FULLY deterministic
    large-n path — evidence-trained hyperparameters with no variational
    parameters, every factorization m x m;
  * inducing-point expectation propagation (SparseGPC.log_marginal_ep,
    inference/ep.py's projected engine): moment matching at the same
    O(n m^2) per sweep, trained under the ep_delta convergence guard.

The reference ships `densities.bernoulli` broken (TF<1.0 `tf.select`,
/root/reference/Henbun/densities.py:35-36) and no classifier at all; this
workload is a north-star addition.

Run: python examples/gp_classification.py [--n-exact 120] [--n-svgp 20000]
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
from henbun_tpu import optimizers as hopt


def make_labels(n, seed=0):
    rng = np.random.default_rng(seed)
    X = np.sort(rng.uniform(-3, 3, n)).astype(np.float32)[:, None]
    p = 1.0 / (1.0 + np.exp(-3.0 * np.sin(X)))
    Y = (rng.uniform(size=X.shape) < p).astype(np.float32)
    return X, Y


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-exact", type=int, default=120)
    ap.add_argument("--n-svgp", type=int, default=20000)
    ap.add_argument("--iters", type=int, default=500)
    args = ap.parse_args(argv)

    hb.set_seed(0)
    grid = np.linspace(-3, 3, 61, dtype=np.float32)[:, None]
    p_true = 1.0 / (1.0 + np.exp(-3.0 * np.sin(grid[:, 0])))

    def report(name, p):
        err = float(np.abs(p[:, 0] - p_true).mean())
        sure = np.abs(p_true - 0.5) > 0.15
        acc = float((((p[:, 0] > 0.5) == (p_true > 0.5))[sure]).mean())
        print("%-28s mean |p - p_true| %.4f   decision acc (sure region) %.3f"
              % (name, err, acc))

    # --- exact-gram engines on the same small dataset ----------------------
    X, Y = make_labels(args.n_exact, seed=0)

    m_lp = models.GPC(seed=0, X=X, Y=Y)
    o = m_lp.log_marginal_laplace()
    o.compile(optax.adam(0.05))
    o.optimize(maxiter=args.iters)
    print("Laplace evidence:", float(o.run()))
    report("GPC Laplace", np.asarray(m_lp.run(lambda mm: mm.predict_p(grid))))

    m_ep = models.GPC(seed=0, X=X, Y=Y)
    o = m_ep.log_marginal_ep()
    o.compile(optax.adam(0.05))
    o.optimize(maxiter=args.iters)
    res = m_ep.run(lambda mm: mm.ep())
    print("EP evidence: %.3f  (last-sweep site delta %.2e)"
          % (float(res.log_marginal), float(res.delta)))
    report("GPC EP", np.asarray(m_ep.run(lambda mm: mm.predict_p_ep(grid))))

    # --- inducing-point scale: deterministic quadrature ELBO + natgrad -----
    Xl, Yl = make_labels(args.n_svgp, seed=1)
    m_sv = models.SVGPClassification(seed=0, X=Xl, Y=Yl, num_inducing=64)
    opt = m_sv.ELBO_quadrature()
    opt.compile(hopt.natural_gradient(m_sv, gamma=0.1, rest=optax.adam(0.01)))
    opt.optimize(maxiter=8 * args.iters, minibatch_size=512,
                 minibatch_mode="block")
    p_draws = np.asarray(m_sv.draws(lambda mm: mm.predict_p(grid)[0], 200))
    report("SVGP quadrature+natgrad", p_draws.mean(0)[:, None])

    # --- inducing-point Laplace: deterministic evidence at the same n ------
    m_sl = models.SparseGPC(seed=0, X=Xl, Y=Yl, num_inducing=64)
    opt = m_sl.log_marginal_laplace()
    opt.compile(optax.adam(0.05))
    opt.optimize(maxiter=args.iters)  # full-batch: each step sees all n rows
    print("Sparse Laplace evidence/n: %.4f"
          % (float(opt.run()) / args.n_svgp))
    report("SparseGPC Laplace",
           np.asarray(m_sl.run(lambda mm: mm.predict_p(grid))))

    # --- inducing-point EP: the moment-matched accuracy reference at n -----
    m_se = models.SparseGPC(seed=0, X=Xl, Y=Yl, num_inducing=64)
    opt = m_se.log_marginal_ep()
    opt.compile(optax.adam(0.05))
    opt.optimize(maxiter=args.iters)
    print("Sparse EP evidence/n: %.4f  (ep_delta %.2e)"
          % (float(opt.run()) / args.n_svgp,
             opt.metrics.rows[-1]["ep_delta"]))
    report("SparseGPC EP",
           np.asarray(m_se.run(lambda mm: mm.predict_p_ep(grid))))


if __name__ == "__main__":
    main()
