"""Training rate of the model families on the real chip.

One session, one table: steps/s (steady state, scan-chunked) for the
heteroscedastic, multi-output, deep-GP, GP-LVM, Poisson-count and multiclass
families (dense and sparse) plus the full-batch deterministic evidence
engines, at representative sizes. These are end-to-end rates — objective,
gradients, optimizer update and minibatch gather inside the jitted scan.

Usage: python benchmarks/families_bench.py [--steps 4000]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import optax

import henbun_tpu as hb
from henbun_tpu import models


def rate(opt, steps, minibatch=None):
    opt.optimize(maxiter=200, minibatch_size=minibatch)  # compile + warm
    t0 = time.perf_counter()
    opt.optimize(maxiter=steps, minibatch_size=minibatch)
    return steps / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    args = ap.parse_args()
    hb.set_seed(0)
    rng = np.random.default_rng(0)
    rows = []

    X, Y, _ = models.make_hetero_dataset(n=120, seed=0)
    m = models.HeteroscedasticGPR(seed=0, X=X, Y=Y)
    rows.append((
        "HeteroscedasticGPR n=120 fullrank, analytic ELBO",
        rate(m.ELBO_analytic().compile(optax.adam(0.02)), args.steps),
    ))

    X, Y, _ = models.make_multioutput_dataset(n=80, seed=0)
    m = models.MultiOutputGPR(seed=0, X=X, Y=Y, Q=2)
    rows.append((
        "MultiOutputGPR n=80 P=3 Q=2, analytic ELBO",
        rate(m.ELBO_analytic().compile(optax.adam(0.02)), args.steps),
    ))

    X, Y = models.make_step_dataset(n=400, seed=0)
    m = models.DeepGPRegression(seed=0, X=X, Y=Y, num_inducing=32)
    rows.append((
        "DeepGPRegression m=32, MC ELBO, mb=128",
        rate(m.ELBO().compile(optax.adam(0.01)), args.steps, 128),
    ))

    Yc, _ = models.make_curve_dataset(n=10000, seed=0)
    m = models.GPLVM(seed=0, Y=Yc, d_z=1, num_inducing=16, hidden=32)
    rows.append((
        "GPLVM n=1e4 m=16, MC ELBO, mb=256",
        rate(m.ELBO().compile(optax.adam(0.01)), args.steps, 256),
    ))

    Xp = np.sort(rng.uniform(0, 6, size=(100_000, 1))).astype(np.float32)
    Yp = rng.poisson(np.exp(np.sin(Xp) + 1.0)).astype(np.float32)
    m = models.SVGPCount(seed=0, X=Xp, Y=Yp, num_inducing=32)
    rows.append((
        "SVGPCount n=1e5 m=32, analytic ELBO, mb=512",
        rate(m.ELBO_analytic().compile(optax.adam(0.02)), args.steps, 512),
    ))

    labels = (np.floor(Xp[:, 0]) % 3).astype(np.int32)[:, None]
    m = models.SVGPMulticlass(
        seed=0, X=Xp, Y=labels, num_classes=3, num_inducing=32
    )
    rows.append((
        "SVGPMulticlass n=1e5 K=3 m=32, MC ELBO, mb=512",
        rate(m.ELBO().compile(optax.adam(0.02)), args.steps, 512),
    ))

    Xh, Yh, _ = models.make_hetero_dataset(n=100_000, seed=0)
    m = models.HeteroSVGP(seed=0, X=Xh, Y=Yh, num_inducing=64)
    rows.append((
        "HeteroSVGP n=1e5 m=64, analytic ELBO, mb=512",
        rate(m.ELBO_analytic().compile(optax.adam(0.02)), args.steps, 512),
    ))

    Xm, Ym, _ = models.make_multioutput_dataset(n=100_000, seed=0)
    m = models.MultiOutputSVGP(seed=0, X=Xm, Y=Ym, Q=2, num_inducing=64)
    rows.append((
        "MultiOutputSVGP n=1e5 P=3 Q=2 m=64, analytic ELBO, mb=512",
        rate(m.ELBO_analytic().compile(optax.adam(0.02)), args.steps, 512),
    ))

    # deterministic sparse Laplace: FULL-BATCH evidence at n=1e5 per step
    # (15 m x m Newton iterations + IFT backward inside every step)
    p1 = 1.0 / (1.0 + np.exp(-3.0 * np.sin(Xp)))
    Yb = (rng.uniform(size=Xp.shape) < p1).astype(np.float32)
    m = models.SparseGPC(seed=0, X=Xp, Y=Yb, num_inducing=128)
    sp_steps = max(args.steps // 10, 200)  # full-batch: fewer, fatter steps
    rows.append((
        "SparseGPC n=1e5 m=128, full-batch Laplace evidence",
        rate(m.log_marginal_laplace().compile(optax.adam(0.05)), sp_steps),
    ))
    m = models.SparseGPC(seed=0, X=Xp, Y=Yb, num_inducing=128)
    rows.append((
        "SparseGPC n=1e5 m=128, full-batch EP evidence",
        rate(m.log_marginal_ep().compile(optax.adam(0.05)), sp_steps),
    ))

    Xm3 = Xp[::3].copy()
    Lm3 = 2.5 * np.concatenate(
        [np.sin(Xm3 + s) for s in (0.0, 2.1, 4.2)], axis=1
    )
    Pm3 = np.exp(Lm3 - Lm3.max(1, keepdims=True))
    Pm3 /= Pm3.sum(1, keepdims=True)
    ym3 = (rng.uniform(size=(len(Xm3), 1)) > Pm3.cumsum(1)[:, :2]).sum(
        1
    ).astype(np.int32)[:, None]
    m = models.SparseGPMulticlass(seed=0, X=Xm3, Y=ym3, num_classes=3,
                                  num_inducing=64)
    rows.append((
        "SparseGPMulticlass n=3e4 K=3 m=64, full-batch Laplace evidence",
        rate(m.log_marginal_laplace().compile(optax.adam(0.05)), sp_steps),
    ))

    # the round-4 f32-wall workload, clean since the square-root (CholQR2)
    # engine (round 5): full n=1e5, m=128 — each step is ~0.24 s of device
    # time, so cap the scan chunk to stay under remote-execution budgets
    Lm5 = 2.5 * np.concatenate(
        [np.sin(Xp + s) for s in (0.0, 2.1, 4.2)], axis=1
    )
    Pm5 = np.exp(Lm5 - Lm5.max(1, keepdims=True))
    Pm5 /= Pm5.sum(1, keepdims=True)
    ym5 = (rng.uniform(size=(len(Xp), 1)) > Pm5.cumsum(1)[:, :2]).sum(
        1
    ).astype(np.int32)[:, None]
    m = models.SparseGPMulticlass(seed=0, X=Xp, Y=ym5, num_classes=3,
                                  num_inducing=128)
    old_chunk = hb.settings.tpu.scan_chunk
    hb.settings.tpu.scan_chunk = 50
    try:
        rows.append((
            "SparseGPMulticlass n=1e5 K=3 m=128, full-batch sqrt-engine "
            "evidence",
            rate(m.log_marginal_laplace().compile(optax.adam(0.05)),
                 max(sp_steps // 2, 100)),
        ))
    finally:
        hb.settings.tpu.scan_chunk = old_chunk

    Yr = np.sin(Xp) + rng.normal(size=Xp.shape).astype(np.float32) * 0.2
    out = rng.choice(len(Xp), len(Xp) // 25, replace=False)
    Yr[out] += rng.choice([-4.0, 4.0], len(out))[:, None]
    m = models.SparseGPRobust(seed=0, X=Xp, Y=Yr.astype(np.float32),
                              num_inducing=128)
    rows.append((
        "SparseGPRobust n=1e5 m=128, full-batch Laplace evidence",
        rate(m.log_marginal_laplace().compile(optax.adam(0.05)), sp_steps),
    ))

    for name, r in rows:
        print("%-52s %10.0f steps/s" % (name, r))


if __name__ == "__main__":
    main()
