"""The round-4 multiclass f32-wall workload, on the round-5 square-root
engine: n=1e5, m=128, K=3 softmax-Laplace evidence training, FULL BATCH.

Round 4's engine (normal-matrix H = I + blocks(A^T W A)) NaN'd here near
step 100; the square-root engine (`inference/laplace._sqrt_gram_factor`,
shifted CholeskyQR2) trains it clean — measured 500 steps at 4.1 steps/s
on a v5e with k_var reaching 9.07 (n*k_var = 9.1e5 per class, 4.5x past
the old envelope) and grid probabilities within 0.0028 of the generator
(docs/PERF.md §families).

Full-batch steps are ~0.24 s of device time each: `[tpu] scan_chunk` is
capped here so one scan chunk stays under remote-execution budgets.

Run: python benchmarks/multiclass_scale_bench.py [--n 100000] [--m 128]
     [--steps 500]
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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--m", type=int, default=128)
    ap.add_argument("--classes", type=int, default=3)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--lr", type=float, default=0.05)
    args = ap.parse_args(argv)

    hb.settings.tpu.scan_chunk = min(hb.settings.tpu.scan_chunk, 50)
    n, m, K = args.n, args.m, args.classes
    rng = np.random.default_rng(0)
    X = np.sort(rng.uniform(0, 6, (n, 1))).astype(np.float32)
    F = np.stack(
        [3.0 * np.sin(X[:, 0]), 2.0 * np.cos(0.7 * X[:, 0]),
         1.5 * np.sin(1.3 * X[:, 0] + 1.0)][:K], axis=-1
    )
    P = np.exp(F - F.max(axis=1, keepdims=True))
    P /= P.sum(axis=1, keepdims=True)
    y = np.array([rng.choice(K, p=p) for p in P], np.int32)[:, None]

    hb.set_seed(0)
    mdl = models.SparseGPMulticlass(
        seed=0, X=X, Y=y, num_classes=K, num_inducing=m
    )
    opt = mdl.log_marginal_laplace().compile(optax.adam(args.lr))
    e0 = float(opt.run())
    warm = min(50, max(args.steps // 2, 1))
    opt.optimize(maxiter=warm)  # compiles the chunk
    t0 = time.time()
    opt.optimize(maxiter=args.steps - warm)
    dt = time.time() - t0
    e1 = float(opt.run())
    kv = float(np.asarray(mdl.k_var.value).reshape(()))
    finite = bool(np.isfinite(np.concatenate(opt.history)).all())

    grid = np.linspace(0.1, 5.9, 60, dtype=np.float32)[:, None]
    Fg = np.stack(
        [3.0 * np.sin(grid[:, 0]), 2.0 * np.cos(0.7 * grid[:, 0]),
         1.5 * np.sin(1.3 * grid[:, 0] + 1.0)][:K], axis=-1
    )
    Pg = np.exp(Fg - Fg.max(axis=1, keepdims=True))
    Pg /= Pg.sum(axis=1, keepdims=True)
    p_hat = np.asarray(mdl.run(lambda mm: mm.predict_p(grid)))
    err = float(np.abs(p_hat - Pg).mean())

    import json

    print(json.dumps({
        "metric": "multiclass_sqrt_engine_evidence_steps_per_s",
        "value": round((args.steps - warm) / dt, 2),
        "unit": "full-batch evidence steps/s (n=%d, m=%d, K=%d)" % (n, m, K),
        "evidence_per_point_init": round(e0 / n, 4),
        "evidence_per_point_final": round(e1 / n, 4),
        "k_var": round(kv, 3),
        "n_times_k_var": "%.2e" % (n * kv),
        "finite": finite,
        "grid_prob_mae": round(err, 4),
    }))


if __name__ == "__main__":
    main()
