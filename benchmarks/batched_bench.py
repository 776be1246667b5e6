"""Batched multi-model training benchmark (VERDICT r1 #10 'done' criterion):
N=16 GPR fits in one device program must run at > 0.5x the SINGLE-model step
rate — i.e. batching N models costs < 2x one model, a > 8x aggregate
throughput win over N sequential runs.

Run: python benchmarks/batched_bench.py [--models 16] [--steps 20000]
Prints one JSON line.
"""
import argparse
import json
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


def _time_steps(opt, steps, reps=3):
    opt.optimize(maxiter=steps)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        opt.optimize(maxiter=steps)
        best = min(best, time.perf_counter() - t0)
    return steps / best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", type=int, default=16)
    ap.add_argument("--n", type=int, default=40)
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--use-pallas", action="store_true",
                    help="enable [tpu] use_pallas (vectorized-batch Cholesky)")
    ap.add_argument("--no-pallas", action="store_true",
                    help="disable [tpu] use_pallas (default-on since round 3)")
    args = ap.parse_args(argv)
    if args.use_pallas:
        hb.settings.tpu.use_pallas = True
    if args.no_pallas:
        hb.settings.tpu.use_pallas = False

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
        )
    except Exception:
        pass

    def note(msg):
        print("[batched_bench] " + msg, file=sys.stderr, flush=True)

    hb.set_seed(0)

    note("single-model GPR step rate")
    X, Y = models.make_sine_dataset(n=args.n, seed=0)
    solo = models.GPR(seed=0, X=X, Y=Y)
    so = solo.ELBO_gaussian()
    so.compile(optax.adam(0.01))
    single_rate = _time_steps(so, args.steps)

    note("batched x%d GPR step rate" % args.models)
    ms = []
    for i in range(args.models):
        Xi, Yi = models.make_sine_dataset(n=args.n, seed=i)
        ms.append(models.GPR(seed=i, X=Xi, Y=Yi))
    bo = BatchedOptimizer(ms, "ELBO_gaussian")
    bo.compile(optax.adam(0.01))
    batched_rate = _time_steps(bo, args.steps)

    print(json.dumps({
        "metric": "batched_gpr_step_rate_ratio",
        "value": round(batched_rate / single_rate, 3),
        "unit": "batched(x%d) steps/s / single steps/s (>0.5 = win)"
                % args.models,
        "single_steps_per_s": round(single_rate, 1),
        "batched_steps_per_s": round(batched_rate, 1),
        "aggregate_model_steps_per_s": round(batched_rate * args.models, 1),
    }))


if __name__ == "__main__":
    main()
