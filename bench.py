"""Benchmark: ELBO optimization steps/s on the reference's headline workload.

Workload: the GaussianProcess.ipynb GPR (n=40, fullrank variational posterior,
Adam ELBO loop; `/root/repo/BASELINE.md`). The reference publishes no numbers,
so the baseline is the reference's *architecture* measured on the same chip:
one jitted optimization step dispatched per host round-trip (TF
session.run-per-step, `reference model.py:255-269`) versus this framework's
scan-chunked on-device loop.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
import optax

import henbun_tpu as hb
from henbun_tpu import models

QUICK = "--quick" in sys.argv


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    def note(msg):
        print("[bench] " + msg, file=sys.stderr, flush=True)

    hb.set_seed(0)
    X, Y = models.make_sine_dataset(n=40)
    m = models.GPR(seed=0, X=X, Y=Y)
    opt = m.ELBO_gaussian()
    opt.compile(optax.adam(0.01))

    chunk = int(hb.settings.tpu.scan_chunk)

    # --- ours: scan-chunked on-device loop -------------------------------
    # best-of-N timing: the tunneled chip's throughput varies 2-3x between
    # moments; best-of keeps the measurement about the program, and the
    # vs_baseline ratio uses best-of on both sides
    note("compiling scan chunk (first compile can take minutes on a cold cache)")
    opt.optimize(maxiter=chunk)  # compile + warm up
    note("warmed; timing scanned loop")
    reps = 2 if QUICK else 3
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        opt.optimize(maxiter=chunk)
        best = min(best, time.perf_counter() - t0)
    steps_per_s = chunk / best

    # --- baseline: one device call per step (reference architecture) -----
    trainable = opt._trainable
    opt_state = opt.opt_state
    frozen = opt._frozen
    data = opt._data_args()
    tx = opt.optimizer
    evaluate = opt._evaluate

    @jax.jit
    def one_step(trainable, opt_state, key):
        loss, grads = jax.value_and_grad(
            lambda t: -evaluate(t, frozen, data, None, key)
        )(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, -loss

    key = jax.random.PRNGKey(0)
    trainable, opt_state, obj = one_step(trainable, opt_state, key)  # compile
    jax.block_until_ready(obj)
    note("timing per-step-dispatch baseline")
    n_base = 5 if QUICK else 10
    best_base = float("inf")
    for rep in range(2 if QUICK else 3):
        t0 = time.perf_counter()
        for i in range(n_base):
            key = jax.random.fold_in(key, rep * n_base + i)
            trainable, opt_state, obj = one_step(trainable, opt_state, key)
            jax.block_until_ready(obj)  # host sync per step, as the reference
        best_base = min(best_base, time.perf_counter() - t0)
    base_steps_per_s = n_base / best_base

    print(
        json.dumps(
            {
                "metric": "gpr_elbo_steps_per_s",
                "value": round(steps_per_s, 2),
                "unit": "steps/s/chip",
                "vs_baseline": round(steps_per_s / base_steps_per_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
