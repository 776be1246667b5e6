"""Secondary benchmark: HMC/NUTS effective samples per second, 256 chains
(BASELINE.md north-star metric), on the BNN posterior workload.

Run: python benchmarks/ess_bench.py [--sampler nuts] [--chains 256]
Prints one JSON line per sampler.
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
import jax.numpy as jnp

import henbun_tpu as hb
from henbun_tpu import models
from henbun_tpu.inference import make_log_prob, hmc, nuts, chees, diagnostics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sampler", choices=["hmc", "nuts", "chees", "all"], default="all")
    ap.add_argument("--chains", type=int, default=256)
    ap.add_argument("--samples", type=int, default=300)
    ap.add_argument("--warmup", type=int, default=300)
    args = ap.parse_args()

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
        )
    except Exception:
        pass

    hb.set_seed(0)
    X, Y = models.make_bnn_dataset(n=128)
    m = models.BNN(seed=0, X=X, Y=Y, hidden=16)
    flp = make_log_prob(m, "log_posterior")
    init = flp.initial + 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (args.chains, flp.dim)
    )

    which = ["hmc", "nuts", "chees"] if args.sampler == "all" else [args.sampler]
    for name in which:
        mod = {"hmc": hmc, "nuts": nuts, "chees": chees}[name]
        # first call compiles (jit caches per sample() invocation are not
        # shared, but the persistent compilation cache makes the second call's
        # compile a cache hit), second call measures steady state
        res = mod.sample(
            flp.log_prob, init, jax.random.PRNGKey(1),
            num_samples=args.samples, num_warmup=args.warmup,
        )
        jax.block_until_ready(res.samples)
        t0 = time.perf_counter()
        res = mod.sample(
            flp.log_prob, init, jax.random.PRNGKey(2),
            num_samples=args.samples, num_warmup=args.warmup,
        )
        jax.block_until_ready(res.samples)
        dt = time.perf_counter() - t0
        ess = diagnostics.effective_sample_size(np.asarray(res.samples))
        summary = diagnostics.summarize(
            np.asarray(res.samples), accept_prob=np.asarray(res.accept_prob)
        )
        print(
            json.dumps(
                {
                    "metric": "%s_min_ess_per_s" % name,
                    "value": round(float(ess.min() / dt), 1),
                    "unit": "ess/s/chip (min over dims, %d chains)" % args.chains,
                    "median_ess_per_s": round(float(np.median(ess) / dt), 1),
                    "ess_bulk_min_per_s": round(summary["ess_bulk_min"] / dt, 1),
                    "rhat_max": round(summary["rhat_max"], 4),
                    "divergences": summary["divergences"],
                    "accept": round(summary["accept_mean"], 3),
                    "wall_s": round(dt, 2),
                    "dim": flp.dim,
                }
            )
        )


if __name__ == "__main__":
    main()
