"""Decompose the headline GPR step cost on TPU.

Variants (timed within one session so ratios are tunnel-robust):
  base        — the bench configuration as-is
  chunk24k    — scan_chunk 24000 (dispatch overhead 33ms/chunk amortized 3x)
  plain_chol  — safe_cholesky's NaN-retry conds replaced by plain cholesky
  rbg         — hardware RBG PRNG instead of threefry
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
import optax


def time_opt(reps=3):
    import henbun_tpu as hb
    from henbun_tpu import models

    hb.set_seed(0)
    X, Y = models.make_sine_dataset(n=40)
    m = models.GPR(seed=0, X=X, Y=Y)
    opt = m.ELBO_gaussian()
    opt.compile(optax.adam(0.01))
    chunk = int(hb.settings.tpu.scan_chunk)
    opt.optimize(maxiter=chunk)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        opt.optimize(maxiter=chunk)
        best = min(best, time.perf_counter() - t0)
    return chunk / best


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    import henbun_tpu as hb

    if variant == "chunk24k":
        hb.settings.tpu.scan_chunk = 24000
    elif variant == "plain_chol":
        from henbun_tpu.gp import kernels as hk
        from henbun_tpu._settings import settings

        def plain(A, jitter=None):
            j = settings.numerics.jitter_level if jitter is None else jitter
            return jnp.linalg.cholesky(A + j * jnp.eye(A.shape[-1], dtype=A.dtype))

        hk.safe_cholesky = plain
    elif variant == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")
    print("%-10s %8.0f steps/s" % (variant, time_opt()), flush=True)


if __name__ == "__main__":
    main()
