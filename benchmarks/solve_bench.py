"""Batched triangular-solve micro-benchmark: XLA vs Pallas vbatched.

The batched-GPR backward is dominated by two L^T solves per step (the
reverse-mode Cholesky rule). Measure, inside a scanned loop (dispatch
amortized like the real trainer), XLA's batched `triangular_solve` against
`tri_solve128_vbatched` at the BatchedOptimizer shapes.

Run: python benchmarks/solve_bench.py [--batch 16] [--n 40 128]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from henbun_tpu.ops.pallas_solve import tri_solve128_vbatched


def scan_time(step, init, iters=3000, reps=3):
    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (step(c), None), c, None, length=iters)[0]

    c = run(init)
    jax.block_until_ready(c)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        c = run(init)
        jax.block_until_ready(c)
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e6  # us/step


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n", type=int, nargs="+", default=[40, 128])
    args = ap.parse_args(argv)
    Bt = args.batch

    for n in args.n:
        rng = np.random.default_rng(0)
        L0 = np.tril(rng.normal(size=(Bt, n, n))).astype(np.float32)
        L0 += n * np.eye(n, dtype=np.float32)
        B0 = rng.normal(size=(Bt, n, n)).astype(np.float32)
        L0 = jnp.asarray(L0)

        def xla_step(b, transpose):
            x = jax.scipy.linalg.solve_triangular(
                L0, b, lower=True, trans=1 if transpose else 0
            )
            return b + 1e-9 * x

        def pallas_step(b, transpose):
            x = tri_solve128_vbatched(L0, b, transpose=transpose)
            return b + 1e-9 * x

        for transpose in (False, True):
            t_x = scan_time(lambda b: xla_step(b, transpose), jnp.asarray(B0))
            t_p = scan_time(lambda b: pallas_step(b, transpose), jnp.asarray(B0))
            print(
                "B=%d n=%d trans=%d : XLA %7.1f us  Pallas %7.1f us  (%.2fx)"
                % (Bt, n, transpose, t_x, t_p, t_x / t_p),
                flush=True,
            )


if __name__ == "__main__":
    main()
