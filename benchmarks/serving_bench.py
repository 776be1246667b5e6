"""Serving-path latency: exported artifact vs in-process model call.

Measures, on the current backend (run on the real TPU):
  1. `model.run(predict_f)`      — in-process, retraces cached, jit dispatch
  2. `ServingArtifact(grid)`     — deserialized StableHLO, jit dispatch
  3. artifact with batch-polymorphic shapes at several request sizes

The point: the serving artifact must cost the same dispatch as the live
model (it is the same compiled computation, minus the Python tree), and the
polymorphic artifact must not pay a retrace per request size.

Usage: python benchmarks/serving_bench.py [--requests 200]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

import henbun_tpu as hb
from henbun_tpu import models, serving


def timeit(fn, n):
    fn()  # warm
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=200)
    ap.add_argument("--n", type=int, default=40)
    args = ap.parse_args()

    hb.set_seed(0)
    X, Y = models.make_sine_dataset(n=args.n)
    m = models.GPRMarginal(seed=0, X=X, Y=Y)
    m.log_marginal().compile(optax.adam(0.05)).optimize(maxiter=500)

    grid = np.linspace(0, 6, 128).reshape(-1, 1).astype(np.float32)
    jgrid = jnp.asarray(grid)

    # in-process path: the same pure fn the exporter builds, jitted directly
    from henbun_tpu.core import context as _ctx

    params = m.param_dict()
    data = {k: jnp.asarray(v) for k, v in m._gather_data(None).items()}
    key = jax.random.PRNGKey(0)

    def pure(g):
        with _ctx.trace(m, params, data, key, training=False):
            return models.GPRMarginal.predict_f(m, g)

    live = jax.jit(pure)

    art = serving.export_predictor(m, models.GPRMarginal.predict_f, grid)
    blob = art.serialize()
    served = serving.deserialize(blob)

    poly = serving.export_predictor(
        m, models.GPRMarginal.predict_f, grid, batch_polymorphic=True
    )

    n = args.requests
    t_live = timeit(lambda: live(jgrid), n)
    t_art = timeit(lambda: served(jgrid), n)
    rows = [
        ("live jit (in-process)", t_live),
        ("serving artifact (fixed shape)", t_art),
    ]
    for req in (16, 128, 1024):
        g = jnp.asarray(
            np.linspace(0, 6, req).reshape(-1, 1).astype(np.float32)
        )
        rows.append(
            ("poly artifact, request n=%d" % req, timeit(lambda: poly(g), n))
        )
    for name, t in rows:
        print("%-34s %8.1f us/request" % (name, t * 1e6))
    print(
        "artifact size: %d bytes; overhead vs live: %+.1f%%"
        % (len(blob), 100.0 * (t_art - t_live) / t_live)
    )


if __name__ == "__main__":
    main()
