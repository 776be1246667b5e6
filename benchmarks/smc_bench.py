"""SMC benchmark at the north-star spec (BASELINE.md: tomographic-style
inverse problem, thousands of particles): adaptive-tempered SMC with HMC
moves on the grid-absorption linear-Gaussian workload of
`examples/smc_tomography.py`, so the posterior mean can be gated against the
analytic posterior while timing. The whole run is ONE XLA program (tempering
while_loop), so the metric is tempering stages/s — each stage is a full
resample + `move_steps x leapfrog` HMC sweep over every particle.

Run: python benchmarks/smc_bench.py [--grid 8] [--particles 8192]
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
import jax.numpy as jnp

from examples.smc_tomography import projection_matrix, smoothness_precision
from henbun_tpu.inference import smc


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=8)
    ap.add_argument("--particles", type=int, default=8192)
    ap.add_argument("--noise", type=float, default=0.1)
    ap.add_argument("--move-steps", type=int, default=5)
    ap.add_argument("--leapfrog", type=int, default=8)
    args = ap.parse_args(argv)

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
        )
    except Exception:
        pass

    def note(msg):
        print("[smc_bench] " + msg, file=sys.stderr, flush=True)

    g = args.grid
    rng = np.random.default_rng(0)
    xv, yv = np.meshgrid(np.linspace(-1, 1, g), np.linspace(-1, 1, g))
    truth = (
        np.exp(-((xv - 0.2) ** 2 + (yv + 0.1) ** 2) / 0.3)
        .ravel()
        .astype(np.float32)
    )
    A = projection_matrix(g)
    y = A @ truth + rng.normal(size=A.shape[0]).astype(np.float32) * args.noise
    P0 = smoothness_precision(g)
    noise_var = args.noise**2
    post_prec = P0 + A.T @ A / noise_var
    post_mean = np.linalg.solve(post_prec, A.T @ y / noise_var)

    Aj, yj, P0j = jnp.asarray(A), jnp.asarray(y), jnp.asarray(P0)

    def log_prior(t):
        return -0.5 * t @ P0j @ t

    def log_lik(t):
        r = Aj @ t - yj
        return -0.5 * jnp.sum(r**2) / noise_var

    Lp = np.linalg.cholesky(np.linalg.inv(P0))
    z = rng.normal(size=(args.particles, g * g)).astype(np.float32)
    particles = jnp.asarray(z @ Lp.T)

    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1:
        from henbun_tpu.parallel import make_mesh

        mesh = make_mesh(n_data=1, n_chain=n_dev)
        note("particles sharded over %d devices" % n_dev)

    def one_run(seed):
        res = smc.sample(
            log_prior, log_lik, particles, jax.random.PRNGKey(seed),
            num_move_steps=args.move_steps, num_leapfrog=args.leapfrog,
            step_size=0.05, mesh=mesh,
        )
        jax.block_until_ready(res.particles)
        return res

    note("compiling + warm run (first compile can take minutes cold)")
    one_run(0)
    note("timing")
    best_rate, res = 0.0, None
    for seed in (1, 2, 3):
        t0 = time.perf_counter()
        r = one_run(seed)
        dt = time.perf_counter() - t0
        rate = int(r.num_stages) / dt
        if rate > best_rate:
            best_rate, res = rate, r

    est = np.asarray(res.particles).mean(0)
    err = float(np.abs(est - post_mean).mean())
    print(json.dumps({
        "metric": "smc_tempering_stages_per_s",
        "value": round(best_rate, 2),
        "unit": "stages/s (%d particles, %d-dim, %dx%d HMC moves/stage)"
                % (args.particles, g * g, args.move_steps, args.leapfrog),
        "num_stages": int(res.num_stages),
        "final_beta": float(res.final_beta),
        "posterior_mean_abs_err_vs_analytic": round(err, 5),
        "log_evidence": round(float(res.log_evidence), 3),
    }))
    assert float(res.final_beta) > 1.0 - 1e-5
    assert err < 0.02, err


if __name__ == "__main__":
    main()
