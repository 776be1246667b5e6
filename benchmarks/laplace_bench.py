"""Laplace evidence-training benchmark (VERDICT r2 #1 'done' criterion):
robust Student-t GPR hyperparameter training where EVERY step runs the whole
Newton mode-find (15 damped iterations) inside the objective. Measures the
single-model rate and the batched x N rate, with the implicit-function-
theorem backward (default) or reverse-mode through the unrolled Newton loop
(`--unrolled`), and with/without the Pallas batched-linalg dispatches
(`--no-pallas`).

Run: python benchmarks/laplace_bench.py [--models 16] [--steps 2000]
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
import optax

import henbun_tpu as hb
from henbun_tpu import densities, models
from henbun_tpu.batched import BatchedOptimizer


def _time_steps(opt, steps, reps=3):
    opt.optimize(maxiter=steps)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        opt.optimize(maxiter=steps)
        best = min(best, time.perf_counter() - t0)
    return steps / best


class _LaplaceGPR(models.GPR):
    """GPR whose evidence objective lets the bench pick engine/diff mode."""

    implicit = True
    engine = "laplace"
    fused = False

    @hb.AutoOptimize()
    def evidence(self):
        Lk = self.kern.Cholesky(self.X) * jnp.sqrt(self.k_var)
        loglik = lambda f: densities.student_t(self.Y, f, self.var, 3.0)
        if type(self).engine == "ep":
            from henbun_tpu.inference.ep import ep_gp
            from henbun_tpu.ops.linalg import matmul_hp

            K = matmul_hp(Lk, jnp.swapaxes(Lk, -1, -2))
            return ep_gp(loglik, K, sweeps=60, damping=0.3).log_marginal
        from henbun_tpu.inference.laplace import laplace_whitened

        return laplace_whitened(
            loglik, Lk, implicit_diff=type(self).implicit,
            fused=("student_t", {"y": self.Y, "var": self.var, "df": 3.0})
            if type(self).fused else None,
        ).log_marginal


def _toy(n=40, seed=0, outliers=4):
    rng = np.random.default_rng(seed)
    X = np.sort(rng.uniform(0, 6, n)).astype(np.float32)[:, None]
    y = np.sin(X) + rng.normal(size=X.shape).astype(np.float32) * 0.3
    idx = rng.choice(n, outliers, replace=False)
    y[idx] += rng.choice([-3.0, 3.0], outliers)[:, None]
    return X.astype(np.float32), y.astype(np.float32)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", type=int, default=16)
    ap.add_argument("--n", type=int, default=40)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--unrolled", action="store_true",
                    help="differentiate through the unrolled Newton loop "
                         "instead of the implicit-function-theorem backward")
    ap.add_argument("--engine", default="laplace", choices=["laplace", "ep"],
                    help="evidence engine: Newton-mode Laplace (default) or "
                         "60-sweep damped parallel EP (stationarity "
                         "gradients — sites stop-gradient'd at the fixed "
                         "point)")
    ap.add_argument("--fused", action="store_true",
                    help="run the batched Newton forward as one Pallas "
                         "kernel (ops/pallas_newton.py; laplace+implicit "
                         "only)")
    ap.add_argument("--no-pallas", action="store_true",
                    help="disable [tpu] use_pallas (default-on since round 3)")
    args = ap.parse_args(argv)
    if args.no_pallas:
        hb.settings.tpu.use_pallas = False
    _LaplaceGPR.implicit = not args.unrolled
    _LaplaceGPR.engine = args.engine
    _LaplaceGPR.fused = bool(args.fused)

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
        )
    except Exception:
        pass

    def note(msg):
        print("[laplace_bench] " + msg, file=sys.stderr, flush=True)

    hb.set_seed(0)

    note("single-model evidence step rate (%s)"
         % ("ep" if args.engine == "ep"
            else ("implicit" if _LaplaceGPR.implicit else "unrolled")))
    X, Y = _toy(n=args.n, seed=0)
    solo = _LaplaceGPR(seed=0, X=X, Y=Y)
    so = solo.evidence()
    so.compile(optax.adam(0.02))
    single_rate = _time_steps(so, args.steps)

    note("batched x%d evidence step rate" % args.models)
    ms = []
    for i in range(args.models):
        Xi, Yi = _toy(n=args.n, seed=i)
        ms.append(_LaplaceGPR(seed=i, X=Xi, Y=Yi))
    bo = BatchedOptimizer(ms, "evidence")
    bo.compile(optax.adam(0.02))
    batched_rate = _time_steps(bo, args.steps)

    print(json.dumps({
        "metric": "batched_%s_evidence_step_rate_ratio" % args.engine,
        "value": round(batched_rate / single_rate, 3),
        "unit": "batched(x%d) steps/s / single steps/s (>0.5 = win)"
                % args.models,
        "backward": "stationarity" if args.engine == "ep"
                    else ("implicit" if _LaplaceGPR.implicit else "unrolled"),
        "use_pallas": bool(hb.settings.tpu.use_pallas),
        "single_steps_per_s": round(single_rate, 1),
        "batched_steps_per_s": round(batched_rate, 1),
        "aggregate_model_steps_per_s": round(batched_rate * args.models, 1),
    }))


if __name__ == "__main__":
    main()
