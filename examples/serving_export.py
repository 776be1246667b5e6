"""Train → export → serve: the deployment path.

Fits the exact-marginal GPR (hyperparameters by evidence maximization), then
exports the predictive posterior as a self-contained, batch-size-polymorphic
StableHLO artifact (`henbun_tpu.serving`), saves it to disk, reloads it with
NO model object in sight, and serves requests of several sizes — plus a
stochastic posterior-draw artifact whose seed is part of the request.

The reference has no counterpart: its prediction story is session.run inside
the training process (Henbun/model.py:84-96).

Run: python examples/serving_export.py [--iters 2000]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import tempfile

import numpy as np
import jax.numpy as jnp
import optax

import henbun_tpu as hb
from henbun_tpu import models, serving


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--n", type=int, default=40)
    args = ap.parse_args(argv)

    hb.set_seed(0)
    X, Y = models.make_sine_dataset(n=args.n, noise=0.3)

    # 1. train (exact marginal likelihood, hyperparameters only)
    m = models.GPRMarginal(seed=0, X=X, Y=Y)
    opt = m.log_marginal()
    opt.compile(optax.adam(0.05))
    opt.optimize(maxiter=args.iters)
    print("log marginal:", float(opt.run()))

    # 2. export the predictive posterior — batch-polymorphic, cpu+tpu
    example = np.zeros((8, 1), np.float32)
    art = serving.export_predictor(
        m, models.GPRMarginal.predict_f, example, batch_polymorphic=True
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "gpr_predictor.hlo")
        art.save(path)
        print("saved artifact:", os.path.getsize(path), "bytes;", art)

        # 3. serve from the file alone (no model, any batch size)
        server_fn = serving.load(path)
        for n_req in (5, 64, 200):
            grid = np.linspace(-1, 7, n_req).reshape(-1, 1).astype(np.float32)
            mean, var = server_fn(jnp.asarray(grid))
            print(
                "request n=%-4d -> mean[0]=%+.3f  var range [%.3f, %.3f]"
                % (n_req, float(mean[0, 0]), float(var.min()), float(var.max()))
            )

    # 4. a stochastic artifact: posterior draws with the seed in the request
    mv = models.GPR(seed=0, X=X, Y=Y, q_shape="diagonal")
    ov = mv.ELBO_gaussian()
    ov.compile(optax.adam(0.02))
    ov.optimize(maxiter=args.iters)
    grid = np.linspace(0, 6, 50).reshape(-1, 1).astype(np.float32)
    sampler = serving.export_sampler(mv, models.GPR.predict_f, 32, grid)
    draws = np.asarray(sampler(np.uint32(123), jnp.asarray(grid)))
    print(
        "sampler artifact: 32 draws in one call, band width %.3f"
        % float(2 * draws[:, :, 0].std(0).mean())
    )


if __name__ == "__main__":
    main()
