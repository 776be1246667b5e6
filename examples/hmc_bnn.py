"""HMC/NUTS over BNN weights and GP hyperparameters — BASELINE.json config 4:
256 chains, sharded over the mesh 'chain' axis when multiple devices exist.

Run: python examples/hmc_bnn.py [--sampler nuts] [--chains 256]
"""
import os
import sys

# Allow `python examples/<name>.py` without installing the package: Python
# puts the script's directory (not the cwd) on sys.path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np
import jax
import jax.numpy as jnp

import henbun_tpu as hb
from henbun_tpu import models
from henbun_tpu.inference import make_log_prob, hmc, nuts, chees
from henbun_tpu.parallel import make_mesh


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sampler", choices=["hmc", "nuts", "chees"], default="chees")
    ap.add_argument("--chains", type=int, default=256)
    ap.add_argument("--samples", type=int, default=500)
    ap.add_argument("--warmup", type=int, default=500)
    args = ap.parse_args(argv)

    hb.set_seed(0)
    X, Y = models.make_bnn_dataset(n=128)
    m = models.BNN(seed=0, X=X, Y=Y, hidden=16)
    flp = make_log_prob(m, "log_posterior")
    print("dim:", flp.dim)

    n_dev = len(jax.devices())
    mesh = make_mesh(n_data=1, n_chain=n_dev) if n_dev > 1 else None
    init = flp.initial + 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (args.chains, flp.dim)
    )

    sampler = {"hmc": hmc, "nuts": nuts, "chees": chees}[args.sampler]
    res = sampler.sample(
        flp.log_prob, init, jax.random.PRNGKey(1),
        num_samples=args.samples, num_warmup=args.warmup, mesh=mesh,
    )
    samples = np.asarray(res.samples)
    ess = hmc.effective_sample_size(samples)
    print("accept: %.3f" % np.asarray(res.accept_prob).mean())
    print("ESS (min/median/max): %.0f / %.0f / %.0f" % (
        ess.min(), np.median(ess), ess.max()))

    # posterior predictive through the model tree
    mean_theta = jnp.asarray(samples.reshape(-1, flp.dim).mean(0))
    flp.set_model_state(mean_theta)
    pred = np.asarray(m.run(lambda mm: mm.net(mm.x)))
    print("posterior-mean-weights RMSE:", float(np.sqrt(np.mean((pred - Y) ** 2))))


if __name__ == "__main__":
    main()
