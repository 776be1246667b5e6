"""Inference engines beyond SVI: vectorized log-prob, HMC, iterative NUTS,
ChEES-HMC, SMC (all single-XLA-program samplers shardable over the mesh
'chain' axis), the Laplace approximation, and expectation propagation — the
north-star additions over the reference (BASELINE.json)."""
from . import logprob, hmc, nuts, chees, smc, api, diagnostics, laplace, ep
from .logprob import make_log_prob, FlatLogProb
from .api import sample_posterior
from .diagnostics import ess_bulk, split_rhat, effective_sample_size
from .laplace import laplace_whitened, LaplaceResult
from .ep import ep_gp, ep_latent_marginals, EPResult
