"""Sampling engines: vectorized log-prob, HMC, iterative NUTS, ChEES-HMC,
SMC — the north-star additions over the reference (BASELINE.json), all
single-XLA-program samplers shardable over the mesh 'chain' axis."""
from . import logprob, hmc, nuts, chees, smc, api, diagnostics
from .logprob import make_log_prob, FlatLogProb
from .api import sample_posterior
from .diagnostics import ess_bulk, split_rhat, effective_sample_size
