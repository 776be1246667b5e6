"""One-call posterior sampling over a model tree.

``sample_posterior(model, "log_posterior")`` wires together
:func:`make_log_prob`, chain initialization, the chosen sampler, and the
mesh, returning samples both as a flat array and as constrained-space arrays
keyed by tree path.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import chees as _chees
from . import hmc as _hmc
from . import nuts as _nuts
from .logprob import make_log_prob

_SAMPLERS = {"hmc": _hmc, "nuts": _nuts, "chees": _chees}


def sample_posterior(
    model,
    method,
    num_chains=8,
    num_samples=1000,
    num_warmup=500,
    sampler="chees",
    collection="__default__",
    key=None,
    init_jitter=0.1,
    mesh=None,
    return_diagnostics=False,
    **kwargs,
):
    """Sample the posterior defined by a model objective.

    - method: objective returning the log density (name / method / Optimizer).
    - sampler: 'chees' (default; best ESS/s on TPU), 'hmc', or 'nuts'.
    - collection: which Variables form theta. Defaults to the SAME trainable
      tag `Optimizer.compile` uses (graph_key.VARIABLES), so variables a
      model deliberately segregates (e.g. the sparse families' frozen
      inducing points, tagged "inducing_z") are frozen here too — sampling
      them by default would target an improper density (no prior on z).
      Pass None explicitly to sample every global.
    Returns (result, posterior) where `result` is the sampler's NamedTuple
    and `posterior` maps each tree path to CONSTRAINED-space samples with
    leading axes [num_samples, num_chains].

    Diagnostics (bulk ESS, split R-hat, divergences) are computed on the
    free-space samples and printed when ``[verbosity] hmc_verb`` >= 1; pass
    ``return_diagnostics=True`` to also get the summary dict as a third
    return value.
    """
    if sampler not in _SAMPLERS:
        raise ValueError("sampler must be one of %s" % sorted(_SAMPLERS))
    if collection == "__default__":
        from ..core.param import graph_key

        collection = graph_key.VARIABLES
    flp = make_log_prob(model, method, collection)
    if key is None:
        key = model._next_key()
    k_init, k_run = jax.random.split(key)
    init = flp.initial + init_jitter * jax.random.normal(
        k_init, (num_chains, flp.dim)
    )
    res = _SAMPLERS[sampler].sample(
        flp.log_prob, init, k_run,
        num_samples=num_samples, num_warmup=num_warmup, mesh=mesh, **kwargs
    )
    flat = np.asarray(res.samples)  # [S, C, dim]
    lookup = {v.path_to(model): v for v in model.get_variables()}
    posterior = {}
    off = 0
    for path, shape in zip(flp.paths, flp.shapes):
        size = int(np.prod(shape)) if len(shape) else 1
        free = flat[..., off : off + size].reshape(flat.shape[:2] + tuple(shape))
        transform = lookup[path].transform
        posterior[path] = np.asarray(transform.forward(free))
        off += size

    from . import diagnostics

    summary = diagnostics.summarize(
        flat, accept_prob=getattr(res, "accept_prob", None)
    )
    diagnostics.report(summary, prefix="[henbun %s]" % sampler)
    if return_diagnostics:
        return res, posterior, summary
    return res, posterior
