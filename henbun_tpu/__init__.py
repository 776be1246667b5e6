"""henbun_tpu — a TPU-native stochastic variational inference framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the reference
Henbun library (`/root/reference/Henbun/__init__.py`): Parameterized/Variable
trees, variational posteriors, densities/priors/transforms, GP kernels +
(Sparse)GP sampling, NN encoders, amortized SVI with minibatching,
checkpointing and INI settings — plus TPU-era additions: jit/scan-compiled
training, HMC/NUTS/SMC samplers, and multi-chip mesh sharding.

Usage mirrors the reference:

>>> import henbun_tpu as hb
>>> class GPR(hb.model.Model):
...     def setUp(self):
...         self.X = hb.param.Data(x)
...         self.Y = hb.param.Data(y)
...         self.kern = hb.gp.kernels.UnitRBF()
...         self.q = hb.variationals.Gaussian(shape=[n], q_shape='fullrank')
...     @hb.model.AutoOptimize()
...     def ELBO(self):
...         f = jnp.matmul(self.kern.Cholesky(self.X), self.q[:, None])
...         return jnp.sum(hb.densities.gaussian(self.Y, f, var)) - self.KL()
>>> m = GPR()
>>> m.ELBO().compile()
>>> m.ELBO().optimize(maxiter=20000)
"""
from ._version import __version__

# Restore standard JAX behavior for an EXPLICIT platform request: some
# environments force-register an accelerator backend from sitecustomize, in
# which case the documented `JAX_PLATFORMS=cpu` env var silently loses.
# jax.config wins over both, so honor the env var here (no-op when unset or
# when backends are already initialized).
import os as _os

if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", "cpu")
    except Exception:  # backends already initialized — leave them be
        pass

from . import _settings
from ._settings import settings

from .core import rng as random
from .core.rng import set_seed

from .core import param as _core_param
from . import transforms
from . import densities
from . import scoping
from . import priors
from . import variationals
from . import model
from . import nn
from . import gp
from . import ops
from . import optimizers
from . import batched
from .batched import BatchedOptimizer
from . import inference
from . import parallel
from . import utils
from . import io
from . import serving

# `hb.param.*` API surface, as in the reference package layout
from . import param

Model = model.Model
AutoOptimize = model.AutoOptimize
Variable = _core_param.Variable
Parameterized = _core_param.Parameterized
ParamList = _core_param.ParamList
Data = _core_param.Data
MinibatchData = _core_param.MinibatchData
graph_key = _core_param.graph_key
