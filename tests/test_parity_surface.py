"""Parity audit: every public symbol of the reference API surface resolves
here.

The reference's surface is enumerated from SURVEY.md §2 / PARITY.md (the
reference itself is TF-1.x and cannot be imported in this image). Each entry
maps a reference symbol (module-qualified, as users write it after
`import Henbun as hb`) to the attribute path that must exist on
`henbun_tpu`. Redesigned mechanisms are asserted at their replacement
surface; purely-internal reference helpers are not part of the contract.
"""
import numpy as np
import pytest

import henbun_tpu as hb

# (reference symbol, our attribute path) — None path means "same path".
SURFACE = [
    # settings (reference _settings.py:26-149)
    ("settings.dtypes.float_type", None),
    ("settings.dtypes.int_type", None),
    ("settings.numerics.jitter_level", None),
    ("settings.numerics.clip_by_value", None),
    ("settings.numerics.clip_value_min", None),
    ("settings.numerics.clip_value_max", None),
    ("settings.get_settings", None),
    ("settings.temp_settings", None),
    # scoping (scoping.py:21-41)
    ("scoping.NameScoped", None),
    # tf_wraps (tf_wraps.py:26-71) -> ops
    ("tf_wraps.eye", "ops.eye"),
    ("tf_wraps.clip", "ops.clip"),
    ("tf_wraps.log_sum_exp", "ops.log_sum_exp"),
    ("tf_wraps.vec_to_tri", "ops.vec_to_tri"),  # disabled C++ op, live here
    ("tf_wraps.tri_to_vec", "ops.tri_to_vec"),
    # transforms (transforms.py)
    ("transforms.Transform", None),
    ("transforms.Identity", None),
    ("transforms.Exp", None),
    ("transforms.Log1pe", None),
    ("transforms.Logistic", None),
    ("transforms.positive", None),
    ("transforms.LowerTriangular", None),  # disabled in reference, live here
    # densities (densities.py:25-103)
    ("densities.gaussian", None),
    ("densities.lognormal", None),
    ("densities.bernoulli", None),
    ("densities.poisson", None),
    ("densities.exponential", None),
    ("densities.gamma", None),
    ("densities.student_t", None),
    ("densities.beta", None),
    ("densities.laplace", None),
    ("densities.multivariate_normal", None),
    ("densities.bimixture", None),
    # priors (priors.py:28-117)
    ("priors.Prior", None),
    ("priors.Normal", None),
    ("priors.Gaussian", None),
    ("priors.LogNormal", None),
    ("priors.Gamma", None),
    ("priors.Laplace", None),
    ("priors.Uniform", None),
    # param (param.py)
    ("param.graph_key", None),
    ("param.Parentable", None),
    ("param.Variable", None),
    ("param.Parameterized", None),
    ("param.ParamList", None),
    ("param.Data", None),
    ("param.MinibatchData", None),
    # variationals (variationals.py)
    ("variationals.Variational", None),
    ("variationals.Normal", None),
    ("variationals.Gaussian", None),
    ("variationals.OffsetGaussian", None),
    ("variationals.Beta", None),
    # model (model.py)
    ("model.Model", None),
    ("model.Indexer", None),
    ("model.AutoOptimize", None),
    ("model.Optimizer", None),
    # nn (nn.py)
    ("nn.MatBias", None),
    ("nn.NeuralNet", None),
    # gp (gp/kernels.py, gp/gp.py)
    ("gp.kernels.Kern", None),
    ("gp.kernels.UnitStationary", None),
    ("gp.kernels.UnitRBF", None),
    ("gp.kernels.UnitCsymRBF", None),
    ("gp.GP", None),
    ("gp.SparseGP", None),
]


def _resolve(root, dotted):
    obj = root
    for part in dotted.split("."):
        obj = getattr(obj, part)
    return obj


@pytest.mark.parametrize("ref,ours", SURFACE, ids=[s[0] for s in SURFACE])
def test_reference_symbol_resolves(ref, ours):
    _resolve(hb, ours or ref)


def test_reference_method_surface():
    """Spot-check the method-level contracts users migrate with."""
    # Parameterized tree ops (reference param.py:455-603)
    for name in (
        "sorted_variables", "get_variables", "feed", "feed_size", "KL",
        "save", "restore", "initialize", "finalize", "value",
        "highest_parent", "long_name",
    ):
        assert hasattr(hb.param.Parameterized, name) or hasattr(
            hb.param.Variable, name
        ), name
    # Model / Optimizer driver (model.py:13-269)
    for name in ("setUp", "initialize", "run", "validate", "test_feed_dict"):
        assert hasattr(hb.model.Model, name), name
    for name in ("compile", "run", "optimize", "feed_dict"):
        assert hasattr(hb.model.Optimizer, name), name
    # Variational internals relied on by user subclasses
    for name in ("logdet", "KL"):
        assert hasattr(hb.variationals.Variational, name), name
    # Kernels' scoped methods (gp/kernels.py:28-131)
    for name in ("K", "Kdiag", "Cholesky"):
        assert hasattr(hb.gp.kernels.UnitRBF, name), name
    # GP sampling surface (gp/gp.py:37-143)
    assert hasattr(hb.gp.GP, "samples")
    assert hasattr(hb.gp.SparseGP, "samples")


def test_henbunrc_config_keys_consumed():
    """The reference ships henbunrc keys; ours must parse the same sections
    (and, unlike the reference, actually consume verbosity/profiling)."""
    s = hb.settings
    assert hasattr(s.verbosity, "tf_compile_verb")
    assert hasattr(s.verbosity, "optimisation_verb")
    assert hasattr(s.profiling, "dump_timeline")
    assert hasattr(s.profiling, "dump_tensorboard")
    assert isinstance(float(s.numerics.jitter_level), float)
