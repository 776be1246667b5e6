"""Prebuilt model families covering the reference's workloads
(BASELINE.md): GPR (Gaussian + Student-t), mixture-of-experts GPR,
variational/MAP linear models, amortized (encoder-fed) SVI regression, and
Bayesian neural nets for the sampling workloads."""
from .gpr import GPR, GPRMarginal, SparseGPRobust, make_sine_dataset
from .expert_gpr import ExpertGPR, make_expert_dataset
from .linear import VariationalLinearModel, MAPLinearModel, make_linear_dataset
from .amortized import AmortizedRegression, make_synthetic_regression
from .bnn import BNN, VariationalBNN, make_bnn_dataset
from .svgp import (
    SVGPRegression,
    SVGPClassification,
    SVGPCount,
    SVGPMulticlass,
)
from .gpc import GPC, SparseGPC, SparseGPMulticlass
from .hetero import HeteroscedasticGPR, HeteroSVGP, make_hetero_dataset
from .multioutput import MultiOutputGPR, MultiOutputSVGP, make_multioutput_dataset
from .deepgp import DeepGPRegression, make_step_dataset
from .gplvm import GPLVM, make_curve_dataset
