"""Dense feed-forward encoders for amortized inference.

Parity with `/root/reference/Henbun/nn.py:10-87`: ``MatBias`` (w, b pair with
``clip(x @ w + b)``) and ``NeuralNet`` (a chain of MatBias with per-layer
activations; ``variable_types`` may be ``Variational`` for Bayesian NN
weights). Layered via leading ``n_layers`` axes — jnp.matmul batches those
natively onto the MXU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ._settings import settings
from .core.param import Variable, Parameterized, graph_key
from .ops.linalg import clip


class MatBias(Parameterized):
    """A matrix/bias pair computing clip(x @ w + b) (cf. nn.py:10-32)."""

    def __init__(
        self,
        nodes,
        n_layers=[],
        mean=0.0,
        stddev=1.0,
        variable=Variable,
        collections=None,
    ):
        assert len(nodes) == 2
        Parameterized.__init__(self)
        collections = collections if collections is not None else [graph_key.VARIABLES]
        self.w = variable(
            shape=[nodes[0], nodes[1]],
            n_layers=n_layers,
            mean=mean,
            stddev=stddev,
            collections=collections,
        )
        self.b = variable(
            shape=[1, nodes[1]],
            n_layers=n_layers,
            mean=mean,
            stddev=stddev,
            collections=collections,
        )

    def __call__(self, x):
        return clip(jnp.matmul(x, self.w) + self.b)


def sigmoid(x, name=None):
    return jax.nn.sigmoid(x)


def relu(x, name=None):
    return jax.nn.relu(x)


def tanh(x, name=None):
    return jnp.tanh(x)


class NeuralNet(Parameterized):
    """A dense feed-forward net: len(nodes)-1 MatBias layers with activations
    between them (none after the last), cf. nn.py:34-84.

    - variable_types: Variable (point weights) or a Variational subclass
      (Bayesian NN weights, sampled fresh each trace); single type or a list.
    - neuron_types: single activation or list, default sigmoid.
    """

    def __init__(
        self,
        nodes,
        n_layers=[],
        mean=0.0,
        stddev=1.0,
        variable_types=Variable,
        neuron_types=sigmoid,
        collections=None,
    ):
        Parameterized.__init__(self)
        collections = collections if collections is not None else [graph_key.VARIABLES]
        self.nodes = nodes
        if not isinstance(variable_types, list):
            variable_types = [variable_types for _ in range(len(nodes) - 1)]
        if not isinstance(neuron_types, list):
            self.neuron_types = [neuron_types for _ in range(len(nodes) - 2)]
        else:
            self.neuron_types = neuron_types
        self._matbias_list = []
        for i in range(len(nodes) - 1):
            matbias = MatBias(
                nodes=[nodes[i], nodes[i + 1]],
                n_layers=n_layers,
                mean=mean,
                stddev=stddev,
                variable=variable_types[i],
                collections=collections,
            )
            self._matbias_list.append(matbias)
            setattr(self, "matbias" + str(i), matbias)

    def __call__(self, x):
        # plain jnp chain: XLA's fusion measured within 4% of a hand-written
        # Pallas MLP kernel at encoder sizes (the kernel was retired in round
        # 2 per docs/PERF.md §Pallas — `[tpu] use_pallas` now gates only the
        # batched-Cholesky kernel, which does win)
        y = x
        for i in range(len(self.nodes) - 2):
            y = self.neuron_types[i](self._matbias_list[i](y))
        return self._matbias_list[-1](y)

    def __getitem__(self, i):
        return self._matbias_list[i]
