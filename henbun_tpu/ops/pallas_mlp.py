"""Fused 2-layer MLP forward as a Pallas TPU kernel.

The amortized-SVI hot path (encoder/decoder of
:class:`henbun_tpu.models.AmortizedRegression`) is a [N, d_in] @ [d_in, d_h]
matmul, bias+activation, then [N, d_h] @ [d_h, d_out] matmul + bias. XLA
fuses the elementwise ops into the matmuls but keeps the two matmuls as
separate kernels, round-tripping the hidden activations through HBM. This
kernel tiles the batch axis and runs both MXU contractions back-to-back in
VMEM: one HBM read of x, one HBM write of y (plus h as a residual when
training needs it for the backward pass).

Gradients: custom_vjp with the backward expressed as plain XLA matmuls over
the saved (x, h) residuals — those are large GEMMs the MXU already handles at
speed of light.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256


def _act(name, x):
    if name == "relu":
        return jnp.maximum(x, 0.0)
    if name == "sigmoid":
        return jax.nn.sigmoid(x)
    if name == "tanh":
        return jnp.tanh(x)
    raise ValueError("unsupported activation %r" % name)


def _mlp_kernel(x_ref, w0_ref, b0_ref, w1_ref, b1_ref, y_ref, h_ref, *, activation):
    h = (
        jnp.dot(x_ref[:], w0_ref[:], preferred_element_type=jnp.float32)
        + b0_ref[:]
    )
    h = _act(activation, h)
    h_ref[:] = h
    y_ref[:] = (
        jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    )


def _mlp_pallas(x, w0, b0, w1, b1, activation, interpret):
    n, d_in = x.shape
    d_h = w0.shape[1]
    d_out = w1.shape[1]
    n_pad = -(-n // TILE_N) * TILE_N
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    grid = (n_pad // TILE_N,)
    y, h = pl.pallas_call(
        functools.partial(_mlp_kernel, activation=activation),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, d_in), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, d_h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_h, d_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_N, d_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, d_h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, d_out), x.dtype),
            jax.ShapeDtypeStruct((n_pad, d_h), x.dtype),
        ],
        interpret=interpret,
    )(x, w0, b0, w1, b1)
    return y[:n], h[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def mlp2_forward(x, w0, b0, w1, b1, activation="relu", interpret=False):
    """act(x @ w0 + b0) @ w1 + b1 as one fused TPU kernel.

    x: [N, d_in]; w0: [d_in, d_h]; b0: [1, d_h]; w1: [d_h, d_out];
    b1: [1, d_out]. activation in {'relu', 'sigmoid', 'tanh'}.
    """
    y, _ = _mlp_pallas(x, w0, b0, w1, b1, activation, interpret)
    return y


def _fwd(x, w0, b0, w1, b1, activation, interpret):
    y, h = _mlp_pallas(x, w0, b0, w1, b1, activation, interpret)
    return y, (x, w0, w1, h)


def _bwd(activation, interpret, res, dy):
    x, w0, w1, h = res
    dw1 = h.T @ dy
    db1 = jnp.sum(dy, axis=0, keepdims=True)
    dh = dy @ w1.T
    if activation == "relu":
        dpre = dh * (h > 0)
    elif activation == "sigmoid":
        dpre = dh * h * (1.0 - h)
    elif activation == "tanh":
        dpre = dh * (1.0 - h * h)
    else:
        raise ValueError(activation)
    dw0 = x.T @ dpre
    db0 = jnp.sum(dpre, axis=0, keepdims=True)
    dx = dpre @ w0.T
    return dx, dw0, db0, dw1, db1


mlp2_forward.defvjp(_fwd, _bwd)


def supported(nodes, neuron_types):
    """Is a NeuralNet configuration covered by the fused kernel?
    Exactly 2 layers (one hidden activation) with a supported activation."""
    if len(nodes) != 3 or len(neuron_types) != 1:
        return False
    name = getattr(neuron_types[0], "__name__", "")
    return name in ("relu", "sigmoid", "tanh")
