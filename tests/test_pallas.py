"""Pallas kernel tests (interpret mode on CPU): fused 2-layer MLP forward
matches the jnp reference, gradients match, padding/tiling edges covered."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import henbun_tpu as hb
from henbun_tpu.ops import pallas_mlp


RNG = np.random.default_rng(0)


def ref_mlp(x, w0, b0, w1, b1, act):
    h = {"relu": lambda v: np.maximum(v, 0),
         "sigmoid": lambda v: 1 / (1 + np.exp(-v)),
         "tanh": np.tanh}[act](x @ w0 + b0)
    return h @ w1 + b1


@pytest.mark.parametrize("act", ["relu", "sigmoid", "tanh"])
@pytest.mark.parametrize("n", [64, 256, 300])  # under, exact, over one tile
def test_fused_mlp_matches_reference(act, n):
    d_in, d_h, d_out = 9, 32, 4
    x = RNG.normal(size=(n, d_in)).astype(np.float32)
    w0 = RNG.normal(size=(d_in, d_h)).astype(np.float32) * 0.3
    b0 = RNG.normal(size=(1, d_h)).astype(np.float32)
    w1 = RNG.normal(size=(d_h, d_out)).astype(np.float32) * 0.3
    b1 = RNG.normal(size=(1, d_out)).astype(np.float32)
    y = pallas_mlp.mlp2_forward(
        jnp.asarray(x), jnp.asarray(w0), jnp.asarray(b0),
        jnp.asarray(w1), jnp.asarray(b1), act, True,
    )
    assert y.shape == (n, d_out)
    assert np.allclose(np.asarray(y), ref_mlp(x, w0, b0, w1, b1, act), atol=2e-4)


def test_fused_mlp_gradients_match():
    d_in, d_h, d_out, n = 5, 16, 3, 128
    args = [
        RNG.normal(size=s).astype(np.float32) * 0.5
        for s in [(n, d_in), (d_in, d_h), (1, d_h), (d_h, d_out), (1, d_out)]
    ]
    jargs = [jnp.asarray(a) for a in args]

    def loss_fused(*a):
        return jnp.sum(pallas_mlp.mlp2_forward(*a, "tanh", True) ** 2)

    def loss_ref(x, w0, b0, w1, b1):
        return jnp.sum((jnp.tanh(x @ w0 + b0) @ w1 + b1) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*jargs)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*jargs)
    for gf, gr in zip(g_fused, g_ref):
        assert np.allclose(np.asarray(gf), np.asarray(gr), rtol=1e-3, atol=1e-3)


def test_supported_predicate():
    assert pallas_mlp.supported([4, 16, 2], [hb.nn.relu])
    assert not pallas_mlp.supported([4, 16, 16, 2], [hb.nn.relu, hb.nn.relu])
    assert not pallas_mlp.supported([4, 16, 2], [lambda x: x])


def test_neuralnet_falls_back_on_cpu():
    """On the CPU test backend the NeuralNet must silently use the jnp path
    and stay correct."""
    m = hb.model.Model(seed=0)
    m.net = hb.nn.NeuralNet([3, 8, 2], neuron_types=hb.nn.relu)
    m.initialize()
    x = RNG.normal(size=(16, 3)).astype(np.float32)
    out = m.run(lambda mm: mm.net(jnp.asarray(x)))
    w0 = np.asarray(m.net.matbias0.w.free_value)
    b0 = np.asarray(m.net.matbias0.b.free_value)
    w1 = np.asarray(m.net.matbias1.w.free_value)
    b1 = np.asarray(m.net.matbias1.b.free_value)
    assert np.allclose(np.asarray(out), ref_mlp(x, w0, b0, w1, b1, "relu"), atol=1e-5)


class TestFusedSampleKL:
    def _ref(self, slab, u):
        s = u.shape[-1]
        mu, logsig = slab[:, :s], slab[:, s:]
        raw = mu + np.exp(logsig) * u
        kl = -0.5 * np.sum(2 * logsig + u**2 - raw**2)
        return raw, kl

    @pytest.mark.parametrize("n", [64, 256, 300])
    def test_matches_reference(self, n):
        from henbun_tpu.ops import pallas_sample

        s = 6
        slab = RNG.normal(size=(n, 2 * s)).astype(np.float32) * 0.5
        u = RNG.normal(size=(n, s)).astype(np.float32)
        sample, kl = pallas_sample.fused_normal_sample_kl(
            jnp.asarray(slab), jnp.asarray(u), True
        )
        ref_sample, ref_kl = self._ref(slab, u)
        assert np.allclose(np.asarray(sample), ref_sample, atol=1e-5)
        assert np.allclose(float(kl), ref_kl, rtol=1e-4)

    def test_gradients_match_autodiff(self):
        from henbun_tpu.ops import pallas_sample

        n, s = 128, 4
        slab = jnp.asarray(RNG.normal(size=(n, 2 * s)).astype(np.float32) * 0.5)
        u = jnp.asarray(RNG.normal(size=(n, s)).astype(np.float32))

        def loss_fused(slab, u):
            sample, kl = pallas_sample.fused_normal_sample_kl(slab, u, True)
            return jnp.sum(sample**2) + 3.0 * kl

        def loss_ref(slab, u):
            mu, logsig = slab[:, :s], slab[:, s:]
            raw = mu + jnp.exp(logsig) * u
            kl = -0.5 * jnp.sum(2 * logsig + u**2 - raw**2)
            return jnp.sum(raw**2) + 3.0 * kl

        gf = jax.grad(loss_fused, argnums=(0, 1))(slab, u)
        gr = jax.grad(loss_ref, argnums=(0, 1))(slab, u)
        for a, b in zip(gf, gr):
            assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


class TestPallasCholesky:
    def _spd(self, n, seed=0):
        B = np.random.default_rng(seed).normal(size=(n, n)).astype(np.float32)
        return B @ B.T + n * np.eye(n, dtype=np.float32)

    @pytest.mark.parametrize("n", [3, 8, 40, 100, 128])
    def test_matches_xla_cholesky(self, n):
        from henbun_tpu.ops.pallas_chol import cholesky128

        A = self._spd(n)
        L = np.asarray(cholesky128(jnp.asarray(A), interpret=True))
        Lref = np.linalg.cholesky(A)
        assert L.shape == (n, n)
        assert np.allclose(L, Lref, atol=1e-3 * np.abs(Lref).max())
        # strictly lower output above the diagonal
        assert np.allclose(np.triu(L, 1), 0.0)

    def test_nan_on_non_spd(self):
        from henbun_tpu.ops.pallas_chol import cholesky128

        A = -np.eye(8, dtype=np.float32)  # negative pivots
        L = np.asarray(cholesky128(jnp.asarray(A), interpret=True))
        assert np.isnan(L).any()

    def test_rejects_large(self):
        from henbun_tpu.ops.pallas_chol import cholesky128

        with pytest.raises(ValueError):
            cholesky128(jnp.eye(129))
