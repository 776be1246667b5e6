"""NN encoder tests mirroring `testing/test_nn.py` and
`testing/test_nn_model.py`: forward pass vs manually composed matmul chain,
layered (n_layers) batching, Bayesian (Variational) weights, and a manual
training loop against the tree's param_dict."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

import henbun_tpu as hb
from henbun_tpu.core import context as ctx_mod


RNG = np.random.default_rng(0)


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


class TestMatBias:
    def test_forward(self):
        m = hb.model.Model(seed=0)
        m.mb = hb.nn.MatBias([3, 2])
        m.initialize()
        x = RNG.normal(size=(5, 3)).astype(np.float32)
        out = m.run(lambda mm: mm.mb(jnp.asarray(x)))
        w = np.asarray(m.mb.w.free_value)
        b = np.asarray(m.mb.b.free_value)
        assert np.allclose(np.asarray(out), x @ w + b, atol=1e-5)


class TestNeuralNet:
    def test_forward_vs_manual_chain(self):
        """cf. testing/test_nn.py:11-52."""
        m = hb.model.Model(seed=0)
        m.net = hb.nn.NeuralNet([3, 8, 2])
        m.initialize()
        x = RNG.normal(size=(5, 3)).astype(np.float32)
        out = m.run(lambda mm: mm.net(jnp.asarray(x)))
        w0 = np.asarray(m.net.matbias0.w.free_value)
        b0 = np.asarray(m.net.matbias0.b.free_value)
        w1 = np.asarray(m.net.matbias1.w.free_value)
        b1 = np.asarray(m.net.matbias1.b.free_value)
        manual = sigmoid(x @ w0 + b0) @ w1 + b1
        assert np.allclose(np.asarray(out), manual, atol=1e-5)

    def test_layered(self):
        m = hb.model.Model(seed=0)
        m.net = hb.nn.NeuralNet([3, 4, 2], n_layers=[2])
        m.initialize()
        x = RNG.normal(size=(2, 5, 3)).astype(np.float32)
        out = m.run(lambda mm: mm.net(jnp.asarray(x)))
        assert out.shape == (2, 5, 2)

    def test_custom_activations(self):
        m = hb.model.Model(seed=0)
        m.net = hb.nn.NeuralNet(
            [3, 4, 4, 2], neuron_types=[hb.nn.relu, hb.nn.tanh]
        )
        m.initialize()
        x = RNG.normal(size=(5, 3)).astype(np.float32)
        out = m.run(lambda mm: mm.net(jnp.asarray(x)))
        w0 = np.asarray(m.net.matbias0.w.free_value)
        b0 = np.asarray(m.net.matbias0.b.free_value)
        w1 = np.asarray(m.net.matbias1.w.free_value)
        b1 = np.asarray(m.net.matbias1.b.free_value)
        w2 = np.asarray(m.net.matbias2.w.free_value)
        b2 = np.asarray(m.net.matbias2.b.free_value)
        manual = np.tanh(np.maximum(x @ w0 + b0, 0) @ w1 + b1) @ w2 + b2
        assert np.allclose(np.asarray(out), manual, atol=1e-5)

    def test_bayesian_weights(self):
        """variable_types=Variational gives stochastic weights: different
        trace keys, different outputs (cf. nn.py:43-54)."""
        m = hb.model.Model(seed=0)
        m.net = hb.nn.NeuralNet(
            [3, 4, 2], variable_types=hb.variationals.Normal
        )
        m.initialize()
        x = RNG.normal(size=(5, 3)).astype(np.float32)
        o1 = np.asarray(
            m.run(lambda mm: mm.net(jnp.asarray(x)), key=jax.random.PRNGKey(1))
        )
        o2 = np.asarray(
            m.run(lambda mm: mm.net(jnp.asarray(x)), key=jax.random.PRNGKey(2))
        )
        assert not np.allclose(o1, o2)
        kl = m.run(lambda mm: mm.KL())
        assert np.isfinite(float(kl))

    def test_getitem(self):
        m = hb.model.Model(seed=0)
        m.net = hb.nn.NeuralNet([3, 4, 2])
        assert m.net[0] is m.net.matbias0


class TestManualTraining:
    def test_manual_loop_with_param_dict(self):
        """Manual (non-AutoOptimize) training loop with raw optax against the
        tree's param_dict (cf. testing/test_nn_model.py:19-28)."""
        m = hb.model.Model(seed=0)
        m.net = hb.nn.NeuralNet([1, 4, 1])
        m.initialize()
        x = np.linspace(-1, 1, 20)[:, None].astype(np.float32)
        y = (x**2).astype(np.float32)

        params = m.param_dict()
        tx = optax.adam(0.05)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss(p):
                with ctx_mod.trace(m, p, {}, jax.random.PRNGKey(0)):
                    pred = m.net(jnp.asarray(x))
                return jnp.mean((pred - y) ** 2)

            l, g = jax.value_and_grad(loss)(params)
            updates, opt_state = tx.update(g, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, l

        l0 = None
        for i in range(200):
            params, opt_state, l = step(params, opt_state)
            if l0 is None:
                l0 = float(l)
        assert float(l) < l0 * 0.5
        m.set_param_dict(params)  # write back works
        pred = m.run(lambda mm: mm.net(jnp.asarray(x)))
        assert np.isfinite(np.asarray(pred)).all()
