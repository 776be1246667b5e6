"""Adversarial nested-tree tests (cf. reference testing/test_param.py:152-202
nested trees): containers within containers, ParamLists of Variationals,
feeding across levels, KL aggregation at depth, checkpoint paths at depth."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import henbun_tpu as hb
from henbun_tpu.core import context as ctx_mod


class TestNestedContainers:
    def _tree(self):
        m = hb.model.Model(seed=0)
        m.outer = hb.Parameterized()
        m.outer.inner = hb.Parameterized()
        m.outer.inner.v = hb.Variable([2], mean=3.0, stddev=0.01)
        m.outer.w = hb.Variable([3])
        return m

    def test_paths_and_long_names(self):
        m = self._tree()
        assert m.outer.inner.v.long_name == "model.outer.inner.v"
        assert m.outer.inner.v.path_to(m) == "outer.inner.v"
        assert set(m.param_dict()) == {"outer.inner.v", "outer.w"}

    def test_trace_access_at_depth(self):
        m = self._tree()
        m.initialize()
        out = m.run(lambda mm: mm.outer.inner.v + 1.0)
        assert np.allclose(np.asarray(out), m.outer.inner.v.value + 1.0)

    def test_checkpoint_subtree_at_depth(self, tmp_path):
        m = self._tree()
        m.initialize()
        val = m.outer.inner.v.value.copy()
        p = str(tmp_path / "inner.ckpt")
        m.outer.inner.save(p)
        m.outer.inner.v = np.zeros(2, np.float32)
        m.initialize()
        m.outer.inner.restore(p)
        assert np.allclose(m.outer.inner.v.value, val)

    def test_nested_kl_aggregation(self):
        m = hb.model.Model(seed=0)
        m.a = hb.Parameterized()
        m.a.q1 = hb.variationals.Normal(shape=[2])
        m.a.b = hb.Parameterized()
        m.a.b.q2 = hb.variationals.Normal(shape=[3])
        m.initialize()

        def fn(mm):
            total = mm.KL()
            # KL of the subtree only (recursion respects structure)
            sub = mm.__dict__["a"].__dict__["b"].KL()
            return total, sub

        total, sub = m.run(fn)
        assert np.isfinite(float(total)) and np.isfinite(float(sub))
        assert float(total) != float(sub)

    def test_nested_local_feed_across_levels(self):
        """Feeding at the root packs LOCAL leaves across nesting levels in
        recursive name-sorted order."""
        m = hb.model.Model(seed=0)
        m.grp = hb.Parameterized()
        m.grp.a = hb.Variable([2], collections=hb.graph_key.LOCAL)
        m.grp.sub = hb.Parameterized()
        m.grp.sub.b = hb.Variable([3], collections=hb.graph_key.LOCAL)
        assert m.feed_size == 5
        N = 4
        slab = np.random.default_rng(0).normal(size=(N, 5)).astype(np.float32)

        def fn(mm):
            mm.feed(jnp.asarray(slab))
            return mm.grp.a, mm.grp.sub.b

        a, b = m.run(fn, key=jax.random.PRNGKey(0))
        # direct children of grp sorted: 'a' < 'sub'
        assert np.allclose(np.asarray(a), slab[:, :2])
        assert np.allclose(np.asarray(b), slab[:, 2:].reshape(N, 3))


class TestParamListOfVariationals:
    def test_paramlist_kl_and_samples(self):
        m = hb.model.Model(seed=0)
        m.qs = hb.ParamList(
            [hb.variationals.Normal(shape=[2]) for _ in range(3)]
        )
        m.initialize()
        assert m.qs[1].long_name == "model.qs.item1"

        def fn(mm):
            total = jnp.zeros(())
            for i in range(3):
                total = total + jnp.sum(mm.qs[i])
            return total, mm.KL()

        s, kl = m.run(fn, key=jax.random.PRNGKey(0))
        assert np.isfinite(float(s)) and np.isfinite(float(kl))

    def test_paramlist_training(self):
        class M(hb.model.Model):
            def setUp(self):
                self.ps = hb.ParamList([hb.Variable([2]), hb.Variable([2])])

            @hb.AutoOptimize()
            def obj(self):
                return -(jnp.sum(jnp.square(self.ps[0]))
                         + jnp.sum(jnp.square(self.ps[1])))

        m = M(seed=0)
        opt = m.obj()
        opt.compile(optax.adam(0.05))
        opt.optimize(maxiter=500)
        assert np.allclose(m.ps[0].value, 0, atol=1e-2)
        assert np.allclose(m.ps[1].value, 0, atol=1e-2)


class TestTransformedVariationalTraining:
    def test_positive_variational_with_gamma_prior_trains(self):
        """A transform+prior Variational trains end-to-end and stays in its
        constrained space."""
        rng = np.random.default_rng(0)
        y = rng.gamma(3.0, 2.0, size=400).astype(np.float32)

        class M(hb.model.Model):
            def setUp(self):
                self.y = hb.Data(y[:, None])
                self.rate = hb.variationals.Variational(
                    shape=[1], transform=hb.transforms.positive,
                    prior=hb.priors.Gamma(1.0, 10.0),
                )

            @hb.AutoOptimize()
            def elbo(self):
                return jnp.sum(
                    hb.densities.exponential(self.rate, self.y)
                ) - self.KL()

        m = M(seed=0)
        opt = m.elbo()
        opt.compile(optax.adam(0.02))
        opt.optimize(maxiter=2000)
        # posterior mean of an exponential-rate parameter: near mean(y)=6
        draws = np.asarray(m.draws(lambda mm: mm.rate, 200))
        assert np.all(draws > 0)
        assert 3.0 < draws.mean() < 10.0


class TestLayeredLocalVariational:
    def test_layered_variational_feed(self):
        """n_layers-batched LOCAL Variational: slab [L, N, feed] unpacks per
        layer (the reference's NN-layer amortization idiom)."""
        m = hb.model.Model(seed=0)
        m.q = hb.variationals.Normal(
            shape=[2], n_layers=[3], collections=hb.graph_key.LOCAL
        )
        assert m.q.feed_size == 4
        N = 5
        slab = np.random.default_rng(0).normal(size=(3, N, 4)).astype(np.float32)

        def fn(mm):
            mm.q = jnp.asarray(slab)
            st = ctx_mod.current().samples["q"]
            return mm.q, st["u"]

        sample, u = m.run(fn, key=jax.random.PRNGKey(0))
        assert sample.shape == (3, N, 2)
        expected = slab[..., :2] + np.exp(slab[..., 2:]) * np.asarray(u)
        assert np.allclose(np.asarray(sample), expected, atol=1e-5)


class TestIntegerData:
    def test_poisson_regression_with_int_counts(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 2, size=(300, 1)).astype(np.float32)
        lam = np.exp(0.5 + 1.0 * x)
        y = rng.poisson(lam).astype(np.int64)

        class M(hb.model.Model):
            def setUp(self):
                self.x = hb.Data(x)
                self.y = hb.Data(y)  # int data -> int32
                self.a = hb.Variable([1])
                self.b = hb.Variable([1])

            @hb.AutoOptimize()
            def logp(self):
                lam = jnp.exp(self.a + self.b * self.x)
                return jnp.sum(
                    hb.densities.poisson(lam, self.y.astype(jnp.float32))
                )

        m = M(seed=0)
        assert m.y.data.dtype == np.int32
        opt = m.logp()
        opt.compile(optax.adam(0.05))
        opt.optimize(maxiter=1500)
        assert abs(float(m.a.value[0]) - 0.5) < 0.2
        assert abs(float(m.b.value[0]) - 1.0) < 0.2


class TestRunFeedDictOverride:
    def test_feed_dict_overrides_data(self):
        m = hb.model.Model(seed=0)
        m.x = hb.Data(np.zeros((3, 1), np.float32))
        out = m.run(
            lambda mm: mm.x * 2,
            feed_dict={"x": jnp.ones((3, 1))},
        )
        assert np.allclose(np.asarray(out), 2.0)
