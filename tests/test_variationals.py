"""Variational-layer tests mirroring `testing/test_variationals.py`:
logdet/sample projection vs hand-built numpy Cholesky math, Monte-Carlo KL vs
analytic Gaussian KL (loose rtol), LOCAL feed path including the
"assignment = feed" idiom, compile smoke tests, and predefined posterior
initialization checks."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import henbun_tpu as hb
from henbun_tpu.core import context as ctx_mod


def run_traced(m, fn, key=0):
    return m.run(fn, key=jax.random.PRNGKey(key))


class TestDiagonal:
    def test_sample_matches_numpy(self):
        m = hb.model.Model()
        m.q = hb.variationals.Variational(shape=[3], q_shape="diagonal")
        m.initialize()
        q_mu = np.asarray(m.q.q_mu.free_value)
        q_sqrt = np.asarray(m.q.q_sqrt.free_value)

        def fn(mm):
            s = mm.q  # draws the sample
            return ctx_mod.current().samples["q"]["u"], s

        u, sample = run_traced(m, fn)
        expected = q_mu + np.exp(q_sqrt) * np.asarray(u)
        assert np.allclose(np.asarray(sample), expected, atol=1e-5)

    def test_logdet(self):
        m = hb.model.Model()
        m.q = hb.variationals.Variational(shape=[4], q_shape="diagonal")
        m.initialize()
        q_sqrt = np.asarray(m.q.q_sqrt.free_value)
        ld = run_traced(m, lambda mm: mm.__dict__['q'].logdet)
        assert np.allclose(np.asarray(ld), 2.0 * q_sqrt, atol=1e-6)

    def test_fresh_noise_per_trace(self):
        m = hb.model.Model()
        m.q = hb.variationals.Variational(shape=[3])
        m.initialize()
        s1 = np.asarray(run_traced(m, lambda mm: mm.q, key=1))
        s2 = np.asarray(run_traced(m, lambda mm: mm.q, key=2))
        assert not np.allclose(s1, s2)
        # same key -> same sample (explicit-key reproducibility)
        s1b = np.asarray(run_traced(m, lambda mm: mm.q, key=1))
        assert np.allclose(s1, s1b)


class TestFullrank:
    def test_sample_matches_numpy_tril(self):
        m = hb.model.Model()
        m.q = hb.variationals.Variational(shape=[2, 2], q_shape="fullrank")
        m.initialize()
        q_mu = np.asarray(m.q.q_mu.free_value)     # [4]
        q_sqrt = np.asarray(m.q.q_sqrt.free_value)  # [4, 4]

        def fn(mm):
            s = mm.q
            return ctx_mod.current().samples["q"]["u"], s

        u, sample = run_traced(m, fn)
        expected = (q_mu + np.tril(q_sqrt) @ np.asarray(u)).reshape(2, 2)
        assert np.allclose(np.asarray(sample), expected, atol=1e-5)

    def test_logdet_fullrank(self):
        m = hb.model.Model()
        m.q = hb.variationals.Variational(shape=[3], q_shape="fullrank")
        m.initialize()
        q_sqrt = np.asarray(m.q.q_sqrt.free_value)
        ld = run_traced(m, lambda mm: mm.__dict__['q'].logdet)
        assert np.allclose(np.asarray(ld), np.log(np.diag(q_sqrt) ** 2), atol=1e-5)

    def test_batched_fullrank_shapes(self):
        m = hb.model.Model()
        m.q = hb.variationals.Variational(
            shape=[3], n_layers=[2], n_batch=5, q_shape="fullrank"
        )
        m.initialize()
        out = run_traced(m, lambda mm: mm.q)
        assert out.shape == (2, 5, 3)


class TestKL:
    def test_mc_kl_matches_analytic_gaussian(self):
        """Mean of 100 single-sample KL estimates vs closed-form Gaussian KL,
        rtol=0.1 (cf. testing/test_variationals.py:108-122)."""
        m = hb.model.Model()
        m.q = hb.variationals.Normal(shape=[4])
        m.q.q_mu = np.array([0.5, -0.3, 0.8, 0.1], dtype=np.float32)
        m.q.q_sqrt = np.log(np.array([0.7, 1.2, 0.5, 1.0], dtype=np.float32))
        m.initialize()
        q_mu = np.asarray(m.q.q_mu.free_value)
        sig = np.exp(np.asarray(m.q.q_sqrt.free_value))
        analytic = np.sum(-np.log(sig) + 0.5 * (sig**2 + q_mu**2) - 0.5)
        kls = [float(run_traced(m, lambda mm: mm.KL(), key=i)) for i in range(100)]
        assert np.allclose(np.mean(kls), analytic, rtol=0.1, atol=0.05)

    def test_kl_collection_gating(self):
        m = hb.model.Model()
        m.q = hb.variationals.Normal(shape=[3], collections=["cA"])
        m.initialize()
        kl_other = float(run_traced(m, lambda mm: mm.KL("cB")))
        assert kl_other == 0.0
        kl_match = float(run_traced(m, lambda mm: mm.KL("cA")))
        assert kl_match != 0.0

    def test_kl_with_prior_and_transform(self):
        """Variational with positive transform and a Gamma prior: the KL must
        include prior logp and the transform log-Jacobian."""
        m = hb.model.Model()
        m.q = hb.variationals.Variational(
            shape=[3],
            transform=hb.transforms.positive,
            prior=hb.priors.Gamma(2.0, 1.0),
        )
        m.initialize()
        kl = float(run_traced(m, lambda mm: mm.KL()))
        assert np.isfinite(kl)


class TestLocalFeed:
    def test_local_feed_and_sample(self):
        """Feeding a [N, 2*size] slab fills q_mu then q_sqrt and draws a
        batch-sized sample (cf. testing/test_variationals.py:166-234)."""
        m = hb.model.Model()
        m.q = hb.variationals.Variational(
            shape=[3], collections=hb.graph_key.LOCAL
        )
        assert m.q.feed_size == 6
        N = 4
        slab = np.random.default_rng(0).normal(size=(N, 6)).astype(np.float32)

        def fn(mm):
            mm.q = jnp.asarray(slab)  # assignment = feed
            s = mm.q  # triggers nothing new; uses the fed sample
            st = ctx_mod.current().samples["q"]
            return s, st["u"]

        sample, u = run_traced(m, fn)
        assert sample.shape == (N, 3)
        expected = slab[:, :3] + np.exp(slab[:, 3:]) * np.asarray(u)
        assert np.allclose(np.asarray(sample), expected, atol=1e-5)

    def test_local_gaussian_feed(self):
        """Gaussian LOCAL: slab carries q_mu, q_sqrt and scale."""
        m = hb.model.Model()
        m.q = hb.variationals.Gaussian(
            shape=[2], collections=hb.graph_key.LOCAL
        )
        assert m.q.feed_size == 5  # 2 + 2 + 1 (scale)
        N = 3
        slab = np.random.default_rng(1).normal(size=(N, 5)).astype(np.float32)

        def fn(mm):
            mm.q = jnp.asarray(slab)
            st = ctx_mod.current().samples["q"]
            return mm.q, st["u"]

        sample, u = run_traced(m, fn)
        assert sample.shape == (N, 2)
        raw = slab[:, :2] + np.exp(slab[:, 2:4]) * np.asarray(u)
        scale = np.logaddexp(0.0, slab[:, 4:5]) + 1e-6  # positive transform
        assert np.allclose(np.asarray(sample), scale * raw, atol=1e-5)

    def test_local_kl_uses_fed_values(self):
        m = hb.model.Model()
        m.q = hb.variationals.Normal(shape=[2], collections=hb.graph_key.LOCAL)
        N = 5
        slab = np.zeros((N, 4), dtype=np.float32)  # mu=0, log sigma=0

        def fn(mm):
            mm.q = jnp.asarray(slab)
            return mm.KL()

        kls = [float(run_traced(m, fn, key=i)) for i in range(200)]
        # q == prior == N(0,1) -> KL averages to ~0
        assert abs(np.mean(kls)) < 0.2


class TestPredefined:
    def test_gaussian_init_splitting(self):
        """mean/stddev splitting between scale and q
        (cf. variationals.py:264-288)."""
        m = hb.model.Model()
        m.q = hb.variationals.Gaussian(shape=[10000], mean=5.0, stddev=1.0)
        m.initialize()
        # |mean| >= stddev: scale ~= 5, q_mu ~= 1
        assert np.allclose(np.mean(m.q.scale.value), 5.0, rtol=0.2)
        assert np.allclose(np.mean(m.q.q_mu.value), 1.0, atol=0.1)
        samples = np.asarray(run_traced(m, lambda mm: mm.q))
        assert np.allclose(np.mean(samples), 5.0, rtol=0.2)

    def test_offset_gaussian(self):
        m = hb.model.Model()
        m.q = hb.variationals.OffsetGaussian(shape=[1000], mean=3.0, stddev=0.5)
        m.initialize()
        samples = np.asarray(run_traced(m, lambda mm: mm.q))
        assert np.allclose(np.mean(samples), 3.0, atol=0.5)

    def test_beta_in_unit_interval(self):
        m = hb.model.Model()
        m.q = hb.variationals.Beta(shape=[100])
        m.initialize()
        samples = np.asarray(run_traced(m, lambda mm: mm.q))
        assert np.all(samples > 0) and np.all(samples < 1)
        kl = float(run_traced(m, lambda mm: mm.KL()))
        assert np.isfinite(kl)

    def test_fullrank_gaussian_smoke(self):
        m = hb.model.Model()
        m.q = hb.variationals.Gaussian(shape=[3], q_shape="fullrank")
        m.initialize()
        s = np.asarray(run_traced(m, lambda mm: mm.q))
        assert s.shape == (3,)
        assert np.isfinite(s).all()


class TestFullrankPacked:
    def test_param_count_halved(self):
        m = hb.model.Model()
        m.qd = hb.variationals.Variational(shape=[8], q_shape="fullrank")
        m.qp = hb.variationals.Variational(shape=[8], q_shape="fullrank_packed")
        dense = np.asarray(m.qd.q_sqrt.free_value).size
        packed = np.asarray(m.qp.q_sqrt.free_value).size
        assert dense == 64 and packed == 36

    def test_sample_matches_numpy_packed(self):
        m = hb.model.Model()
        m.q = hb.variationals.Variational(shape=[3], q_shape="fullrank_packed")
        m.initialize()
        q_mu = np.asarray(m.q.q_mu.free_value)
        vec = np.asarray(m.q.q_sqrt.free_value)
        # independent numpy oracle of the fill-triangular layout
        tri = np.tril(np.concatenate([vec[3:], vec[::-1]]).reshape(3, 3))

        def fn(mm):
            s = mm.q
            return ctx_mod.current().samples["q"]["u"], s

        u, sample = run_traced(m, fn)
        assert np.allclose(np.asarray(sample), q_mu + tri @ np.asarray(u), atol=1e-5)

    def test_logdet_uses_packed_diagonal(self):
        m = hb.model.Model()
        m.q = hb.variationals.Variational(shape=[4], q_shape="fullrank_packed")
        m.initialize()
        vec = np.asarray(m.q.q_sqrt.free_value)
        tri = np.tril(np.concatenate([vec[4:], vec[::-1]]).reshape(4, 4))
        ld = run_traced(m, lambda mm: mm.__dict__["q"].logdet)
        assert np.allclose(
            np.asarray(ld), np.log(np.diag(tri) ** 2 + 1e-20), atol=1e-5
        )

    def test_gpr_with_packed_posterior_converges(self):
        import optax
        from henbun_tpu import models, densities
        from henbun_tpu.ops.linalg import matmul_hp

        X, Y = models.make_sine_dataset(n=30)

        class PackedGPR(hb.model.Model):
            def setUp(self):
                self.X = hb.Data(X)
                self.Y = hb.Data(Y)
                self.q = hb.variationals.Gaussian(
                    shape=list(X.shape), q_shape="fullrank_packed"
                )
                self.kern = hb.gp.kernels.UnitRBF()
                self.k_var = hb.Variable([1], transform=hb.transforms.positive)
                self.var = hb.Variable([1], transform=hb.transforms.positive)

            @hb.AutoOptimize()
            def ELBO(self):
                f = matmul_hp(self.kern.Cholesky(self.X), self.q) * jnp.sqrt(
                    self.k_var
                )
                return jnp.sum(densities.gaussian(self.Y, f, self.var)) - self.KL()

        m = PackedGPR(seed=0)
        opt = m.ELBO()
        opt.compile(optax.adam(0.01))
        e0 = float(opt.run())
        opt.optimize(maxiter=4000)
        e1 = float(opt.run())
        assert np.isfinite(e1) and e1 > e0

    def test_local_packed_feed_size(self):
        m = hb.model.Model()
        m.q = hb.variationals.Normal(
            shape=[4], q_shape="fullrank_packed", collections=hb.graph_key.LOCAL
        )
        # q_mu (4) + packed q_sqrt (10)
        assert m.q.feed_size == 14


class TestMoreLocalFeeds:
    def test_offset_gaussian_local_feed(self):
        """OffsetGaussian LOCAL: slab packs offset, q_mu, q_sqrt, scale in
        name-sorted order."""
        m = hb.model.Model(seed=0)
        m.q = hb.variationals.OffsetGaussian(
            shape=[2], collections=hb.graph_key.LOCAL
        )
        # offset(1) + q_mu(2) + q_sqrt(2) + scale(1)
        assert m.q.feed_size == 6
        N = 3
        slab = np.random.default_rng(0).normal(size=(N, 6)).astype(np.float32)

        def fn(mm):
            mm.q = jnp.asarray(slab)
            st = ctx_mod.current().samples["q"]
            return mm.q, st["u"]

        sample, u = run_traced(m, fn)
        assert sample.shape == (N, 2)
        # name-sorted: offset, q_mu, q_sqrt, scale
        offset = slab[:, 0:1]
        q_mu = slab[:, 1:3]
        q_sqrt = slab[:, 3:5]
        scale = np.logaddexp(0, slab[:, 5:6]) + 1e-6
        raw = q_mu + np.exp(q_sqrt) * np.asarray(u)
        assert np.allclose(np.asarray(sample), scale * raw + offset, atol=1e-5)

    def test_beta_local_feed_in_unit_interval(self):
        m = hb.model.Model(seed=0)
        m.q = hb.variationals.Beta(shape=[2], collections=hb.graph_key.LOCAL)
        # alpha(1) + beta(1) + q_mu(2) + q_sqrt(2)
        assert m.q.feed_size == 6
        N = 4
        slab = np.random.default_rng(1).normal(size=(N, 6)).astype(np.float32)

        def fn(mm):
            mm.q = jnp.asarray(slab)
            return mm.q, mm.KL()

        sample, kl = run_traced(m, fn)
        assert sample.shape == (N, 2)
        s = np.asarray(sample)
        assert np.all(s > 0) and np.all(s < 1)
        assert np.isfinite(float(kl))


class TestPackedLocalFeed:
    """fullrank_packed LOCALs through the encoder slab (VERDICT r2 ask #6 /
    SURVEY hard part (a)): the slab carries q_mu then the PACKED lower
    triangle, and the fed sample is mu + fill_triangular(packed) @ u."""

    def test_packed_local_feed_and_sample(self):
        from henbun_tpu.ops.linalg import fill_triangular

        m = hb.model.Model()
        m.q = hb.variationals.Normal(
            shape=[3], q_shape="fullrank_packed",
            collections=hb.graph_key.LOCAL,
        )
        assert m.q.feed_size == 3 + 6
        N = 4
        slab = np.random.default_rng(0).normal(size=(N, 9)).astype(np.float32)

        def fn(mm):
            mm.q = jnp.asarray(slab)  # assignment = feed
            st = ctx_mod.current().samples["q"]
            return mm.q, st["u"]

        sample, u = run_traced(m, fn)
        assert sample.shape == (N, 3)
        L = np.asarray(fill_triangular(jnp.asarray(slab[:, 3:]), 3))  # [N,3,3]
        expected = slab[:, :3] + np.einsum("nij,nj->ni", L, np.asarray(u))
        assert np.allclose(np.asarray(sample), expected, atol=1e-5)

    def test_packed_local_analytic_kl_matches_dense(self):
        """The analytic KL of a fed packed local equals the dense-fullrank KL
        of the unpacked factor (same distribution, different layout)."""
        from henbun_tpu.ops.linalg import fill_triangular

        N, d = 5, 3
        rng = np.random.default_rng(1)
        mu = rng.normal(size=(N, d)).astype(np.float32)
        packed = rng.normal(size=(N, d * (d + 1) // 2)).astype(np.float32)
        slab = np.concatenate([mu, packed], axis=-1)

        m = hb.model.Model()
        m.q = hb.variationals.Normal(
            shape=[d], q_shape="fullrank_packed",
            collections=hb.graph_key.LOCAL, analytic_kl=True,
        )

        def fn(mm):
            mm.q = jnp.asarray(slab)
            return mm.KL()

        kl = float(run_traced(m, fn))
        L = np.asarray(fill_triangular(jnp.asarray(packed), d))
        # exact KL(q || N(0,I)) summed over the batch
        expect = 0.0
        for i in range(N):
            Sig = L[i] @ L[i].T
            expect += 0.5 * (
                mu[i] @ mu[i] + np.trace(Sig) - d
                - np.log(np.diag(L[i]) ** 2 + 1e-20).sum()
            )
        assert np.allclose(kl, expect, rtol=1e-5)

    def test_amortized_packed_trains_end_to_end(self):
        """AmortizedRegression with fullrank_packed locals: the encoder slab
        is d_z + d_z(d_z+1)/2 wide (HALF the dense d_z + d_z^2 — the packed
        layout's point), the feed path runs under the jitted minibatch scan,
        and the ELBO improves."""
        import optax

        from henbun_tpu.models.amortized import (
            AmortizedRegression,
            make_synthetic_regression,
        )

        X, Y = make_synthetic_regression(n=2048, d_x=4, seed=0)
        d_z = 4
        m = AmortizedRegression(
            seed=0, X=X, Y=Y, d_z=d_z, hidden=32, q_local="fullrank_packed"
        )
        assert m.z.feed_size == d_z + d_z * (d_z + 1) // 2  # 14 < 4 + 16
        opt = m.ELBO()
        opt.compile(optax.adam(0.003))
        e0 = float(np.mean([opt.run(minibatch_size=256) for _ in range(10)]))
        opt.optimize(maxiter=1500, minibatch_size=256)
        e1 = float(np.mean([opt.run(minibatch_size=256) for _ in range(10)]))
        assert np.isfinite(np.concatenate(opt.history)).all()
        assert e1 > e0
