"""HMC + log-prob builder tests: statistical correctness on known Gaussians,
transform Jacobian handling, chain sharding over the mesh, and the
model-tree -> flat-density path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import henbun_tpu as hb
from henbun_tpu import models
from henbun_tpu.inference import hmc, logprob
from henbun_tpu.parallel import make_mesh


class TestHMCGaussian:
    def test_recovers_gaussian_moments(self):
        """Standard 2D correlated Gaussian: posterior moments within MC
        error."""
        cov = np.array([[1.0, 0.7], [0.7, 2.0]])
        prec = np.linalg.inv(cov)

        def lp(theta):
            return -0.5 * theta @ jnp.asarray(prec) @ theta

        init = jax.random.normal(jax.random.PRNGKey(0), (8, 2))
        res = hmc.sample(
            lp, init, jax.random.PRNGKey(1), num_samples=500, num_warmup=300
        )
        x = np.asarray(res.samples).reshape(-1, 2)
        assert np.allclose(x.mean(0), 0.0, atol=0.15)
        emp_cov = np.cov(x.T)
        assert np.allclose(emp_cov, cov, atol=0.35)
        assert np.asarray(res.accept_prob).mean() > 0.5

    def test_mass_adaptation_handles_scale_separation(self):
        """Anisotropic Gaussian (variances 1 and 100): mass adaptation keeps
        acceptance healthy and recovers both scales."""
        var = jnp.asarray([1.0, 100.0])

        def lp(theta):
            return -0.5 * jnp.sum(theta**2 / var)

        init = jax.random.normal(jax.random.PRNGKey(0), (8, 2))
        res = hmc.sample(
            lp, init, jax.random.PRNGKey(1), num_samples=800, num_warmup=800
        )
        x = np.asarray(res.samples).reshape(-1, 2)
        assert np.asarray(res.accept_prob).mean() > 0.5
        assert 0.5 < x[:, 0].var() < 2.0
        assert 40.0 < x[:, 1].var() < 220.0

    def test_chain_sharded_on_mesh(self):
        mesh = make_mesh(n_data=1, n_chain=8)

        def lp(theta):
            return -0.5 * jnp.sum(theta**2)

        init = jax.random.normal(jax.random.PRNGKey(0), (16, 3))
        res = hmc.sample(
            lp,
            init,
            jax.random.PRNGKey(1),
            num_samples=200,
            num_warmup=200,
            mesh=mesh,
        )
        assert res.samples.shape == (200, 16, 3)
        x = np.asarray(res.samples).reshape(-1, 3)
        assert np.allclose(x.mean(0), 0.0, atol=0.2)
        # chains actually sharded across the 8 devices
        assert len(res.samples.sharding.device_set) == 8


class TestModelLogProb:
    def test_map_linear_posterior(self):
        """HMC over the MAP linear model recovers the generating
        coefficients; theta round-trips through the tree."""
        X, Y = models.make_linear_dataset(n=300, a=1.0, b=2.0, noise=0.3)
        m = models.MAPLinearModel(seed=0, X=X, Y=Y)
        flp = logprob.make_log_prob(m, "logp")
        assert flp.dim == 3
        init = jnp.tile(flp.initial, (4, 1))
        res = hmc.sample(
            flp.log_prob,
            init,
            jax.random.PRNGKey(0),
            num_samples=400,
            num_warmup=400,
        )
        x = np.asarray(res.samples).reshape(-1, 3)
        names = flp.paths  # sorted: a, b, c
        a_idx, b_idx = names.index("a"), names.index("b")
        assert abs(x[:, a_idx].mean() - 1.0) < 0.1
        assert abs(x[:, b_idx].mean() - 2.0) < 0.1
        # write-back
        flp.set_model_state(jnp.asarray(x.mean(0)))
        assert abs(np.asarray(m.a.value).reshape(()).item() - 1.0) < 0.1

    def test_transform_jacobian_included(self):
        """A positive-transformed variance parameter sampled in free space:
        with the Jacobian the posterior matches the known conjugate result
        qualitatively (finite, positive, centered near truth)."""
        rng = np.random.default_rng(0)
        y = rng.normal(0, 2.0, size=500).astype(np.float32)

        class VarModel(hb.model.Model):
            def setUp(self):
                self.y = hb.Data(y[:, None])
                self.var = hb.Variable([1], transform=hb.transforms.positive, mean=1.0)

            @hb.AutoOptimize()
            def logp(self):
                return jnp.sum(hb.densities.gaussian(self.y, 0.0, self.var))

        m = VarModel(seed=0)
        flp = logprob.make_log_prob(m, "logp")
        init = jnp.tile(flp.initial, (4, 1))
        res = hmc.sample(
            flp.log_prob, init, jax.random.PRNGKey(0),
            num_samples=400, num_warmup=300,
        )
        free = np.asarray(res.samples).reshape(-1)
        sampled_var = np.logaddexp(0, free) + 1e-6
        assert abs(sampled_var.mean() - 4.0) < 0.6

    def test_collection_subset(self):
        X, Y = models.make_linear_dataset(n=50)
        m = hb.model.Model(seed=0)
        m.x = hb.Data(X)
        m.y = hb.Data(Y)
        m.a = hb.Variable([1], collections=["sample_me"])
        m.b = hb.Variable([1])

        def logp_method(self):
            return jnp.sum(
                hb.densities.gaussian(self.y, self.a + self.b * self.x, 0.1)
            )

        flp = logprob.make_log_prob(m, logp_method, collection="sample_me")
        assert flp.dim == 1
        v = float(flp.log_prob(flp.initial))
        assert np.isfinite(v)


class TestESS:
    def test_ess_iid_near_n(self):
        x = np.random.default_rng(0).normal(size=(500, 4, 2))
        ess = hmc.effective_sample_size(x)
        assert ess.shape == (2,)
        assert np.all(ess > 800)  # 2000 iid draws pooled

    def test_ess_correlated_much_smaller(self):
        rng = np.random.default_rng(0)
        n = 1000
        x = np.zeros((n, 1, 1))
        for i in range(1, n):
            x[i] = 0.95 * x[i - 1] + rng.normal() * 0.1
        ess = hmc.effective_sample_size(x)
        assert ess[0] < n / 5


class TestGPHyperparameterSampling:
    def test_nuts_over_gp_hyperparams(self):
        """BASELINE config 4, GP half: NUTS over (lengthscale, k_var, var) of
        the exact GP marginal recovers hyperparameters consistent with the
        generating process."""
        from henbun_tpu.inference import nuts

        X, Y = models.make_sine_dataset(n=40, noise=0.3)
        m = models.GPRMarginal(seed=0, X=X, Y=Y)
        flp = logprob.make_log_prob(m, "log_marginal")
        assert flp.dim == 3
        init = flp.initial + 0.1 * jax.random.normal(
            jax.random.PRNGKey(0), (4, flp.dim)
        )
        res = nuts.sample(
            flp.log_prob, init, jax.random.PRNGKey(1),
            num_samples=300, num_warmup=300,
        )
        x = np.asarray(res.samples).reshape(-1, flp.dim)
        assert np.isfinite(x).all()
        assert np.asarray(res.accept_prob).mean() > 0.5
        # posterior over noise var (positive transform = softplus of free)
        var_idx = flp.paths.index("var")
        noise_var = np.logaddexp(0, x[:, var_idx]) + 1e-6
        assert 0.03 < np.median(noise_var) < 0.3  # true 0.09
        ls_idx = flp.paths.index("kern.lengthscales")
        ls = np.logaddexp(0, x[:, ls_idx]) + 1e-6
        assert 0.3 < np.median(ls) < 3.0


class TestSamplePosteriorAPI:
    def test_one_call_api_with_transforms(self):
        """sample_posterior returns constrained-space samples keyed by path."""
        from henbun_tpu.inference import sample_posterior

        X, Y = models.make_sine_dataset(n=30)
        m = models.GPRMarginal(seed=0, X=X, Y=Y)
        res, post = sample_posterior(
            m, "log_marginal", num_chains=4, num_samples=200, num_warmup=200,
            sampler="chees",
        )
        assert set(post) == {"kern.lengthscales", "k_var", "var"}
        assert post["var"].shape == (200, 4, 1)
        # positive transform applied
        assert np.all(post["var"] > 0)
        assert 0.02 < np.median(post["var"]) < 0.5
        assert np.asarray(res.accept_prob).mean() > 0.4

    def test_bad_sampler_name(self):
        from henbun_tpu.inference import sample_posterior

        X, Y = models.make_linear_dataset(n=20)
        m = models.MAPLinearModel(seed=0, X=X, Y=Y)
        with pytest.raises(ValueError):
            sample_posterior(m, "logp", sampler="gibbs")


def _quantile_calibration(samples, ess):
    """Compare empirical quantiles of pooled samples against exact N(0,1)
    quantiles with ESS-aware tolerances (naive KS on autocorrelated MCMC
    output rejects spuriously). SE(q-th quantile) = sqrt(q(1-q)/ESS)/phi(z_q);
    require every deviation within 5 SE."""
    import scipy.stats as ss

    x = np.asarray(samples).reshape(-1)
    for q in [0.1, 0.25, 0.5, 0.75, 0.9]:
        zq = ss.norm.ppf(q)
        se = np.sqrt(q * (1 - q) / ess) / ss.norm.pdf(zq)
        dev = np.quantile(x, q) - zq
        assert abs(dev) < 5 * se, (q, dev, se)


class TestCalibration:
    def test_hmc_quantile_calibration_1d(self):
        def lp(t):
            return -0.5 * jnp.sum(t**2)

        init = jax.random.normal(jax.random.PRNGKey(0), (16, 1))
        res = hmc.sample(
            lp, init, jax.random.PRNGKey(1), num_samples=1500, num_warmup=500
        )
        ess = hmc.effective_sample_size(np.asarray(res.samples))[0]
        _quantile_calibration(res.samples, ess)

    def test_chees_quantile_calibration_1d(self):
        from henbun_tpu.inference import chees

        def lp(t):
            return -0.5 * jnp.sum(t**2)

        init = jax.random.normal(jax.random.PRNGKey(0), (16, 1))
        res = chees.sample(
            lp, init, jax.random.PRNGKey(1), num_samples=1500, num_warmup=500
        )
        ess = hmc.effective_sample_size(np.asarray(res.samples))[0]
        _quantile_calibration(res.samples, ess)

    def test_nuts_quantile_calibration_1d(self):
        from henbun_tpu.inference import nuts

        def lp(t):
            return -0.5 * jnp.sum(t**2)

        init = jax.random.normal(jax.random.PRNGKey(0), (16, 1))
        res = nuts.sample(
            lp, init, jax.random.PRNGKey(1), num_samples=1500, num_warmup=500
        )
        ess = hmc.effective_sample_size(np.asarray(res.samples))[0]
        _quantile_calibration(res.samples, ess)


class TestFullyBayesianGP:
    def test_hyper_marginalized_prediction(self):
        """Full Bayes composition: ChEES over the exact GP marginal's
        hyperparameters, then predict_f averaged over hyperparameter draws —
        the posterior-predictive mean tracks sin(x) and the predictive
        variance is wider than any single-hyper prediction's."""
        from henbun_tpu.inference import sample_posterior

        X, Y = models.make_sine_dataset(n=35, noise=0.3)
        m = models.GPRMarginal(seed=0, X=X, Y=Y)
        res, post = sample_posterior(
            m, "log_marginal", num_chains=4, num_samples=150, num_warmup=200,
            sampler="chees",
        )
        grid = np.linspace(0, 6, 40).reshape(-1, 1).astype(np.float32)
        # average the analytic conditional over 20 thinned hyper draws
        draws = {k: v.reshape(-1, v.shape[-1]) for k, v in post.items()}
        idx = np.linspace(0, len(draws["var"]) - 1, 20).astype(int)
        means, varis = [], []
        for i in idx:
            m.kern.lengthscales = draws["kern.lengthscales"][i].astype(np.float32)
            m.k_var = draws["k_var"][i].astype(np.float32)
            m.var = draws["var"][i].astype(np.float32)
            m.initialize()
            mean, var = m.run(lambda mm: mm.predict_f(grid))
            means.append(np.asarray(mean)[:, 0])
            varis.append(np.asarray(var)[:, 0])
        means, varis = np.stack(means), np.stack(varis)
        pred_mean = means.mean(0)
        # law of total variance: within-draw + between-draw
        pred_var = varis.mean(0) + means.var(0)
        rmse = np.sqrt(np.mean((pred_mean - np.sin(grid[:, 0])) ** 2))
        assert rmse < 0.3
        assert np.all(pred_var >= varis.mean(0) - 1e-9)
        assert np.isfinite(pred_var).all()
