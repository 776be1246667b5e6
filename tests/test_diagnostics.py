"""Diagnostics library tests against known-truth processes: iid Gaussian
(ESS ~ total draws, R-hat ~ 1), AR(1) with analytic autocorrelation time,
shifted chains (R-hat >> 1), and divergence counting. Also gates the
hmc_verb-driven report and the sample_posterior wiring."""
import numpy as np
import pytest

import henbun_tpu as hb
from henbun_tpu.inference import diagnostics as dg


def _iid(n=2000, c=4, d=3, seed=0):
    return np.random.default_rng(seed).normal(size=(n, c, d))


class TestESS:
    def test_iid_ess_near_total(self):
        x = _iid()
        total = x.shape[0] * x.shape[1]
        ess = dg.effective_sample_size(x)
        bulk = dg.ess_bulk(x)
        assert ess.shape == (3,)
        assert np.all(ess > 0.5 * total)
        assert np.all(bulk > 0.5 * total)
        # iid can't have MORE information than the draw count (within noise)
        assert np.all(bulk < 1.6 * total)

    def test_ar1_matches_analytic_tau(self):
        """AR(1) with coefficient rho has integrated autocorrelation time
        tau = (1+rho)/(1-rho); ESS should be ~ total/tau."""
        rho = 0.9
        n, c = 20000, 4
        rng = np.random.default_rng(1)
        eps = rng.normal(size=(n, c))
        x = np.zeros((n, c))
        for t in range(1, n):
            x[t] = rho * x[t - 1] + np.sqrt(1 - rho**2) * eps[t]
        tau = (1 + rho) / (1 - rho)  # = 19
        expected = n * c / tau
        got = dg.ess_bulk(x[:, :, None])[0]
        assert 0.6 * expected < got < 1.5 * expected
        got_pc = dg.effective_sample_size(x[:, :, None])[0]
        assert 0.6 * expected < got_pc < 1.5 * expected

    def test_fft_estimator_matches_direct_loop(self):
        """The vectorized estimator agrees with a direct O(n^2) per-chain
        Geyer computation (the pre-round-2 implementation)."""
        x = _iid(n=400, c=2, d=2, seed=3)
        n = x.shape[0]
        ref = np.zeros(2)
        for j in range(2):
            acc = 0.0
            for ci in range(2):
                y = x[:, ci, j] - x[:, ci, j].mean()
                acf = np.correlate(y, y, mode="full")[n - 1 :]
                acf = acf / acf[0]
                tau = 1.0
                for k in range(1, n - 2, 2):
                    pair = acf[k] + acf[k + 1]
                    if pair < 0:
                        break
                    tau += 2 * pair
                acc += n / max(tau, 1.0)
            ref[j] = acc
        got = dg.effective_sample_size(x)
        assert np.allclose(got, ref, rtol=1e-10)


class TestRhat:
    def test_converged_chains_near_one(self):
        r = dg.split_rhat(_iid())
        assert np.all(r < 1.01)

    def test_shifted_chain_flags(self):
        x = _iid()
        x[:, 0, :] += 5.0  # one chain stuck elsewhere
        r = dg.split_rhat(x)
        assert np.all(r > 1.5)

    def test_within_chain_drift_flags(self):
        """Split-chain R-hat catches a trend inside a single chain."""
        n, c = 1000, 4
        x = _iid(n, c, 1, seed=2)
        x[:, :, 0] += np.linspace(0, 6, n)[:, None]
        r = dg.split_rhat(x)
        assert r[0] > 1.2


class TestDivergences:
    def test_count_and_mask(self):
        a = np.ones((100, 8))
        a[3, 2] = 0.0
        a[7, 5] = 0.0
        a[9, 1] = 1e-9  # tiny but nonzero: NOT divergent
        assert dg.divergence_count(a) == 2
        assert dg.divergence_mask(a).sum() == 2

    def test_summarize_fields(self):
        x = _iid(n=200, c=4, d=2)
        a = np.ones((200, 4))
        a[0, 0] = 0.0
        s = dg.summarize(x, accept_prob=a)
        assert s["divergences"] == 1
        assert s["num_chains"] == 4
        assert s["rhat_max"] < 1.05
        assert s["ess_bulk_min"] > 100


class TestReportAndWiring:
    def test_report_gated_on_hmc_verb(self, capsys):
        s = dg.summarize(_iid(n=100, c=4, d=1))
        c = hb.settings.get_settings()
        c.verbosity.hmc_verb = 0
        with hb.settings.temp_settings(c):
            dg.report(s)
        assert capsys.readouterr().out == ""
        c.verbosity.hmc_verb = 1
        with hb.settings.temp_settings(c):
            dg.report(s)
        assert "ess_bulk" in capsys.readouterr().out

    def test_report_warnings_at_verb2(self, capsys):
        x = _iid(n=100, c=4, d=1)
        x[:, 0] += 9.0
        a = np.ones((100, 4))
        a[:10, 0] = 0.0
        s = dg.summarize(x, accept_prob=a)
        c = hb.settings.get_settings()
        c.verbosity.hmc_verb = 2
        with hb.settings.temp_settings(c):
            dg.report(s)
        out = capsys.readouterr().out
        assert "WARNING" in out and "divergence" in out

    def test_sample_posterior_returns_diagnostics(self, capsys):
        """End-to-end: sample a tiny Gaussian posterior on a known-correct
        target; the summary must show mixed chains (this is the validation
        VERDICT r1 #4 asks for: ESS/R-hat on a known Gaussian)."""
        import jax.numpy as jnp

        class G(hb.model.Model):
            def setUp(self):
                self.p = hb.Variable([2])

            def log_posterior(self):
                return -0.5 * jnp.sum(jnp.square(self.p))

        from henbun_tpu.inference import sample_posterior

        m = G(seed=0)
        c = hb.settings.get_settings()
        c.verbosity.hmc_verb = 1
        with hb.settings.temp_settings(c):
            res, post, summary = sample_posterior(
                m, "log_posterior", num_chains=8, num_samples=400,
                num_warmup=300, sampler="chees", return_diagnostics=True,
            )
        assert "ess_bulk" in capsys.readouterr().out
        assert summary["rhat_max"] < 1.05
        assert summary["ess_bulk_min"] > 200
        assert summary["divergences"] == 0
        x = post["p"].reshape(-1, 2)
        assert np.allclose(x.mean(0), 0.0, atol=0.1)
        assert np.allclose(x.std(0), 1.0, atol=0.1)
