"""Bayesian hyperparameters over the PROJECTED (inducing-point) evidences
(VERDICT r4 #6).

Dense `GPC`/robust-GPR already sample p(theta | y) ~ exp(evidence) p(theta)
with ChEES (tests/test_laplace.py); these gates cover the sparse families'
first-class `log_posterior` targets, where every chain's gradient flows
through the rectangular IFT mode under vmap. Gold standard: a 2x-longer
independent chain on the same target — short-run posterior moments must
match it within MC error, chains must mix, and the mass must cover the
ML-II point estimate. Matching reference device: hyperparameters as
Variationals, `/root/reference/Henbun/gp/kernels.py:43-51`.
"""
import numpy as np
import optax
import pytest

import jax

import henbun_tpu as hb
from henbun_tpu import models
from henbun_tpu.inference import sample_posterior


def _cls_data(n=400, seed=0):
    rng = np.random.default_rng(seed)
    X = np.sort(rng.uniform(0, 6, (n, 1))).astype(np.float32)
    p_true = 1.0 / (1.0 + np.exp(-3.0 * np.sin(X)))
    Y = (rng.uniform(size=X.shape) < p_true).astype(np.float32)
    return X, Y


class TestSparseGPCBayesHypers:
    def test_chees_posterior_gated_vs_long_chain(self):
        X, Y = _cls_data(n=400, seed=0)

        # ML-II point estimate on the same target
        hb.set_seed(0)
        m_ml = models.SparseGPC(seed=0, X=X, Y=Y, num_inducing=12)
        o = m_ml.log_posterior().compile(optax.adam(0.03))
        o.optimize(maxiter=400)
        ml = {
            "k_var": float(np.asarray(m_ml.k_var.value)[0]),
            "ls": float(np.asarray(m_ml.gp.kern.lengthscales.value)[0]),
        }

        def run(seed, num):
            m = models.SparseGPC(seed=seed, X=X, Y=Y, num_inducing=12)
            res, post, diag = sample_posterior(
                m, "log_posterior", num_chains=8, num_samples=num,
                num_warmup=num, sampler="chees", return_diagnostics=True,
                key=jax.random.PRNGKey(seed),
            )
            return post, diag

        post, diag = run(1, 200)
        gold, gdiag = run(2, 400)
        assert diag["rhat_max"] < 1.1 and gdiag["rhat_max"] < 1.1

        for path, mlv in (("k_var", ml["k_var"]),
                          ("gp.kern.lengthscales", ml["ls"])):
            d = np.log(np.asarray(post[path]).reshape(-1))
            g = np.log(np.asarray(gold[path]).reshape(-1))
            # moments agree with the long chain within MC error
            assert abs(d.mean() - g.mean()) < 0.35 * max(g.std(), 0.1), path
            assert 0.5 < d.std() / g.std() < 2.0, path
            # and the posterior mass covers the ML-II point
            lo, hi = np.quantile(d, [0.02, 0.98])
            assert lo <= np.log(mlv) <= hi, (path, mlv)


class TestSparseGPRobustBayesHypers:
    def test_chees_runs_and_covers_ml(self):
        rng = np.random.default_rng(3)
        X = np.sort(rng.uniform(0, 6, (400, 1))).astype(np.float32)
        Y = np.sin(X) + 0.15 * rng.standard_normal(X.shape).astype(np.float32)
        Y[::29] += 3.0  # outliers

        hb.set_seed(0)
        m_ml = models.SparseGPRobust(seed=0, X=X, Y=Y, num_inducing=12)
        o = m_ml.log_posterior().compile(optax.adam(0.03))
        o.optimize(maxiter=400)
        ml_kv = float(np.asarray(m_ml.k_var.value)[0])
        ml_var = float(np.asarray(m_ml.var.value)[0])

        m = models.SparseGPRobust(seed=1, X=X, Y=Y, num_inducing=12)
        res, post, diag = sample_posterior(
            m, "log_posterior", num_chains=8, num_samples=250,
            num_warmup=250, sampler="chees", return_diagnostics=True,
            key=jax.random.PRNGKey(4),
        )
        assert diag["rhat_max"] < 1.15
        for path, mlv in (("k_var", ml_kv), ("var", ml_var)):
            d = np.asarray(post[path]).reshape(-1)
            assert np.isfinite(d).all()
            lo, hi = np.quantile(d, [0.02, 0.98])
            assert lo <= mlv <= hi, (path, mlv, lo, hi)
