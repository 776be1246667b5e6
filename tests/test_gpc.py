"""Laplace GP binary classification (models/gpc.py).

Oracle: the whitened Newton iteration re-implemented in plain numpy (the
Bernoulli-sigmoid likelihood is log-concave, so undamped Newton converges
and there is a single well-defined mode to agree on). Plus behavioral
gates: evidence training, calibrated probabilities, decision accuracy.
"""
import numpy as np
import jax
import optax
import pytest

import henbun_tpu as hb
from henbun_tpu import models


def _data(n=60, seed=0):
    rng = np.random.default_rng(seed)
    X = np.sort(rng.uniform(-3, 3, n)).astype(np.float32)[:, None]
    p_true = 1.0 / (1.0 + np.exp(-3.0 * np.sin(X)))
    Y = (rng.uniform(size=X.shape) < p_true).astype(np.float32)
    return X, Y, p_true


def _numpy_whitened_mode(Lk, y, iters=50):
    """Undamped whitened Newton for the Bernoulli-sigmoid likelihood."""
    n = Lk.shape[0]
    v = np.zeros((n, 1))
    for _ in range(iters):
        f = Lk @ v
        p = 1.0 / (1.0 + np.exp(-f))
        g = y - p  # d loglik / df
        W = (p * (1.0 - p))[:, 0]  # -d2 loglik / df2 (>= 0: log-concave)
        B = np.eye(n) + Lk.T @ (W[:, None] * Lk)
        grad_psi = Lk.T @ g - v
        v = v + np.linalg.solve(B, grad_psi)
    return v


def test_mode_matches_numpy_newton_oracle():
    X, Y, _ = _data(n=40, seed=1)
    m = models.GPC(seed=0, X=X, Y=Y)
    res = m.run(lambda mm: mm.laplace())
    # rebuild the same Lk the model used (current hypers, same jitter path)
    Lk = np.asarray(m.run(lambda mm: mm._Lk()))
    v_ref = _numpy_whitened_mode(Lk.astype(np.float64), Y.astype(np.float64))
    assert float(res.grad_norm) < 1e-3
    assert np.allclose(np.asarray(res.v_mode), v_ref, atol=1e-3)


def test_evidence_training_and_prediction():
    X, Y, p_true = _data(n=60, seed=0)
    m = models.GPC(seed=0, X=X, Y=Y)
    opt = m.log_marginal_laplace()
    opt.compile(optax.adam(0.05))
    e0 = float(opt.run())
    opt.optimize(maxiter=500)
    e1 = float(opt.run())
    assert np.isfinite(e1) and e1 > e0
    grid = np.linspace(-3, 3, 50, dtype=np.float32)[:, None]
    p = np.asarray(m.run(lambda mm: mm.predict_p(grid)))
    assert p.shape == (50, 1)
    assert (p > 0).all() and (p < 1).all()
    pt = 1.0 / (1.0 + np.exp(-3.0 * np.sin(grid[:, 0])))
    # probabilities track the generator and decisions agree away from the
    # boundary region
    assert np.abs(p[:, 0] - pt).mean() < 0.15
    sure = np.abs(pt - 0.5) > 0.15
    assert (((p[:, 0] > 0.5) == (pt > 0.5))[sure]).mean() > 0.9


def test_uncertainty_grows_off_data():
    X, Y, _ = _data(n=40, seed=2)
    m = models.GPC(seed=0, X=X, Y=Y)
    opt = m.log_marginal_laplace()
    opt.compile(optax.adam(0.05))
    opt.optimize(maxiter=300)
    # far from the data the predictive probability shrinks toward the prior
    # mean (0.5) — the latent variance dominates the quadrature
    p_far = float(np.asarray(m.run(lambda mm: mm.predict_p(
        np.asarray([[30.0]], np.float32))))[0, 0])
    assert abs(p_far - 0.5) < 0.1


class TestSparseGPC:
    """Inducing-point Laplace (VERDICT r3 #1): the deterministic engine at
    SVGP scale. Gates: exactness at z = X, large-n training with accuracy
    against the exact-gram GPC oracle on a subsample AND against the
    quadrature-VI fit on the same data."""

    def test_z_eq_x_matches_dense_gpc(self):
        from henbun_tpu.inference.laplace import laplace_whitened

        X, Y, _ = _data(n=50, seed=0)
        hb.set_seed(0)
        dense = models.GPC(seed=0, X=X, Y=Y)
        dense.initialize()
        sp = models.SparseGPC(seed=0, X=X, Y=Y, num_inducing=len(X))
        sp.gp.z = X.copy()
        sp.k_var = np.asarray(dense.k_var.value)
        sp.gp.kern.lengthscales = np.asarray(dense.kern.lengthscales.value)
        sp.initialize()

        e_d = float(dense.run(
            lambda m: laplace_whitened(m._loglik(), m._Lk()).log_marginal
        ))
        e_s = float(sp.run(
            lambda m: laplace_whitened(m._loglik(), m._A(m.x)).log_marginal
        ))
        assert abs(e_d - e_s) < 1e-3 * abs(e_d)

        grid = np.linspace(-3, 3, 25, dtype=np.float32)[:, None]
        p_d = np.asarray(dense.run(lambda m: m.predict_p(grid)))
        p_s = np.asarray(sp.run(lambda m: m.predict_p(grid)))
        assert np.abs(p_d - p_s).max() < 1e-3

    def test_large_n_training_gated_against_oracles(self):
        rng = np.random.default_rng(1)
        n = 20000
        X = np.sort(rng.uniform(0, 6, (n, 1))).astype(np.float32)
        p_true = 1.0 / (1.0 + np.exp(-3.0 * np.sin(X)))
        Y = (rng.uniform(size=X.shape) < p_true).astype(np.float32)
        grid = np.linspace(0.1, 5.9, 40, dtype=np.float32)[:, None]
        truth = 1.0 / (1.0 + np.exp(-3.0 * np.sin(grid[:, 0])))

        hb.set_seed(0)
        m = models.SparseGPC(seed=0, X=X, Y=Y, num_inducing=64)
        opt = m.log_marginal_laplace().compile(optax.adam(0.05))
        e0 = float(opt.run())
        opt.optimize(maxiter=120)
        e1 = float(opt.run())
        assert np.isfinite(e1) and e1 > e0
        p = np.asarray(m.run(lambda mm: mm.predict_p(grid)))[:, 0]
        assert np.abs(p - truth).mean() < 0.03

        # exact-gram GPC oracle on a subsample: same generator, the two
        # deterministic engines must tell the same story
        idx = rng.choice(n, 1200, replace=False)
        oracle = models.GPC(seed=0, X=X[idx], Y=Y[idx])
        oopt = oracle.log_marginal_laplace().compile(optax.adam(0.05))
        oopt.optimize(maxiter=120)
        p_o = np.asarray(oracle.run(lambda mm: mm.predict_p(grid)))[:, 0]
        assert np.abs(p - p_o).mean() < 0.05

        # quadrature-VI fit on the SAME data (the other deterministic
        # large-n path) must agree too
        v = models.SVGPClassification(seed=0, X=X, Y=Y, num_inducing=64)
        vopt = v.ELBO_quadrature().compile(optax.adam(0.02))
        vopt.optimize(maxiter=2500, minibatch_size=256)
        p_v = np.asarray(v.run(lambda mm: mm.predict_p_mean(grid)))[:, 0]
        assert np.abs(p - p_v).mean() < 0.05
