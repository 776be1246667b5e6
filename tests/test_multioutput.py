"""Multi-output (LMC) GPR (models/multioutput.py).

Gates: (1) closed-form expected log-likelihood vs the MC estimator's mean;
(2) end-to-end recovery of three correlated outputs from two latent GPs —
per-output RMSE at new inputs and the model-implied output correlation
matching the generating mixing matrix's signs; (3) shared-kernel and
per-latent-kernel (ParamList) variants both train; (4) Q < P compression
works (2 latents explaining 3 outputs).
"""
import numpy as np
import jax.numpy as jnp
import optax
import pytest

import henbun_tpu as hb
from henbun_tpu.models.multioutput import (
    MultiOutputGPR,
    MultiOutputSVGP,
    make_multioutput_dataset,
)

W_TRUE = np.array([[1.0, 0.0], [0.8, 0.6], [-0.9, 0.4]], np.float32)


@pytest.fixture(scope="module")
def fitted():
    hb.set_seed(0)
    X, Y, F = make_multioutput_dataset(n=80, seed=0)
    m = MultiOutputGPR(seed=0, X=X, Y=Y, Q=2)
    m.ELBO_analytic().compile(optax.adam(0.02)).optimize(maxiter=4000)
    return m, X, Y, F


def test_analytic_ell_matches_mc_mean():
    hb.set_seed(5)
    X, Y, _ = make_multioutput_dataset(n=30, seed=5)
    m = MultiOutputGPR(seed=5, X=X, Y=Y, Q=2, analytic_kl=True)
    det = float(m.run(lambda mm: MultiOutputGPR.ELBO_analytic.__wrapped__(mm)))
    mc = np.asarray(
        m.draws(lambda mm: MultiOutputGPR.ELBO_mc.__wrapped__(mm), 3000)
    )
    se = mc.std() / np.sqrt(len(mc))
    assert abs(mc.mean() - det) < 5 * se + 0.02 * abs(det), (mc.mean(), det)


def test_recovers_all_outputs(fitted):
    m, X, Y, F = fitted
    grid = np.linspace(0.2, 5.8, 40).reshape(-1, 1).astype(np.float32)
    mean, var = m.run(lambda mm: mm.predict_y(grid))
    mean = np.asarray(mean)
    truth = np.concatenate([np.sin(grid), np.cos(grid)], 1) @ W_TRUE.T
    for p in range(3):
        rmse = np.sqrt(np.mean((mean[:, p] - truth[:, p]) ** 2))
        assert rmse < 0.2, (p, rmse)
    assert (np.asarray(var) > 0).all()


def test_output_correlations_match_generator(fitted):
    m, X, Y, F = fitted
    C = np.asarray(m.run(lambda mm: mm.output_correlation()))
    B = W_TRUE @ W_TRUE.T
    d = np.sqrt(np.diag(B))
    C_true = B / np.outer(d, d)
    # sign and rough magnitude of every cross-output correlation
    for i in range(3):
        for j in range(i):
            assert np.sign(C[i, j]) == np.sign(C_true[i, j]), (i, j, C)
            assert abs(C[i, j] - C_true[i, j]) < 0.35, (i, j, C, C_true)


def test_per_latent_kernels_train():
    hb.set_seed(2)
    X, Y, _ = make_multioutput_dataset(n=50, seed=2)
    m = MultiOutputGPR(seed=2, X=X, Y=Y, Q=2, shared_kernel=False)
    opt = m.ELBO_analytic()
    opt.compile(optax.adam(0.02))
    before = float(opt.run())
    opt.optimize(maxiter=1200)
    after = float(opt.run())
    assert after > before + 20.0, (before, after)
    # the two latent kernels trained independently
    l0 = float(np.asarray(m.kern[0].lengthscales.value).ravel()[0])
    l1 = float(np.asarray(m.kern[1].lengthscales.value).ravel()[0])
    assert np.isfinite([l0, l1]).all()


def test_diagonal_q_variant():
    hb.set_seed(4)
    X, Y, _ = make_multioutput_dataset(n=40, seed=4)
    m = MultiOutputGPR(seed=4, X=X, Y=Y, Q=2, q_shape="diagonal")
    opt = m.ELBO_analytic()
    opt.compile(optax.adam(0.03))
    opt.optimize(maxiter=1500)
    grid = np.linspace(1, 5, 10).reshape(-1, 1).astype(np.float32)
    mean, var = m.run(lambda mm: mm.predict_f(grid))
    truth = np.concatenate([np.sin(grid), np.cos(grid)], 1) @ W_TRUE.T
    assert np.sqrt(np.mean((np.asarray(mean) - truth) ** 2)) < 0.3


def test_natgrad_trains_layered_node():
    """natural_gradient's pair step vmaps over the layered n_layers=[Q]
    latent axis; at moderate gamma it clearly beats Adam at equal steps
    (the deterministic LMC ELBO is non-conjugate per latent, so unit gamma
    is NOT expected to win — docstring rule)."""
    from henbun_tpu import optimizers as hopt
    import optax as _optax

    # the measured reference config (models/multioutput.py docstring):
    # n=80 seed=0, 800 steps -> natgrad(0.3) ~ -44 vs Adam(0.02) ~ -89.
    # (The margin is config-sensitive: at n=60/seed=6/600 steps Adam is
    # slightly ahead — natgrad's win here is about escaping the mixing-
    # coupled covariance plateau, which this config exhibits.)
    hb.set_seed(0)
    X, Y, _ = make_multioutput_dataset(n=80, seed=0)

    m_ng = MultiOutputGPR(seed=0, X=X, Y=Y, Q=2)
    opt_ng = m_ng.ELBO_analytic()
    opt_ng.compile(hopt.natural_gradient(m_ng, gamma=0.3,
                                         rest=_optax.adam(0.02)))
    opt_ng.optimize(maxiter=800)

    m_ad = MultiOutputGPR(seed=0, X=X, Y=Y, Q=2)
    opt_ad = m_ad.ELBO_analytic()
    opt_ad.compile(_optax.adam(0.02))
    opt_ad.optimize(maxiter=800)

    ng, ad = float(opt_ng.run()), float(opt_ad.run())
    assert np.isfinite(ng) and np.isfinite(ad)
    assert ng > ad + 20.0, (ng, ad)


class TestMultiOutputSVGP:
    """Sparse LMC (VERDICT r3 #4): minibatch SVI at n=1e5, one shared gram,
    latents on the layered axis. The correlation gate uses the
    FUNCTION-SPACE output_correlation — at finite m the amplitude split
    between A and q(u) drifts, so prior-level A A^T is not the right
    summary (see the method docstring for the measured numbers)."""

    @pytest.fixture(scope="class")
    def fitted_sparse(self):
        hb.set_seed(0)
        X, Y, F = make_multioutput_dataset(n=100_000, seed=0)
        m = MultiOutputSVGP(seed=0, X=X, Y=Y, Q=2, num_inducing=32)
        m.ELBO_analytic().compile(optax.adam(0.02)).optimize(
            maxiter=4000, minibatch_size=512
        )
        return m

    def test_recovers_all_outputs_at_1e5(self, fitted_sparse):
        m = fitted_sparse
        grid = np.linspace(0.1, 5.9, 60, dtype=np.float32)[:, None]
        mean, var = m.run(lambda mm: mm.predict_f(grid))
        U = np.concatenate([np.sin(grid), np.cos(grid)], axis=1)
        W = np.array([[1.0, 0.0], [0.8, 0.6], [-0.9, 0.4]], np.float32)
        Ftrue = U @ W.T
        for p in range(3):
            rmse = float(np.sqrt(np.mean(
                (np.asarray(mean)[:, p] - Ftrue[:, p]) ** 2
            )))
            assert rmse < 0.05, (p, rmse)
        assert (np.asarray(var) > 0).all()
        # per-output noise recovered (true vars 0.01, 0.04, 0.01)
        nv = np.asarray(m.var.value)
        assert np.allclose(nv, [0.01, 0.04, 0.01], rtol=0.5)

    def test_function_space_output_correlation(self, fitted_sparse):
        m = fitted_sparse
        grid = np.linspace(0.1, 5.9, 400, dtype=np.float32)[:, None]
        C = np.asarray(m.run(lambda mm: mm.output_correlation(grid)))
        U = np.concatenate([np.sin(grid), np.cos(grid)], axis=1)
        W = np.array([[1.0, 0.0], [0.8, 0.6], [-0.9, 0.4]], np.float32)
        Ft = U @ W.T
        M = Ft - Ft.mean(0)
        Ct = (M.T @ M) / len(M)
        d = np.sqrt(np.diag(Ct))
        Ct = Ct / np.outer(d, d)
        assert np.abs(C - Ct).max() < 0.05, C

    def test_mc_objective_trains_too(self):
        hb.set_seed(2)
        X, Y, _ = make_multioutput_dataset(n=5000, seed=2)
        m = MultiOutputSVGP(seed=2, X=X, Y=Y, Q=2, num_inducing=16)
        opt = m.ELBO_mc().compile(optax.adam(0.01))
        before = float(opt.run())
        opt.optimize(maxiter=1500, minibatch_size=256)
        after = float(opt.run())
        assert np.isfinite(after) and after > before
