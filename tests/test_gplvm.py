"""Amortized Bayesian GP-LVM (models/gplvm.py).

Gates: the model recovers the 1D generating coordinate of a smooth 3D curve
up to sign (|correlation| > 0.97), reconstructs the observations at the
noise floor, and the encoder generalizes to held-out rows (amortization —
no per-point parameters were ever stored).
"""
import numpy as np
import optax
import pytest

import henbun_tpu as hb
from henbun_tpu.models.gplvm import GPLVM, make_curve_dataset


@pytest.fixture(scope="module")
def fitted():
    hb.set_seed(0)
    Y, t_true = make_curve_dataset(n=1000, seed=0)
    m = GPLVM(seed=0, Y=Y, d_z=1, num_inducing=16, hidden=32)
    m.ELBO().compile(optax.adam(0.01)).optimize(
        maxiter=3000, minibatch_size=128
    )
    return m, Y, t_true


def test_recovers_latent_coordinate(fitted):
    m, Y, t_true = fitted
    lat = np.asarray(m.run(lambda mm: mm.latent_mean(Y)))[:, 0]
    corr = abs(np.corrcoef(lat, t_true)[0, 1])
    assert corr > 0.97, corr


def test_reconstruction_at_noise_floor(fitted):
    m, Y, t_true = fitted
    rec = np.asarray(m.draws(lambda mm: mm.reconstruct(Y), 64)).mean(0)
    rmse = np.sqrt(np.mean((rec - Y) ** 2))
    assert rmse < 0.09, rmse  # generating noise is 0.05


def test_encoder_generalizes_to_heldout_rows(fitted):
    """Amortization: fresh points on the same curve embed consistently —
    the recognition network is a function, not a lookup table."""
    m, Y, t_true = fitted
    rng = np.random.default_rng(99)
    t_new = np.sort(rng.uniform(-1.8, 1.8, size=200)).astype(np.float32)
    Y_new = np.stack(
        [np.sin(t_new), np.cos(t_new), 0.5 * t_new], axis=1
    ).astype(np.float32)
    lat = np.asarray(m.run(lambda mm: mm.latent_mean(Y_new)))[:, 0]
    corr = abs(np.corrcoef(lat, t_new)[0, 1])
    assert corr > 0.97, corr
    # and the embedding is monotone along the curve (no fold)
    sign = np.sign(np.corrcoef(lat, t_new)[0, 1])
    frac_monotone = np.mean(np.sign(np.diff(lat)) == sign)
    assert frac_monotone > 0.85, frac_monotone


def test_packed_correlated_locals_train():
    """q_local='fullrank_packed' (correlated latent posteriors) goes through
    the shared slab conditioning (models/_slab.py) and still recovers the
    coordinate at d_z=2 — where off-diagonal posterior structure exists."""
    hb.set_seed(3)
    Y, t_true = make_curve_dataset(n=600, seed=3)
    m = GPLVM(seed=3, Y=Y, d_z=2, num_inducing=16, hidden=32,
              q_local="fullrank_packed")
    m.ELBO().compile(optax.adam(0.01)).optimize(
        maxiter=3000, minibatch_size=128
    )
    lat = np.asarray(m.run(lambda mm: mm.latent_mean(Y)))  # [n, 2]
    # the curve is 1D: SOME direction of the learned 2D latent must carry it
    corr = max(
        abs(np.corrcoef(lat[:, j], t_true)[0, 1]) for j in range(2)
    )
    assert corr > 0.9, corr
    rec = np.asarray(m.draws(lambda mm: mm.reconstruct(Y), 32)).mean(0)
    assert np.sqrt(np.mean((rec - Y) ** 2)) < 0.12
