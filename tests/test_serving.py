"""Serving / AOT export (henbun_tpu/serving.py).

Contract: an exported artifact is (1) numerically identical to the in-process
model call, (2) self-contained — callable from the serialized bytes alone
after the model object is gone, (3) optionally batch-size polymorphic so one
artifact serves any request size. The reference has no serving path
(prediction is session.run in the training process, Henbun/model.py:84-96).
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import henbun_tpu as hb
from henbun_tpu import serving
from henbun_tpu.models import GPR, GPRMarginal, make_sine_dataset


@pytest.fixture(scope="module")
def fitted_marginal():
    hb.set_seed(0)
    X, Y = make_sine_dataset(n=30)
    m = GPRMarginal(X=X, Y=Y)
    m.log_marginal().compile(optax.adam(0.05)).optimize(maxiter=300)
    return m


def test_predictor_roundtrip_matches_model(fitted_marginal, tmp_path):
    m = fitted_marginal
    grid = np.linspace(-1.0, 7.0, 50).reshape(-1, 1).astype(np.float32)
    mean0, var0 = m.run(lambda mm: mm.predict_f(grid))

    art = serving.export_predictor(m, GPRMarginal.predict_f, grid)
    mean1, var1 = art(jnp.asarray(grid))
    np.testing.assert_allclose(mean0, mean1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(var0, var1, rtol=1e-5, atol=1e-6)

    # disk roundtrip: bytes -> file -> fresh artifact, same numbers
    p = tmp_path / "gpr_predictor.hlo"
    art.save(p)
    art2 = serving.load(p)
    mean2, var2 = art2(jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(mean1), np.asarray(mean2))
    np.testing.assert_allclose(np.asarray(var1), np.asarray(var2))
    assert "cpu" in art2.platforms


def test_artifact_is_self_contained(fitted_marginal):
    grid = np.linspace(0.0, 6.0, 20).reshape(-1, 1).astype(np.float32)
    blob = serving.export_predictor(
        fitted_marginal, "predict_f", grid
    ).serialize()
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 0
    # deserialize into a world with no model object at all
    art = serving.deserialize(bytes(blob))
    mean, var = art(jnp.asarray(grid))
    assert mean.shape == (20, 1) and var.shape == (20, 1)
    assert np.isfinite(np.asarray(mean)).all()
    assert (np.asarray(var) >= 0).all()


def test_batch_polymorphic_serves_any_size(fitted_marginal):
    grid8 = np.linspace(0, 6, 8).reshape(-1, 1).astype(np.float32)
    art = serving.export_predictor(
        fitted_marginal, GPRMarginal.predict_f, grid8, batch_polymorphic=True
    )
    for n in (3, 8, 57):
        g = np.linspace(0, 6, n).reshape(-1, 1).astype(np.float32)
        mean, var = art(jnp.asarray(g))
        assert mean.shape == (n, 1)
        ref_mean, _ = fitted_marginal.run(lambda mm: mm.predict_f(g))
        np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean),
                                   rtol=1e-5, atol=1e-6)


def test_batch_polymorphic_multiple_array_args(fitted_marginal):
    """Every array argument must share ONE symbolic batch dim: per-argument
    symbol creation makes distinct SymbolicScopes and jax.export rejects the
    export outright ('Invalid mixing of symbolic scopes')."""

    def weighted_mean(mm, x_new, w):
        mean, _ = mm.predict_f(x_new)
        return mean * w

    grid8 = np.linspace(0, 6, 8).reshape(-1, 1).astype(np.float32)
    w8 = np.full((8, 1), 2.0, np.float32)
    art = serving.export_predictor(
        fitted_marginal, weighted_mean, grid8, w8, batch_polymorphic=True
    )
    for n in (5, 8, 21):
        g = np.linspace(0, 6, n).reshape(-1, 1).astype(np.float32)
        w = np.full((n, 1), 2.0, np.float32)
        out = art(jnp.asarray(g), jnp.asarray(w))
        assert out.shape == (n, 1)
        ref = 2.0 * np.asarray(
            fitted_marginal.run(lambda mm: mm.predict_f(g))[0]
        )
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-5)


def test_sampler_export_reproducible_draws():
    hb.set_seed(1)
    X, Y = make_sine_dataset(n=20)
    m = GPR(X=X, Y=Y, q_shape="diagonal")
    m.ELBO_gaussian().compile(optax.adam(0.05)).optimize(maxiter=200)

    grid = np.linspace(0, 6, 15).reshape(-1, 1).astype(np.float32)
    art = serving.export_sampler(m, GPR.predict_f, 16, grid)
    s0 = np.asarray(art(np.uint32(7), jnp.asarray(grid)))
    s1 = np.asarray(art(np.uint32(7), jnp.asarray(grid)))
    s2 = np.asarray(art(np.uint32(8), jnp.asarray(grid)))
    assert s0.shape == (16, 15, 1)
    np.testing.assert_array_equal(s0, s1)  # same seed, same draws
    assert np.abs(s0 - s2).max() > 1e-6    # fresh seed, fresh noise
    # draws spread around a sane posterior: band contains the truth
    mean = s0.mean(axis=0)[:, 0]
    assert np.abs(mean - np.sin(grid[:, 0])).max() < 1.0


def test_exported_constants_are_frozen(fitted_marginal):
    """Mutating the model after export must not change the artifact."""
    m = fitted_marginal
    grid = np.linspace(0, 6, 10).reshape(-1, 1).astype(np.float32)
    art = serving.export_predictor(m, "predict_f", grid)
    before = np.asarray(art(jnp.asarray(grid))[0])
    old = np.asarray(m.k_var.value)
    try:
        m.k_var = old * 5.0
        live_mean = np.asarray(m.run(lambda mm: mm.predict_f(grid))[0])
        frozen_mean = np.asarray(art(jnp.asarray(grid))[0])
        np.testing.assert_array_equal(before, frozen_mean)
        assert np.abs(live_mean - frozen_mean).max() > 0  # the live model moved
    finally:
        m.k_var = old


def test_export_svgp_marginal_predictor():
    """Inducing-point models export too: MinibatchData rows freeze into the
    artifact as constants and the deterministic marginal predictor serves
    new inputs."""
    from henbun_tpu.models import SVGPRegression

    hb.set_seed(11)
    rng = np.random.default_rng(11)
    X = np.sort(rng.uniform(0, 6, size=(512, 1))).astype(np.float32)
    Y = (np.sin(X) + rng.normal(size=X.shape) * 0.2).astype(np.float32)
    m = SVGPRegression(seed=11, X=X, Y=Y, num_inducing=16)
    m.ELBO_analytic().compile(optax.adam(0.02)).optimize(
        maxiter=800, minibatch_size=128
    )
    grid = np.linspace(0.3, 5.7, 25).reshape(-1, 1).astype(np.float32)
    want_mean, want_var = m.run(lambda mm: mm.predict_f_marginals(grid))

    art = serving.export_predictor(
        m, "predict_f_marginals", grid, batch_polymorphic=True
    )
    got_mean, got_var = art(jnp.asarray(grid))
    # symbolic-shape lowering fuses/orders the solves differently from the
    # static program — measured drift 2e-4 relative, not a bug
    np.testing.assert_allclose(np.asarray(got_mean), np.asarray(want_mean),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_var), np.asarray(want_var),
                               rtol=1e-3, atol=1e-5)
    # polymorphic: a different request size from the same artifact
    g2 = np.linspace(1, 5, 7).reshape(-1, 1).astype(np.float32)
    mean2, _ = art(jnp.asarray(g2))
    assert mean2.shape == (7, 1)


def test_export_sparse_laplace_classifier():
    """The deterministic sparse engines compose with serving: the whole
    Newton-mode pipeline (lax.scan ladder + m x m algebra) lowers into one
    self-contained artifact serving p(y=1 | x*) at any batch size."""
    from henbun_tpu.models import SparseGPC

    hb.set_seed(3)
    rng = np.random.default_rng(3)
    X = np.sort(rng.uniform(0, 6, (2000, 1))).astype(np.float32)
    p_true = 1.0 / (1.0 + np.exp(-3.0 * np.sin(X)))
    Y = (rng.uniform(size=X.shape) < p_true).astype(np.float32)
    m = SparseGPC(seed=3, X=X, Y=Y, num_inducing=32)
    m.log_marginal_laplace().compile(optax.adam(0.05)).optimize(maxiter=80)

    grid = np.linspace(0.2, 5.8, 30).reshape(-1, 1).astype(np.float32)
    want = np.asarray(m.run(lambda mm: mm.predict_p(grid)))
    art = serving.export_predictor(
        m, "predict_p", grid, batch_polymorphic=True
    )
    got = np.asarray(art(jnp.asarray(grid)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
    # polymorphic: another request size from the same artifact
    g2 = np.linspace(1, 5, 11).reshape(-1, 1).astype(np.float32)
    p2 = np.asarray(art(jnp.asarray(g2)))
    assert p2.shape == (11, 1) and ((p2 > 0) & (p2 < 1)).all()
