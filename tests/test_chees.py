"""ChEES-HMC tests: moment recovery, trajectory adaptation behavior, ESS
efficiency vs fixed-length HMC, and chain sharding."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from henbun_tpu.inference import chees, hmc
from henbun_tpu.parallel import make_mesh


def test_recovers_correlated_gaussian():
    cov = np.array([[1.0, 0.7], [0.7, 2.0]])
    prec = np.linalg.inv(cov)

    def lp(t):
        return -0.5 * t @ jnp.asarray(prec, jnp.float32) @ t

    init = jax.random.normal(jax.random.PRNGKey(0), (16, 2))
    res = chees.sample(
        lp, init, jax.random.PRNGKey(1), num_samples=500, num_warmup=500
    )
    x = np.asarray(res.samples).reshape(-1, 2)
    assert np.allclose(x.mean(0), 0.0, atol=0.12)
    assert np.allclose(np.cov(x.T), cov, atol=0.3)
    assert 0.5 < np.asarray(res.accept_prob).mean() < 0.95


def test_trajectory_adapts_to_scale():
    """A widely scaled Gaussian needs a longer trajectory than a tight one
    (with mass adaptation off so T must do the work)."""

    def lp_tight(t):
        return -0.5 * jnp.sum(t**2) * 100.0  # std 0.1

    def lp_wide(t):
        return -0.5 * jnp.sum(t**2) / 100.0  # std 10

    k = jax.random.PRNGKey(0)
    r_tight = chees.sample(
        lp_tight, 0.1 * jax.random.normal(k, (8, 2)), jax.random.PRNGKey(1),
        num_samples=50, num_warmup=600, adapt_mass=False,
    )
    r_wide = chees.sample(
        lp_wide, 10.0 * jax.random.normal(k, (8, 2)), jax.random.PRNGKey(1),
        num_samples=50, num_warmup=600, adapt_mass=False,
    )
    assert float(r_wide.trajectory_length) > 5 * float(r_tight.trajectory_length)


def test_ess_beats_short_fixed_hmc():
    """On a correlated target, adapted-T ChEES beats HMC with a deliberately
    short fixed trajectory, per draw."""
    cov = np.diag([1.0, 25.0])
    prec = np.linalg.inv(cov)

    def lp(t):
        return -0.5 * t @ jnp.asarray(prec, jnp.float32) @ t

    init = jax.random.normal(jax.random.PRNGKey(0), (8, 2)) * jnp.asarray([1.0, 5.0])
    r_chees = chees.sample(
        lp, init, jax.random.PRNGKey(1), num_samples=400, num_warmup=500,
        adapt_mass=False,
    )
    r_hmc = hmc.sample(
        lp, init, jax.random.PRNGKey(1), num_samples=400, num_warmup=500,
        num_leapfrog=2, adapt_mass=False,
    )
    ess_c = hmc.effective_sample_size(np.asarray(r_chees.samples)).min()
    ess_h = hmc.effective_sample_size(np.asarray(r_hmc.samples)).min()
    assert ess_c > 1.5 * ess_h


def test_chain_sharded():
    mesh = make_mesh(n_data=1, n_chain=8)

    def lp(t):
        return -0.5 * jnp.sum(t**2)

    init = jax.random.normal(jax.random.PRNGKey(0), (16, 3))
    res = chees.sample(
        lp, init, jax.random.PRNGKey(1), num_samples=100, num_warmup=100,
        mesh=mesh,
    )
    assert len(res.samples.sharding.device_set) == 8
    assert np.isfinite(np.asarray(res.samples)).all()


def test_requires_two_chains():
    with pytest.raises(ValueError):
        chees.sample(
            lambda t: -jnp.sum(t**2), jnp.zeros((1, 2)), jax.random.PRNGKey(0)
        )


def test_trajectory_stays_finite_on_bnn_posterior():
    """Regression: divergent early proposals (inf positions, accept 0) must
    not poison the trajectory adaptation through 0*inf — found by driving the
    49-dim BNN workload end-to-end on TPU."""
    import henbun_tpu as hb
    from henbun_tpu import models
    from henbun_tpu.inference import make_log_prob

    hb.set_seed(0)
    X, Y = models.make_bnn_dataset(n=128)
    m = models.BNN(seed=0, X=X, Y=Y, hidden=16)
    flp = make_log_prob(m, "log_posterior")
    init = flp.initial + 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (64, flp.dim)
    )
    res = chees.sample(
        flp.log_prob, init, jax.random.PRNGKey(1),
        num_samples=100, num_warmup=200,
    )
    assert np.isfinite(float(res.trajectory_length))
    assert np.isfinite(np.asarray(res.samples)).all()
    assert 0.3 < np.asarray(res.accept_prob).mean() < 0.99
