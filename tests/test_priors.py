"""Prior logp tests vs scipy oracles (the reference shipped priors without
dedicated tests)."""
import numpy as np
import jax.numpy as jnp
import scipy.stats as ss

from henbun_tpu import priors

RNG = np.random.default_rng(0)


def _close(ours, oracle):
    assert np.allclose(float(ours), oracle, rtol=1e-4, atol=1e-5)


def test_normal():
    x = RNG.normal(size=7).astype(np.float32)
    _close(priors.Normal().logp(jnp.asarray(x)), ss.norm.logpdf(x).sum())


def test_gaussian():
    x = RNG.normal(size=7).astype(np.float32)
    p = priors.Gaussian(0.5, 2.0)
    _close(p.logp(jnp.asarray(x)), ss.norm.logpdf(x, 0.5, np.sqrt(2.0)).sum())
    assert "N" in str(p)


def test_lognormal():
    x = RNG.uniform(0.1, 3.0, size=7).astype(np.float32)
    p = priors.LogNormal(0.3, 1.5)
    _close(
        p.logp(jnp.asarray(x)),
        ss.lognorm.logpdf(x, s=np.sqrt(1.5), scale=np.exp(0.3)).sum(),
    )


def test_gamma():
    x = RNG.gamma(2.0, 1.5, size=7).astype(np.float32)
    p = priors.Gamma(2.0, 1.5)
    _close(p.logp(jnp.asarray(x)), ss.gamma.logpdf(x, a=2.0, scale=1.5).sum())


def test_laplace():
    x = RNG.normal(size=7).astype(np.float32)
    p = priors.Laplace(0.5, 1.5)
    _close(p.logp(jnp.asarray(x)), ss.laplace.logpdf(x, 0.5, 1.5).sum())


def test_uniform():
    x = RNG.uniform(0, 1, size=7).astype(np.float32)
    p = priors.Uniform(-2.0, 3.0)
    _close(p.logp(jnp.asarray(x)), -7 * np.log(5.0))


def test_prior_in_variational_kl():
    """A prior attaches to a Variational and contributes to its KL."""
    import henbun_tpu as hb
    import jax

    m = hb.model.Model(seed=0)
    m.q = hb.variationals.Variational(
        shape=[4], transform=hb.transforms.positive, prior=priors.Gamma(2.0, 1.0)
    )
    m.initialize()
    kl = m.run(lambda mm: mm.KL(), key=jax.random.PRNGKey(0))
    assert np.isfinite(float(kl))
