"""Density tests against scipy oracles, extending the reference's
`testing/test_densities.py` (student_t vs scipy, bimixture vs direct log-mix)
to cover every density — the reference left gaussian/beta/bernoulli/etc
untested and its bernoulli was broken."""
import numpy as np
import jax.numpy as jnp
import scipy.stats as ss
from scipy.special import loggamma

from henbun_tpu import densities


RNG = np.random.default_rng(0)


def _assert_close(ours, oracle, rtol=1e-4, atol=1e-5):
    assert np.allclose(np.asarray(ours), oracle, rtol=rtol, atol=atol)


def test_gaussian():
    x = RNG.normal(size=10).astype(np.float32)
    _assert_close(
        densities.gaussian(jnp.asarray(x), 0.5, 2.0),
        ss.norm.logpdf(x, 0.5, np.sqrt(2.0)),
    )


def test_lognormal():
    x = RNG.uniform(0.1, 3.0, size=10).astype(np.float32)
    _assert_close(
        densities.lognormal(jnp.asarray(x), 0.3, 1.5),
        ss.lognorm.logpdf(x, s=np.sqrt(1.5), scale=np.exp(0.3)),
    )


def test_bernoulli():
    p = RNG.uniform(0.05, 0.95, size=10).astype(np.float32)
    y = (RNG.uniform(size=10) < 0.5).astype(np.float32)
    _assert_close(
        densities.bernoulli(jnp.asarray(p), jnp.asarray(y)),
        ss.bernoulli.logpmf(y.astype(int), p),
        rtol=1e-4,
    )


def test_poisson():
    lamb = RNG.uniform(0.5, 5.0, size=10).astype(np.float32)
    y = RNG.poisson(2.0, size=10).astype(np.float32)
    _assert_close(
        densities.poisson(jnp.asarray(lamb), jnp.asarray(y)),
        ss.poisson.logpmf(y.astype(int), lamb),
    )


def test_exponential():
    lamb = RNG.uniform(0.5, 3.0, size=10).astype(np.float32)
    y = RNG.exponential(1.0, size=10).astype(np.float32)
    _assert_close(
        densities.exponential(jnp.asarray(lamb), jnp.asarray(y)),
        ss.expon.logpdf(y, scale=lamb),
    )


def test_gamma():
    shape, scale = 2.0, 1.5
    x = RNG.gamma(shape, scale, size=10).astype(np.float32)
    _assert_close(
        densities.gamma(shape, scale, jnp.asarray(x)),
        ss.gamma.logpdf(x, a=shape, scale=scale),
    )


def test_student_t_scalar_and_tensor_dof():
    """vs the reference's explicit loggamma formula
    (testing/test_densities.py:26-75)."""
    x = RNG.normal(size=10).astype(np.float32)
    mean, scale = 0.3, 1.2
    for deg_free in [3.0, np.full(10, 3.0, dtype=np.float32)]:
        oracle = (
            loggamma((np.asarray(deg_free) + 1.0) * 0.5)
            - loggamma(np.asarray(deg_free) * 0.5)
            - 0.5 * (np.log(scale**2) + np.log(np.asarray(deg_free)) + np.log(np.pi))
            - 0.5 * (np.asarray(deg_free) + 1.0)
            * np.log(1.0 + (1.0 / np.asarray(deg_free)) * ((x - mean) / scale) ** 2)
        )
        _assert_close(
            densities.student_t(jnp.asarray(x), mean, scale, deg_free), oracle
        )


def test_beta():
    a, b = 2.0, 3.0
    y = RNG.uniform(0.01, 0.99, size=10).astype(np.float32)
    _assert_close(
        densities.beta(a, b, jnp.asarray(y)), ss.beta.logpdf(y, a, b), rtol=1e-4
    )


def test_laplace():
    mu, sigma = 0.5, 1.5
    y = RNG.normal(size=10).astype(np.float32)
    _assert_close(
        densities.laplace(mu, sigma, jnp.asarray(y)),
        ss.laplace.logpdf(y, loc=mu, scale=sigma),
    )


def test_multivariate_normal_vector_and_matrix():
    n = 5
    A = RNG.normal(size=(n, n))
    cov = (A @ A.T + n * np.eye(n)).astype(np.float64)
    L = np.linalg.cholesky(cov)
    mu = RNG.normal(size=n)
    x = RNG.normal(size=n)
    ours = densities.multivariate_normal(jnp.asarray(x), jnp.asarray(mu), jnp.asarray(L))
    _assert_close(ours, ss.multivariate_normal.logpdf(x, mu, cov), rtol=1e-5)
    # matrix case: independent columns
    X = RNG.normal(size=(n, 3))
    ours = densities.multivariate_normal(
        jnp.asarray(X), jnp.asarray(mu)[:, None], jnp.asarray(L)
    )
    oracle = sum(ss.multivariate_normal.logpdf(X[:, i], mu, cov) for i in range(3))
    _assert_close(ours, oracle, rtol=1e-5)


def test_bimixture():
    """vs direct log(frac e^a + (1-frac) e^b)
    (testing/test_densities.py:11-24)."""
    a = RNG.normal(size=10)
    b = RNG.normal(size=10)
    frac = 0.3
    oracle = np.log(frac * np.exp(a) + (1 - frac) * np.exp(b))
    _assert_close(
        densities.bimixture(frac, jnp.asarray(a), jnp.asarray(b)), oracle, rtol=1e-5
    )
