"""Fused whole-Newton Pallas kernel (ops/pallas_newton.py, VERDICT r4 #4).

Gates: the kernel (interpreter mode) finds the SAME mode as the generic
`_newton_iterations` under vmap for both supported likelihoods; the
`laplace_whitened(fused=...)` wiring changes nothing on unbatched/CPU
traces (evidence values and hyperparameter gradients agree with the
generic path). Chip ratios in docs/PERF.md §Laplace.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import henbun_tpu as hb
from henbun_tpu import densities
from henbun_tpu.inference.laplace import _newton_iterations, laplace_whitened
from henbun_tpu.ops.pallas_newton import newton_mode_vbatched


def _batch(B=4, n=40, seed=0):
    rng = np.random.default_rng(seed)
    Lks, ys = [], []
    for b in range(B):
        X = np.sort(rng.uniform(0, 6, (n, 1))).astype(np.float32)
        d2 = (X[:, None, 0] - X[None, :, 0]) ** 2
        K = np.exp(-0.5 * d2 / 0.7**2) + 1e-4 * np.eye(n)
        Lks.append((np.linalg.cholesky(K) * (1.0 + 0.2 * b)).astype(np.float32))
        y = np.sin(X) + 0.1 * rng.standard_normal((n, 1))
        y[::7] += 2.0
        ys.append(y.astype(np.float32))
    var = np.asarray([[0.15 + 0.05 * b] for b in range(B)], np.float32)
    return jnp.asarray(np.stack(Lks)), jnp.asarray(np.stack(ys)), jnp.asarray(var)


class TestKernelAgainstGenericPath:
    def test_student_t_mode_matches(self):
        Lk, y, var = _batch()
        v_ref = jax.vmap(
            lambda L, yy, vv: _newton_iterations(
                lambda f: densities.student_t(yy, f, vv, 3.0), L, 15, 1e-6
            )
        )(Lk, y, var)
        v_ker = newton_mode_vbatched(
            Lk, y, var, "student_t", df=3.0, iters=15, interpret=True
        )
        assert float(jnp.max(jnp.abs(v_ker - v_ref))) < 1e-4

    def test_bernoulli_mode_matches(self):
        Lk, y, _ = _batch(seed=1)
        yb = (np.asarray(y) > 0.0).astype(np.float32)
        v_ref = jax.vmap(
            lambda L, yy: _newton_iterations(
                lambda f: yy * jax.nn.log_sigmoid(f)
                + (1 - yy) * jax.nn.log_sigmoid(-f),
                L, 15, 1e-6,
            )
        )(Lk, jnp.asarray(yb))
        v_ker = newton_mode_vbatched(
            Lk, jnp.asarray(yb), jnp.ones((Lk.shape[0], 1)),
            "bernoulli_logit", iters=15, interpret=True,
        )
        assert float(jnp.max(jnp.abs(v_ker - v_ref))) < 1e-3

    def test_rectangular_projection_matches(self):
        """The inducing-point shape: A [n, m] with n != m."""
        rng = np.random.default_rng(2)
        B, n, m = 3, 96, 24
        A = jnp.asarray(rng.standard_normal((B, n, m)).astype(np.float32) * 0.4)
        y = jnp.asarray(
            (rng.standard_normal((B, n, 1)) > 0).astype(np.float32)
        )
        v_ref = jax.vmap(
            lambda a, yy: _newton_iterations(
                lambda f: yy * jax.nn.log_sigmoid(f)
                + (1 - yy) * jax.nn.log_sigmoid(-f),
                a, 15, 1e-6,
            )
        )(A, y)
        v_ker = newton_mode_vbatched(
            A, y, jnp.ones((B, 1)), "bernoulli_logit", iters=15,
            interpret=True,
        )
        assert v_ker.shape == (B, m, 1)
        assert float(jnp.max(jnp.abs(v_ker - v_ref))) < 1e-3


class TestFusedWiring:
    def test_evidence_and_grads_unchanged(self):
        """fused= must not change values or hyper gradients on the
        unbatched path (on CPU the batched path falls back to the vmapped
        generic iteration — also exercised via vmap here)."""
        rng = np.random.default_rng(3)
        n = 30
        X = np.sort(rng.uniform(0, 6, (n, 1))).astype(np.float32)
        d2 = (X[:, None, 0] - X[None, :, 0]) ** 2
        K = np.exp(-0.5 * d2 / 0.7**2) + 1e-4 * np.eye(n)
        Lk0 = jnp.asarray(np.linalg.cholesky(K).astype(np.float32))
        y = jnp.asarray(
            (np.sin(X) + 0.1 * rng.standard_normal((n, 1))).astype(np.float32)
        )

        def ev(kv, varr, use_fused):
            Lk = Lk0 * jnp.sqrt(kv)
            ll = lambda f: densities.student_t(y, f, varr, 3.0)
            fused = (
                ("student_t", {"y": y, "var": varr, "df": 3.0})
                if use_fused
                else None
            )
            return laplace_whitened(ll, Lk, fused=fused).log_marginal

        kv = jnp.asarray([1.3])
        varr = jnp.asarray([0.2])
        e0 = float(ev(kv, varr, False))
        e1 = float(ev(kv, varr, True))
        assert e0 == pytest.approx(e1, rel=1e-6)
        g0 = jax.grad(lambda a, b: ev(a, b, False), argnums=(0, 1))(kv, varr)
        g1 = jax.grad(lambda a, b: ev(a, b, True), argnums=(0, 1))(kv, varr)
        for a, b in zip(g0, g1):
            assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-5)

        # batched (vmap) wiring: the custom batching rule's fallback
        kvs = jnp.asarray([[1.0], [1.5], [2.0]])
        vs = jnp.asarray([[0.15], [0.2], [0.3]])
        ef = jax.vmap(lambda a, b: ev(a, b, True))(kvs, vs)
        eg = jax.vmap(lambda a, b: ev(a, b, False))(kvs, vs)
        assert np.allclose(np.asarray(ef), np.asarray(eg), rtol=1e-6)
