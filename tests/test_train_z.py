"""Trainable inducing points in the evidence families (VERDICT r4 #3).

Evidence training of z is known to collide neighboring inducing points
(measured on chip at n=1e5, m=128, Adam 0.05: min spacing 0.047 -> 5.6e-4
by step 115, Cholesky-gradient NaN at 119). `gp.gp.z_repulsion` is the
collision barrier the families subtract from their objectives under
``train_z=True``; these tests pin its contract:

* exactly zero (objective untouched) while every spacing exceeds d0;
* escapes a near-collided init instead of NaN'ing (the regression for the
  measured cliff, scaled to CI);
* trainable z beats frozen z when the init is deliberately misplaced.

The matching reference device is z as a plain trainable Variable,
`/root/reference/Henbun/gp/gp.py:86-97`.
"""
import numpy as np
import optax
import pytest

import henbun_tpu as hb
from henbun_tpu import models
from henbun_tpu.gp.gp import z_min_spacing, z_repulsion

import jax
import jax.numpy as jnp


def _data(n=2000, seed=0):
    rng = np.random.default_rng(seed)
    X = np.sort(rng.uniform(0, 6, (n, 1))).astype(np.float32)
    p_true = 1.0 / (1.0 + np.exp(-3.0 * np.sin(X)))
    Y = (rng.uniform(size=X.shape) < p_true).astype(np.float32)
    return X, Y


class TestBarrier:
    def test_inactive_is_exact_zero_and_objective_untouched(self):
        """Above-onset spacings contribute EXACTLY zero, so train_z=True at
        a clean init evaluates the identical evidence as frozen z."""
        X, Y = _data(n=400)
        hb.set_seed(0)
        frozen = models.SparseGPC(seed=0, X=X, Y=Y, num_inducing=16)
        e_frozen = float(frozen.log_marginal_laplace().run())
        hb.set_seed(0)
        live = models.SparseGPC(seed=0, X=X, Y=Y, num_inducing=16,
                                train_z=True)
        e_live = float(live.log_marginal_laplace().run())
        assert e_frozen == pytest.approx(e_live, rel=1e-6)

    def test_gradient_separates_near_pair(self):
        z = np.linspace(0, 1, 8)[:, None].astype(np.float32)
        d0 = 0.5 * z_min_spacing(z)
        z[3] = z[4] - 1e-4  # nearly coincident pair
        g = jax.grad(lambda zz: z_repulsion(zz, d0, 100.0))(jnp.asarray(z))
        assert bool(jnp.isfinite(g).all())
        # subtracted from a maximized objective: ascent moves z along -g,
        # which must increase the pair's separation (z[3] < z[4])
        assert float(g[3, 0]) > 0 and float(g[4, 0]) < 0
        # all other points feel no force at all (hinge barrier)
        others = np.r_[g[:3, 0], g[5:, 0]]
        assert np.abs(others).max() == 0.0

    def test_coincident_pair_is_finite(self):
        z = np.linspace(0, 1, 8)[:, None].astype(np.float32)
        d0 = 0.5 * z_min_spacing(z)
        z[3] = z[4]
        val = z_repulsion(jnp.asarray(z), d0, 100.0)
        g = jax.grad(lambda zz: z_repulsion(zz, d0, 100.0))(jnp.asarray(z))
        assert np.isfinite(float(val)) and bool(jnp.isfinite(g).all())


class TestTrainZ:
    def test_escapes_near_collision(self):
        """The measured cliff, scaled to CI: start z with a pair at 1e-3
        spacing (the chip run NaN'd once spacing reached 5.6e-4) and train
        with train_z=True — the run stays finite and the barrier pushes the
        pair back above d0/2."""
        X, Y = _data(n=2000, seed=1)
        hb.set_seed(0)
        m = models.SparseGPC(seed=0, X=X, Y=Y, num_inducing=24,
                             train_z=True)
        z0 = np.asarray(m.gp.z.value).copy()
        z0[10] = z0[11] - 1e-3
        m.gp.z = z0
        assert z_min_spacing(z0) < 2e-3
        opt = m.log_marginal_laplace().compile(optax.adam(0.02))
        opt.optimize(maxiter=300)
        e = float(opt.run())
        assert np.isfinite(e)
        spacing = z_min_spacing(np.asarray(m.gp.z.value))
        assert spacing > 0.5 * m._z_d0

    def test_trained_z_beats_frozen_on_misplaced_init(self):
        """Give both models the same deliberately misplaced z (all mass in
        one corner of the input range); only the trainable one can recover.
        Compare the frozen-z evidence of the two final z layouts."""
        X, Y = _data(n=2000, seed=2)
        bad_z = np.linspace(0.0, 1.0, 16)[:, None].astype(np.float32)

        hb.set_seed(0)
        frozen = models.SparseGPC(seed=0, X=X, Y=Y, num_inducing=16)
        frozen.gp.z = bad_z.copy()
        fopt = frozen.log_marginal_laplace().compile(optax.adam(0.05))
        fopt.optimize(maxiter=250)
        e_frozen = float(fopt.run())

        hb.set_seed(0)
        live = models.SparseGPC(seed=0, X=X, Y=Y, num_inducing=16,
                                train_z=True)
        live.gp.z = bad_z.copy()
        # overriding z after setUp: re-derive the barrier onset from the
        # layout actually used (setUp sized it from the quantile init)
        live._z_d0 = 0.5 * z_min_spacing(bad_z)
        lopt = live.log_marginal_laplace().compile(optax.adam(0.05))
        lopt.optimize(maxiter=250)
        e_live = float(lopt.run())

        assert np.isfinite(e_live) and np.isfinite(e_frozen)
        assert e_live > e_frozen
        # and the trained z actually moved out of the corner
        assert float(np.asarray(live.gp.z.value).max()) > 2.0

    def test_robust_family_trains_z(self):
        rng = np.random.default_rng(3)
        X = np.sort(rng.uniform(0, 6, (1500, 1))).astype(np.float32)
        Y = np.sin(X) + 0.1 * rng.standard_normal(X.shape).astype(np.float32)
        Y[::37] += 3.0  # outliers
        hb.set_seed(0)
        m = models.SparseGPRobust(seed=0, X=X, Y=Y, num_inducing=16,
                                  train_z=True)
        opt = m.log_marginal_laplace().compile(optax.adam(0.03))
        e0 = float(opt.run())
        opt.optimize(maxiter=200)
        e1 = float(opt.run())
        assert np.isfinite(e1) and e1 > e0
        assert z_min_spacing(np.asarray(m.gp.z.value)) > 0.25 * m._z_d0
