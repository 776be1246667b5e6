"""Checkpoint tests: npz path-keyed roundtrips are covered in test_model;
here the orbax pytree path (training-state checkpointing) is exercised."""
import numpy as np
import jax.numpy as jnp
import optax
import pytest

import henbun_tpu as hb
from henbun_tpu.utils import checkpoint


class SquareModel(hb.model.Model):
    def setUp(self):
        self.p = hb.Variable([2, 3])

    @hb.AutoOptimize()
    def likelihood(self):
        return -jnp.sum(jnp.square(self.p))


def test_orbax_training_state_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    m = SquareModel(seed=0)
    opt = m.likelihood()
    opt.compile(optax.adam(0.01))
    opt.optimize(maxiter=50)
    state = {"params": opt._trainable, "opt_state": opt.opt_state}
    path = str(tmp_path / "state")
    checkpoint.save_orbax(path, state)
    restored = checkpoint.restore_orbax(path, like=state)
    for k in state["params"]:
        assert np.allclose(
            np.asarray(restored["params"][k]), np.asarray(state["params"][k])
        )


def test_npz_roundtrip_through_subtree_api(tmp_path):
    m = SquareModel(seed=0)
    m.initialize()
    val = m.p.value.copy()
    p = str(tmp_path / "m.ckpt")
    checkpoint.save(m, p)
    m.p = np.zeros((2, 3), np.float32)
    m.initialize()
    checkpoint.restore(m, p)
    assert np.allclose(m.p.value, val)


class TestTrainingStateResume:
    def test_exact_resume(self, tmp_path):
        """save_state -> continue vs restore into a FRESH model/optimizer ->
        continue: identical parameters (same Adam slots and noise keys)."""
        import optax
        from henbun_tpu import models

        def fresh():
            hb.set_seed(0)
            X, Y = models.make_sine_dataset(n=20)
            m = models.GPR(seed=0, X=X, Y=Y)
            opt = m.ELBO_gaussian()
            opt.compile(optax.adam(0.01))
            return m, opt

        path = str(tmp_path / "state")
        m1, o1 = fresh()
        o1.optimize(maxiter=150)
        o1.save_state(path)
        o1.optimize(maxiter=150)
        final1 = {k: np.asarray(v) for k, v in m1.param_dict().items()}

        m2, o2 = fresh()
        o2.restore_state(path)
        assert o2.global_step == 150
        o2.optimize(maxiter=150)
        final2 = {k: np.asarray(v) for k, v in m2.param_dict().items()}

        assert final1.keys() == final2.keys()
        for k in final1:
            assert np.array_equal(final1[k], final2[k]), k

    def test_natgrad_state_roundtrip(self, tmp_path):
        """The natural-gradient transformation's state (nested optax state
        for the `rest` side) survives the orbax roundtrip."""
        import optax
        from henbun_tpu import models, optimizers as hopt

        hb.set_seed(0)
        X, Y = models.make_sine_dataset(n=16)
        m = models.GPR(seed=0, X=X, Y=Y, q_shape="diagonal")
        opt = m.ELBO_gaussian()
        opt.compile(hopt.natural_gradient(m, gamma=0.01, rest=optax.adam(0.02)))
        opt.optimize(maxiter=50)
        path = str(tmp_path / "ng_state")
        opt.save_state(path)
        opt.restore_state(path)
        opt.optimize(maxiter=50)
        assert np.isfinite(np.concatenate(opt.history)).all()

    def test_staged_assignment_included_in_saved_state(self, tmp_path):
        """An assignment staged after the last run must reach the checkpoint
        (save_state refreshes pending assigns), and a pending assignment at
        restore time must NOT clobber the restored values afterwards."""
        import optax
        from henbun_tpu import models

        hb.set_seed(0)
        X, Y = models.make_sine_dataset(n=12)
        m = models.GPR(seed=0, X=X, Y=Y)
        opt = m.ELBO_gaussian()
        opt.compile(optax.adam(0.01))
        m.var = np.asarray([0.5], np.float32)  # staged, no run() since
        path = str(tmp_path / "staged")
        opt.save_state(path)
        saved = float(np.asarray(m.var.value)[0])
        assert abs(saved - 0.5) < 1e-5

        # fresh model: stage a DIFFERENT assignment, then restore over it
        hb.set_seed(0)
        X, Y = models.make_sine_dataset(n=12)
        m2 = models.GPR(seed=0, X=X, Y=Y)
        o2 = m2.ELBO_gaussian()
        o2.compile(optax.adam(0.01))
        m2.var = np.asarray([9.0], np.float32)  # pending at restore time
        o2.restore_state(path)
        o2.run()  # triggers _refresh_params; must not re-apply the 9.0
        assert abs(float(np.asarray(m2.var.value)[0]) - 0.5) < 1e-5
