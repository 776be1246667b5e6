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
