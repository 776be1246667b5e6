"""Batched multi-model training (VERDICT r1 #10): N structurally-identical
models fit in ONE device program, each reaching its own optimum; inherited
driver features (minibatch modes, save/restore, nan-guard) stay intact."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import henbun_tpu as hb
from henbun_tpu import models
from henbun_tpu.batched import BatchedOptimizer


class MeanModel(hb.model.Model):
    def setUp(self, data):
        self.x = hb.Data(data)
        self.p = hb.Variable([2])

    @hb.AutoOptimize()
    def obj(self):
        return -jnp.sum(jnp.square(self.x - self.p))


def _mean_models(M=16, n=64):
    rng = np.random.default_rng(0)
    targets = rng.normal(size=(M, 2)).astype(np.float32) * 2.0
    ms = []
    for i in range(M):
        data = (rng.normal(size=(n, 2)) * 0.1 + targets[i]).astype(np.float32)
        ms.append(MeanModel(seed=i, data=data))
    return ms, targets


def test_sixteen_models_converge_independently():
    ms, targets = _mean_models(M=16)
    opt = BatchedOptimizer(ms, "obj")
    opt.compile(optax.adam(0.05))
    opt.optimize(maxiter=1500)
    for m, t in zip(ms, targets):
        assert np.allclose(np.asarray(m.p.value), t, atol=0.1), (m.p.value, t)
    # one program: a single chunk executable in the cache
    assert len(opt._chunk_cache) == 1


def test_batched_matches_single_model_fit():
    """A batched fit reaches the same optimum as a solo Optimizer on the
    same model/data (deterministic objective => same fixed point)."""
    rng = np.random.default_rng(3)
    data = (rng.normal(size=(32, 2)) + np.array([2.0, -1.0])).astype(np.float32)

    solo = MeanModel(seed=0, data=data)
    so = solo.obj()
    so.compile(optax.adam(0.05))
    so.optimize(maxiter=1200)

    batch_ms = [MeanModel(seed=i, data=data) for i in range(4)]
    bo = BatchedOptimizer(batch_ms, "obj")
    bo.compile(optax.adam(0.05))
    bo.optimize(maxiter=1200)

    for m in batch_ms:
        assert np.allclose(
            np.asarray(m.p.value), np.asarray(solo.p.value), atol=1e-3
        )


class MBMeanModel(hb.model.Model):
    def setUp(self, data):
        self.x = hb.MinibatchData(data)
        self.p = hb.Variable([2])

    @hb.AutoOptimize()
    def obj(self):
        return -jnp.sum(jnp.square(self.x - self.p))


@pytest.mark.parametrize("mode", ["random", "block"])
def test_batched_minibatch_modes(mode):
    rng = np.random.default_rng(1)
    targets = np.array([[1.0, -2.0], [3.0, 0.5]], np.float32)
    ms = [
        MBMeanModel(seed=i, data=(rng.normal(size=(256, 2)) * 0.3 + t).astype(np.float32))
        for i, t in enumerate(targets)
    ]
    opt = BatchedOptimizer(ms, "obj")
    opt.compile(optax.adam(0.05))
    opt.optimize(maxiter=900, minibatch_size=32, minibatch_mode=mode)
    for m, t in zip(ms, targets):
        assert np.allclose(np.asarray(m.p.value), t, atol=0.25)


def test_batched_gpr_family():
    """Whole GPR models (cholesky + variational q) batch: 8 sine fits with
    different noise draws each recover finite, improving ELBOs and their own
    kernel parameters."""
    ms = []
    for i in range(8):
        X, Y = models.make_sine_dataset(n=24, seed=i)
        ms.append(models.GPR(seed=i, X=X, Y=Y, q_shape="diagonal"))
    opt = BatchedOptimizer(ms, "ELBO_gaussian")
    opt.compile(optax.adam(0.01))
    e0 = float(opt.run())
    opt.optimize(maxiter=1500)
    e1 = float(opt.run())
    assert np.isfinite(np.concatenate(opt.history)).all()
    assert e1 > e0
    ls = np.array([float(m.kern.lengthscales.value[0]) for m in ms])
    assert (ls > 0.2).all() and (ls < 5.0).all()
    assert len(np.unique(np.round(ls, 4))) > 1  # fits are not tied together


def test_batched_save_restore(tmp_path):
    def fresh():
        hb.set_seed(0)
        ms, _ = _mean_models(M=3)
        opt = BatchedOptimizer(ms, "obj")
        opt.compile(optax.adam(0.05))
        return ms, opt

    path = str(tmp_path / "bstate")
    ms1, o1 = fresh()
    o1.optimize(maxiter=200)
    o1.save_state(path)
    o1.optimize(maxiter=200)
    final1 = [np.asarray(m.p.value) for m in ms1]

    ms2, o2 = fresh()
    o2.restore_state(path)
    o2.optimize(maxiter=200)
    final2 = [np.asarray(m.p.value) for m in ms2]
    for a, b in zip(final1, final2):
        assert np.array_equal(a, b)


def test_structure_mismatch_raises():
    rng = np.random.default_rng(0)
    m1 = MeanModel(seed=0, data=rng.normal(size=(16, 2)).astype(np.float32))
    m2 = MeanModel(seed=0, data=rng.normal(size=(24, 2)).astype(np.float32))
    with pytest.raises(ValueError, match="structure"):
        BatchedOptimizer([m1, m2], "obj").compile()


def test_batched_hetero_family():
    """The round-3 families compose with the batched driver too: 8
    heteroscedastic fits (two chol paths + exp-coupled deterministic ELBO
    per model) advance in one program and learn per-model noise profiles."""
    ms = []
    for i in range(6):
        X, Y, _ = models.make_hetero_dataset(n=32, seed=i)
        ms.append(models.HeteroscedasticGPR(seed=i, X=X, Y=Y,
                                            q_shape="diagonal"))
    opt = BatchedOptimizer(ms, "ELBO_analytic")
    opt.compile(optax.adam(0.02))
    e0 = float(opt.run())
    opt.optimize(maxiter=800)
    e1 = float(opt.run())
    assert np.isfinite(np.concatenate(opt.history)).all()
    assert e1 > e0 + 10.0
    g0s = np.array([float(m.g0.value[0]) for m in ms])
    assert len(np.unique(np.round(g0s, 4))) > 1  # fits are independent
