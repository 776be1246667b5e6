"""Numeric-op tests mirroring `testing/test_tf_wraps.py`: settings-gated clip
behavior through temp_settings contexts, log_sum_exp vs numpy, plus the
vec_to_tri/tri_to_vec pair the reference shipped disabled."""
import numpy as np
import jax
import jax.numpy as jnp

import henbun_tpu as hb
from henbun_tpu.ops import linalg


def test_eye():
    e = linalg.eye(4)
    assert e.dtype == hb.settings.dtypes.float_type
    assert np.allclose(np.asarray(e), np.eye(4))


def test_clip_disabled_by_default():
    x = jnp.asarray([-100.0, 0.0, 100.0])
    assert np.allclose(np.asarray(linalg.clip(x)), [-100.0, 0.0, 100.0])


def test_clip_enabled_via_temp_settings():
    x = jnp.asarray([-100.0, 0.0, 100.0])
    cfg = hb.settings.get_settings()
    cfg.numerics.clip_by_value = True
    with hb.settings.temp_settings(cfg):
        out = np.asarray(linalg.clip(x))
    assert np.allclose(out, [-50.0, 0.0, 50.0])
    # restored afterwards
    assert hb.settings.numerics.clip_by_value is False


def test_log_sum_exp_vs_numpy():
    x = np.random.default_rng(0).normal(size=(4, 6))
    ours = np.asarray(linalg.log_sum_exp(jnp.asarray(x), axis=-1))
    oracle = np.log(np.sum(np.exp(x), axis=-1))
    assert np.allclose(ours, oracle, rtol=1e-6)


def test_vec_tri_roundtrip_and_grad():
    vec = jnp.arange(6, dtype=jnp.float32)
    mat = linalg.vec_to_tri(vec)
    assert mat.shape == (3, 3)
    assert np.allclose(np.asarray(linalg.tri_to_vec(mat)), np.asarray(vec))
    # differentiable
    g = jax.grad(lambda v: jnp.sum(linalg.vec_to_tri(v) ** 2))(vec)
    assert np.allclose(np.asarray(g), 2 * np.arange(6))


def test_settings_parse_types():
    assert hb.settings.dtypes.float_type == jnp.float32
    assert isinstance(hb.settings.numerics.jitter_level, float)
    assert hb.settings.numerics.clip_by_value is False
    assert isinstance(hb.settings.tpu.scan_chunk, int)
