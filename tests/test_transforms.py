"""Transform tests mirroring the reference's `testing/test_transforms.py`:
np-forward == traced forward; backward∘forward == identity; hand-coded
log-Jacobians vs autodiff-derived log|det ∂f/∂x| (here via jax.jacfwd, which
the reference could not do in TF)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import henbun_tpu as hb
from henbun_tpu import transforms
from henbun_tpu.ops import linalg


ELEMENTWISE = [
    transforms.Identity(),
    transforms.Exp(),
    transforms.Log1pe(),
    transforms.Logistic(),
    transforms.Logistic(-2.0, 3.0),
]


@pytest.mark.parametrize("t", ELEMENTWISE, ids=lambda t: type(t).__name__ + str(t))
class TestElementwise:
    def setup_method(self, method):
        self.x = np.random.default_rng(0).normal(size=10).astype(np.float32)

    def test_np_vs_traced_forward(self, t):
        np_fwd = t.forward(self.x)
        tr_fwd = np.asarray(t.tf_forward(jnp.asarray(self.x)))
        assert np.allclose(np_fwd, tr_fwd, atol=1e-6)

    def test_backward_forward_roundtrip(self, t):
        y = t.forward(self.x)
        x2 = t.backward(y)
        assert np.allclose(self.x, x2, atol=1e-5)

    def test_log_jacobian_vs_autodiff(self, t):
        """Hand-written tf_log_jacobian vs sum of log |d f_i/d x_i| from
        jacfwd (all our transforms are elementwise here)."""
        x = jnp.asarray(self.x.astype(np.float64))
        with hb.settings.temp_settings(hb.settings.get_settings()) as cfg:
            cfg.dtypes.float_type = jnp.float64
            jac = jax.jacfwd(t.tf_forward)(x)
            auto = jnp.sum(jnp.log(jnp.abs(jnp.diagonal(jac))))
            hand = jnp.sum(t.tf_log_jacobian(x))
        assert np.allclose(float(auto), float(hand), rtol=1e-4)


class TestLowerTriangular:
    def test_roundtrip(self):
        t = transforms.LowerTriangular(4)
        vec = np.arange(10, dtype=np.float32)
        mat = t.forward(vec)
        assert mat.shape == (4, 4)
        assert np.allclose(np.triu(mat, 1), 0)
        assert np.allclose(t.backward(mat), vec)

    def test_free_state_size(self):
        t = transforms.LowerTriangular(5)
        assert t.free_state_size([5, 5]) == 15

    def test_batched(self):
        vec = np.arange(24, dtype=np.float32).reshape(4, 6)
        mat = linalg.vec_to_tri(jnp.asarray(vec))
        assert mat.shape == (4, 3, 3)
        back = linalg.tri_to_vec(mat)
        assert np.allclose(np.asarray(back), vec)


class TestPositiveAlias:
    def test_positive_is_log1pe(self):
        assert isinstance(transforms.positive, transforms.Log1pe)
