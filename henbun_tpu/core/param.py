"""Parameter-tree core: Parentable / Variable / Parameterized / ParamList /
Data / MinibatchData and the ``graph_key`` collection tags.

Capability parity with `/root/reference/Henbun/param.py` (739 LoC), redesigned
for JAX:

* Variables are leaves holding a committed *free-space* value (host/device
  array) plus deferred-assignment state (`param.py:241-279` semantics:
  ``assign`` stages, ``initialize`` commits, ``finalize`` clears the flag).
* ``tf_mode`` is replaced by the trace context (:mod:`henbun_tpu.core.context`):
  inside a traced objective, attribute access on a ``Parameterized`` returns
  the node's tensor (transformed parameter / data batch / posterior sample),
  and attribute *assignment* to a LOCAL node performs the feed
  (`param.py:342-417` semantics, without any tree mutation).
* Collections are arbitrary string tags enabling optimizer masking of
  parameter subsets (`param.py:29-47`, tested in `testing/test_model.py:56-74`);
  ``LOCAL`` and ``DATA`` are the two non-parameter kinds.
* The amortized-inference feed keeps the reference's slab contract: an encoder
  emits ``[*n_layers, N, sum(feed_size)]`` and the tree unpacks it to each
  LOCAL leaf by last-axis offsets in recursive name-sorted order
  (`param.py:291-304,516-537`).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import transforms
from .._settings import settings, np_float
from . import context as _ctx
from . import rng as _rng


class _GraphKey:
    """Collection tags distinguishing Variable kinds (cf. param.py:29-47)."""

    def __init__(self):
        self.VARIABLES = "variables"  # default trainable-global tag
        self.LOCAL = "LOCAL"
        self.DATA = "DATA"

    @property
    def not_parameters(self):
        return [self.LOCAL, self.DATA]


graph_key = _GraphKey()


def _float_type():
    return settings.dtypes.float_type


def _in_collections(collection, collections):
    """Is `collection` matched by a Variable's `collections` attribute?
    `collections` is either a list of string tags (global parameters) or the
    string 'LOCAL'/'DATA'."""
    if collection is None:
        return True
    if isinstance(collections, str):
        return collection == collections
    return collection in collections


class Parentable:
    """Tree node with a `_parent` backref; name is discovered from the parent's
    __dict__ (cf. param.py:49-95)."""

    def __init__(self):
        self._parent = None

    @property
    def highest_parent(self):
        if self._parent is None:
            return self
        return self._parent.highest_parent

    @property
    def name(self):
        if self._parent is None:
            return "unnamed"
        if isinstance(self._parent, ParamList):
            return "item%i" % self._parent._list.index(self)
        matches = [
            key
            for key, value in self._parent.__dict__.items()
            if value is self
        ]
        if len(matches) == 0:
            raise ValueError(
                "mis-specified parent. This Param's _parent does not contain a "
                "reference to it."
            )
        if len(matches) > 1:
            raise ValueError("This Param appears to be doubly referenced by a parent")
        return matches[0]

    @property
    def long_name(self):
        if self._parent is None:
            return self.name
        return self._parent.long_name + "." + self.name

    def path_to(self, ancestor):
        """Dotted path of this node relative to `ancestor`, or None if the
        node is not in `ancestor`'s tree. Used as the key into the trace
        context's params/data/feeds dicts."""
        if self is ancestor:
            return ""
        parts = []
        node = self
        while node is not ancestor:
            if node._parent is None:
                return None
            parts.append(node.name)
            node = node._parent
        return ".".join(reversed(parts))

    def _trace_path(self, ctx):
        return self.path_to(ctx.root)


class Variable(Parentable):
    """Leaf node: a global parameter, LOCAL (fed) parameter, or data slot.

    Full array shape is ``[*n_layers, (n_batch,) *shape]`` (cf.
    param.py:157-209). Global variables are initialized truncated-normal in
    free space; transforms map free space to the constrained space on access.
    """

    def __init__(
        self,
        shape,
        n_layers=[],
        n_batch=None,
        mean=0.0,
        stddev=1.0,
        transform=None,
        collections=None,
    ):
        Parentable.__init__(self)
        if isinstance(shape, int):
            shape = [shape]
        self.transform = transform if transform is not None else transforms.Identity()
        self.collections = collections if collections is not None else [graph_key.VARIABLES]
        self.n_batch = n_batch
        self.shape = list(shape)
        self.n_layers = list(n_layers)
        self._assigned = True
        self._pending = None   # staged free-space value (deferred assignment)
        self._free = None      # committed free-space value
        if self.collections in graph_key.not_parameters:
            # LOCAL: fed during trace; DATA: handled by the Data subclass.
            pass
        else:
            if self.n_batch is None:
                full = list(self.n_layers) + list(self.shape)
            else:
                full = list(self.n_layers) + [self.n_batch] + list(self.shape)
            init = _rng.truncated_normal(
                full, mean=mean, stddev=stddev, dtype=np_float()
            )
            self._free = init
            self._pending = init

    # --- trace-mode access -------------------------------------------------
    def tensor(self):
        """The transformed tensor for this leaf inside a trace; outside a
        trace, the transformed committed value (host path)."""
        ctx = _ctx.current()
        if ctx is not None:
            path = self._trace_path(ctx)
        else:
            path = None
        if self.collections is graph_key.DATA:
            if ctx is not None and path is not None and path in ctx.data:
                return ctx.data[path]
            return jnp.asarray(self.data)
        if self.collections is graph_key.LOCAL:
            if ctx is None or path is None or path not in ctx.feeds:
                raise ValueError(
                    "local variable " + self.long_name + " is not fed."
                )
            return self.transform.tf_forward(ctx.feeds[path])
        # global parameter
        if ctx is not None and path is not None and path in ctx.params:
            free = ctx.params[path]
        else:
            free = self._free
        return self.transform.tf_forward(free)

    # --- collection queries ------------------------------------------------
    def get_variables(self, collection=None):
        if _in_collections(collection, self.collections):
            return [self]
        return []

    # --- deferred assignment lifecycle (cf. param.py:241-279) ---------------
    def assign(self, value):
        if self.collections not in graph_key.not_parameters:
            self._pending = np.asarray(
                self.transform.backward(np.asarray(value, dtype=np_float())),
                dtype=np_float(),
            )
            self._assigned = True

    @property
    def initialize_ops(self):
        """Leaves with a staged assignment pending commit."""
        if self.collections not in graph_key.not_parameters and self._assigned:
            return [self]
        return []

    def _commit(self):
        if self._pending is not None:
            self._free = np.asarray(self._pending)

    def initialize(self):
        self._commit()
        self.finalize()

    def finalize(self):
        self._assigned = False

    @property
    def value(self):
        """Current (constrained-space) value. Commits any staged assignment
        first, as the reference's `.value` does (param.py:268-279)."""
        if self._assigned and self.collections not in graph_key.not_parameters:
            self._commit()
            self.finalize()
        return np.asarray(self.transform.forward(np.asarray(self._free)))

    @property
    def free_value(self):
        """Committed free-space value (the optimizer-visible array)."""
        return self._free

    def set_free_value(self, free):
        """Directly set the committed free-space value (used by the training
        driver to write back optimized parameters)."""
        self._free = free
        self._assigned = False
        self._pending = None

    # --- amortized feeding (cf. param.py:281-304) ---------------------------
    @property
    def feed_size(self):
        if self.collections is graph_key.LOCAL:
            return int(np.prod(self.shape)) if self.shape else 1
        return 0

    def feed(self, x):
        """Feed a ``[*n_layers, N, feed_size]`` tensor into this LOCAL leaf;
        the flattened trailing axis is reshaped back to `shape`."""
        if self.collections is not graph_key.LOCAL:
            return
        ctx = _ctx.current()
        if ctx is None:
            raise RuntimeError(
                "feed() outside a trace: local variables only exist inside a "
                "traced objective."
            )
        if self.n_batch is not None and x.shape[-2] is not None:
            assert x.shape[-2] == self.n_batch
        new_shape = tuple(self.n_layers) + (x.shape[-2],) + tuple(self.shape)
        path = self._trace_path(ctx)
        ctx.feeds[path] = jnp.reshape(x, new_shape)

    def get_feed_dict(self, minibatch_index=None):
        if self.collections is graph_key.DATA:
            raise NotImplementedError
        return {}


class Parameterized(Parentable):
    """Container node holding Variables / other Parameterized children.

    Attribute access inside a trace returns child tensors; attribute
    assignment inside a trace feeds LOCAL children (cf. param.py:342-417).
    """

    def __init__(self):
        Parentable.__init__(self)
        self.scoped_keys = []

    # --- trace-mode attribute swap ------------------------------------------
    def __getattribute__(self, key):
        o = object.__getattribute__(self, key)
        if key.startswith("_"):
            return o
        ctx = _ctx.current()
        if ctx is None:
            return o
        # only nodes inside the traced tree participate
        if isinstance(o, (Parameterized, Variable)) and hasattr(o, "tensor"):
            if o.path_to(ctx.root) is not None:
                return o.tensor()
            return o
        try:
            scoped = object.__getattribute__(self, "scoped_keys")
        except AttributeError:
            scoped = ()
        if key in scoped and self.path_to(ctx.root) is not None:
            fn = o

            def _scoped(*args, _fn=fn, _name=self.long_name + "." + key, **kw):
                with jax.named_scope(_name):
                    return _fn(*args, **kw)

            return _scoped
        return o

    def __setattr__(self, key, value):
        if key in self.__dict__:
            p = object.__getattribute__(self, key)
            ctx = _ctx.current()
            # inside a trace, assignment to a child node is a feed
            if ctx is not None and isinstance(p, (Variable, Parameterized)):
                if p.path_to(ctx.root) is not None:
                    p.feed(value)
                    return
            if isinstance(p, Variable):
                if isinstance(value, (float, int)):
                    value = np.array([value], dtype=np_float())
                if isinstance(value, (np.ndarray, jnp.ndarray)):
                    p.assign(np.asarray(value))
                    return
            if isinstance(p, (Variable, Parameterized)) and isinstance(
                value, (Variable, Parameterized)
            ):
                p._parent = None  # unlink the replaced node

        object.__setattr__(self, key, value)

        if isinstance(value, Parentable) and key != "_parent":
            value._parent = self

    # --- tree recursion ------------------------------------------------------
    @property
    def sorted_variables(self):
        """Direct children (Variable or Parameterized), name-sorted for a
        deterministic order (cf. param.py:455-465)."""
        variables = [
            child
            for key, child in self.__dict__.items()
            if isinstance(child, (Variable, Parameterized)) and key != "_parent"
        ]
        return sorted(variables, key=lambda x: x.name)

    def get_variables(self, collection=None):
        params = []
        for p in self.sorted_variables:
            params += p.get_variables(collection)
        return params

    @property
    def initialize_ops(self):
        params = []
        for p in self.sorted_variables:
            params += p.initialize_ops
        return params

    def finalize(self):
        for p in self.sorted_variables:
            p.finalize()

    def initialize(self):
        """Commit all staged assignments in the subtree."""
        for v in self.initialize_ops:
            v._commit()
        self.finalize()

    # --- functional param/data dict building ---------------------------------
    def param_dict(self, collection=None, exclude=None):
        """{relative-path: free-space value} over global Variables. With
        `collection`, only matching tags; with `exclude`, only NON-matching
        tags (used to build the frozen set)."""
        out = {}
        for v in self.get_variables():
            if v.collections in graph_key.not_parameters:
                continue
            if exclude is not None and _in_collections(exclude, v.collections):
                continue
            if exclude is None and not _in_collections(collection, v.collections):
                continue
            out[v.path_to(self)] = jnp.asarray(v.free_value)
        return out

    def set_param_dict(self, values):
        """Write back optimized free-space values into the tree leaves."""
        lookup = {v.path_to(self): v for v in self.get_variables()}
        for path, val in values.items():
            lookup[path].set_free_value(val)

    def data_dict(self):
        """{relative-path: full data array} over Data descendants."""
        out = {}
        for v in self.get_variables(graph_key.DATA):
            out[v.path_to(self)] = v.data
        return out

    # --- amortized feeding (cf. param.py:505-537) ----------------------------
    @property
    def feed_size(self):
        return int(
            np.sum([p.feed_size for p in self.get_variables(graph_key.LOCAL)], dtype=int)
        )

    def feed(self, x):
        """Feed tensor x into all LOCAL descendants by slicing the last axis
        at feed_size offsets, recursively in name-sorted child order."""
        locals_ = self.get_variables(graph_key.LOCAL)
        if len(locals_) == 0:
            return
        n_layers = locals_[0].n_layers
        for p in locals_:
            assert len(p.n_layers) == len(n_layers), (
                "n_layers of all the LOCAL variables should be same for using "
                "this method. If not, feed separately by hand instead."
            )
            assert all(n == n0 for n, n0 in zip(p.n_layers, n_layers))
        begin = 0
        for p in self.sorted_variables:
            fs = p.feed_size
            if fs > 0:
                p.feed(x[..., begin : begin + fs])
            begin += fs

    def get_feed_dict(self, minibatch_index=None):
        feed_dict = {}
        for p in self.sorted_variables:
            feed_dict.update(p.get_feed_dict(minibatch_index))
        return feed_dict

    # --- KL aggregation (cf. param.py:549-560) -------------------------------
    def KL(self, collection=None):
        kl_list = [
            p.KL(collection) for p in self.sorted_variables if hasattr(p, "KL")
        ]
        if len(kl_list) == 0:
            return jnp.zeros([], _float_type())
        out = kl_list[0]
        for k in kl_list[1:]:
            out = out + k
        return out

    def describe(self):
        """Human-readable tree summary: one line per leaf with shape,
        transform, collections, plus a parameter-count total."""
        lines = []
        total = 0
        for v in self.get_variables():
            kind = (
                v.collections
                if isinstance(v.collections, str)
                else ",".join(map(str, v.collections))
            )
            if v.collections in graph_key.not_parameters:
                size = getattr(v, "feed_size", 0)
                shape = tuple(getattr(v, "shape", ()))
                if v.collections is graph_key.DATA:
                    shape = np.shape(getattr(v, "data", ()))
            else:
                shape = np.shape(v.free_value)
                size = int(np.prod(shape)) if shape else 1
                total += size
            lines.append(
                "%-40s %-16s %-12s %s"
                % (v.path_to(self) or v.name, str(shape), kind, str(v.transform))
            )
        lines.append("trainable parameters: %d" % total)
        return "\n".join(lines)

    # --- checkpointing (cf. param.py:562-603) --------------------------------
    def save(self, save_path=None, global_step=None):
        """Save the subtree's global parameters, keyed by long_name, as an
        .npz archive. Returns the path written."""
        from ..utils import checkpoint as _chk

        return _chk.save(self, save_path, global_step=global_step)

    def restore(self, save_path=None):
        from ..utils import checkpoint as _chk

        _chk.restore(self, save_path)


class ParamList(Parameterized):
    """An ordered container of parameters; children are named item%i
    (cf. param.py:605-674)."""

    def __init__(self, list_of_params=[]):
        Parameterized.__init__(self)
        for item in list_of_params:
            assert isinstance(item, (Variable, Parameterized))
            item._parent = self
        self._list = list(list_of_params)

    @property
    def sorted_variables(self):
        return self._list

    def __len__(self):
        return len(self._list)

    def __getitem__(self, key):
        o = self._list[key]
        ctx = _ctx.current()
        # same swap rule as Parameterized.__getattribute__: any node exposing
        # tensor() (Variable, Variational) yields its tensor inside a trace.
        # (The reference's __getitem__ only swapped Variables,
        # param.py:644-653 — Variationals in a ParamList returned raw there.)
        if (
            ctx is not None
            and isinstance(o, (Variable, Parameterized))
            and hasattr(o, "tensor")
            and o.path_to(ctx.root) is not None
        ):
            return o.tensor()
        return o

    def append(self, item):
        assert isinstance(
            item, (Variable, Parameterized)
        ), "this object is for containing parameters"
        item._parent = self
        self._list.append(item)

    def __setitem__(self, key, value):
        p = self._list[key]
        if isinstance(value, np.ndarray):
            p.assign(value)
            return
        elif isinstance(value, (float, int)):
            p.assign(np.array([value], dtype=np_float()))
            return
        raise TypeError


class Data(Variable):
    """Data slot: in the reference a tf.placeholder fed per session.run
    (param.py:676-714); here the array lives on device and is passed into the
    jitted step as an argument, so swapping data never triggers a recompile."""

    def __init__(self, data):
        data = np.asarray(data)
        Variable.__init__(
            self, data.shape, n_layers=[], n_batch=None, collections=graph_key.DATA
        )
        self.data = self._cast(data)

    def _cast(self, array):
        if array.dtype in (np.float32, np.float64):
            return np.asarray(array, dtype=np_float())
        if array.dtype in (np.int16, np.int32, np.int64):
            return np.asarray(array, dtype=np.int32)
        raise NotImplementedError("unknown dtype %r" % array.dtype)

    def get_feed_dict(self, minibatch_index=None):
        return {self: self.data}

    def device_value(self):
        """The data as a device array, cached across calls — re-uploading a
        large dataset every optimize()/run() call costs seconds over slow
        host links. The cache invalidates when `data` is rebound (assign or
        streaming megabatch swap)."""
        if getattr(self, "_dev_of", None) is not id(self.data):
            self._dev = jnp.asarray(self.data)
            self._dev_of = id(self.data)
        return self._dev

    def assign(self, value):
        value = np.asarray(value)
        if not np.all(value.shape == self.data.shape):
            raise ValueError("The shape of data must be the same.")
        self.data = self._cast(value)

    @property
    def value(self):
        return self.data


class MinibatchData(Data):
    """Data whose first axis is the minibatch axis (param.py:716-739). The
    full array stays on device; the jitted train step gathers the minibatch
    with an on-device index draw — no host feed per step."""

    def __init__(self, data):
        data = np.asarray(data)
        Variable.__init__(
            self, data.shape[1:], n_layers=[], n_batch=None, collections=graph_key.DATA
        )
        self.data = self._cast(data)

    @property
    def data_size(self):
        return self.data.shape[0]

    def get_feed_dict(self, minibatch_index):
        if minibatch_index is None:
            return {}
        return {self: self.data[minibatch_index]}
