"""Property test: for RANDOM nested trees of LOCAL leaves, the recursive
feed-slab unpacking must equal an independently computed numpy layout
(recursive name-sorted pre-order with feed_size offsets) — the contract the
amortized-inference encoder relies on (reference param.py:516-537)."""
import numpy as np
import jax
import jax.numpy as jnp

import henbun_tpu as hb


def build_random_tree(rng, depth=0):
    """Random Parameterized tree with LOCAL Variable leaves; returns
    (node, layout) where layout lists (path-ish key, shape) in the recursive
    name-sorted order the feed must follow."""
    node = hb.Parameterized()
    n_children = rng.integers(1, 4)
    names = sorted(
        rng.choice(
            ["alpha", "beta", "gamma", "delta", "eps", "zeta"],
            size=n_children,
            replace=False,
        )
    )
    layout = []
    for name in names:  # name-sorted construction order
        if depth < 2 and rng.uniform() < 0.4:
            child, sub = build_random_tree(rng, depth + 1)
            setattr(node, name, child)
            layout.extend([(name + "." + k, s) for k, s in sub])
        else:
            shape = [int(rng.integers(1, 4)) for _ in range(int(rng.integers(1, 3)))]
            setattr(
                node,
                name,
                hb.Variable(shape, collections=hb.graph_key.LOCAL),
            )
            layout.append((name, shape))
    return node, layout


def test_random_tree_feed_layout_property():
    for seed in range(12):
        rng = np.random.default_rng(seed)
        m = hb.model.Model(seed=0)
        tree, layout = build_random_tree(rng)
        m.tree = tree
        fs = m.feed_size
        assert fs == sum(int(np.prod(s)) for _, s in layout)
        N = 3
        slab = rng.normal(size=(N, fs)).astype(np.float32)

        def fn(mm):
            mm.feed(jnp.asarray(slab))
            out = {}
            for key, shape in layout:
                node = mm.__dict__["tree"]
                parts = key.split(".")
                for p in parts[:-1]:
                    node = node.__dict__[p]
                leaf = node.__dict__[parts[-1]]
                out[key] = leaf.tensor()
            return out

        fed = m.run(fn, key=jax.random.PRNGKey(0))
        off = 0
        for key, shape in layout:
            size = int(np.prod(shape))
            expected = slab[:, off : off + size].reshape((N,) + tuple(shape))
            assert np.allclose(np.asarray(fed[key]), expected), (seed, key)
            off += size
