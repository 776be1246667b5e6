"""Microbench: strategies for unpacking a packed lower triangle on TPU.

The fullrank_packed posterior stores q_sqrt as the n(n+1)/2 row-major lower
triangle and must materialize the [n, n] tril factor (or its matvec) every
step. Candidates:

  scatter   — zeros.at[rows, cols].set(vec)            (current impl)
  gather    — vec[..., idx] * mask                     (static 2D gather)
  fliprs    — permute vec once, then concat/flip/reshape/tril
              (TFP fill_triangular trick: no scatter, one 1D gather)
  dense     — baseline: q_sqrt stored dense [n, n], jnp.tril (reference layout)

Each is measured inside the realistic op: y = tril @ u for a batch of u,
plus grad through it (the training step differentiates the sample).
"""
import sys, time, functools

sys.path.insert(0, "/root/repo")
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def _rowmajor_perm_for_fliprs(n):
    """Permutation p such that fliprs applied to vec[p] reproduces the
    row-major tril. We compute it by inverting the fliprs layout."""
    m = n * (n + 1) // 2
    # fliprs: x = concat([w[n:], flip(w)]) .reshape(n, n); tril picked.
    # Find, for each row-major tril slot (i, j), which w-index lands there.
    probe = np.arange(m)
    x = np.concatenate([probe[n:], probe[::-1]])
    mat = x.reshape(n, n)
    rows, cols = np.tril_indices(n)
    w_index_at_slot = mat[rows, cols]  # w index that lands at (i,j)
    # we want vec (row-major) to appear at slot: w[p] = vec  =>  w_index -> vec index
    perm = np.empty(m, np.int64)
    perm[:] = 0
    # slot k (row-major) gets w index w_index_at_slot[k]; we need w = vec[inv]
    # such that w[w_index_at_slot[k]] == vec[k]
    inv = np.empty(m, np.int64)
    inv[w_index_at_slot] = np.arange(m)
    return inv


def make_fns(n, batch=256):
    m = n * (n + 1) // 2
    rows, cols = np.tril_indices(n)
    rows = jnp.asarray(rows, jnp.int32)
    cols = jnp.asarray(cols, jnp.int32)
    idx2d = np.zeros((n, n), np.int32)
    mask = np.zeros((n, n), np.float32)
    k = 0
    for i in range(n):
        for j in range(i + 1):
            idx2d[i, j] = k
            mask[i, j] = 1.0
            k += 1
    idx2d = jnp.asarray(idx2d)
    mask = jnp.asarray(mask)
    perm = jnp.asarray(_rowmajor_perm_for_fliprs(n))

    def scatter(vec):
        out = jnp.zeros((n, n), vec.dtype)
        return out.at[rows, cols].set(vec)

    def gather(vec):
        return vec[idx2d] * mask

    def fliprs(vec):
        w = vec[perm]
        x = jnp.concatenate([w[n:], w[::-1]])
        return jnp.reshape(x, (n, n)) * mask

    def dense(mat):
        return jnp.tril(mat)

    return dict(scatter=scatter, gather=gather, fliprs=fliprs, dense=dense), m


def bench(n=512, batch=256, reps=200):
    fns, m = make_fns(n, batch)
    key = jax.random.PRNGKey(0)
    vec = jax.random.normal(key, (m,), jnp.float32)
    mat = jax.random.normal(key, (n, n), jnp.float32)
    u = jax.random.normal(key, (batch, n), jnp.float32)

    results = {}
    for name, unpack in fns.items():
        arg = mat if name == "dense" else vec

        def loss(a, u):
            L = unpack(a)
            y = u @ L.T
            return jnp.sum(y * y)

        g = jax.jit(jax.grad(loss))
        out = g(arg, u)
        out.block_until_ready()
        best = np.inf
        for trial in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = g(arg, u)
            out.block_until_ready()
            best = min(best, (time.perf_counter() - t0) / reps)
        results[name] = best * 1e6
    return results


if __name__ == "__main__":
    # correctness cross-check on CPU shapes first
    fns, m = make_fns(8)
    v = jnp.arange(m, dtype=jnp.float32) + 1.0
    ref = np.asarray(fns["scatter"](v))
    for nm in ("gather", "fliprs"):
        got = np.asarray(fns[nm](v))
        assert np.array_equal(ref, got), (nm, ref, got)
    print("layout check OK", flush=True)
    for n in (128, 512, 1024):
        r = bench(n=n)
        print(
            "n=%4d  " % n
            + "  ".join("%s=%.1fus" % (k, v) for k, v in r.items()),
            flush=True,
        )


def bench2(n=512, batch=256, reps=200):
    """forward-only vs grad, plus a no-permutation fill-triangular variant."""
    fns, m = make_fns(n, batch)
    k = jax.random.PRNGKey(0)
    vec = jax.random.normal(k, (m,), jnp.float32)
    mat = jax.random.normal(k, (n, n), jnp.float32)
    u = jax.random.normal(k, (batch, n), jnp.float32)
    mask = jnp.asarray(np.tril(np.ones((n, n), np.float32)))

    def fillt(vec):  # TFP order, NO input permutation
        x = jnp.concatenate([vec[n:], vec[::-1]])
        return jnp.reshape(x, (n, n)) * mask

    cases = dict(fns)
    cases["fillt"] = fillt
    out = {}
    for name, unpack in cases.items():
        arg = mat if name == "dense" else vec

        def loss(a, u):
            L = unpack(a)
            y = u @ L.T
            return jnp.sum(y * y)

        for tag, f in (("f", jax.jit(loss)), ("g", jax.jit(jax.grad(loss)))):
            r = f(arg, u); jax.block_until_ready(r)
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(reps):
                    r = f(arg, u)
                jax.block_until_ready(r)
                best = min(best, (time.perf_counter() - t0) / reps)
            out[name + ":" + tag] = best * 1e6
    return out


if len(sys.argv) > 1 and sys.argv[1] == "2":
    for n in (512, 1024):
        r = bench2(n=n)
        print("n=%4d  " % n + "  ".join("%s=%.0fus" % (kk, vv) for kk, vv in sorted(r.items())), flush=True)
