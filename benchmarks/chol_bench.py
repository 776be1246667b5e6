"""Size the small-Cholesky opportunity on TPU.

The headline GPR step is Cholesky-bound at n=40. Measure, inside a scanned
loop (dispatch amortized like the real trainer):

  chol_fwd      — L = cholesky(K + jitter I) per step
  chol_fwdbwd   — + gradient of sum(L) w.r.t. the gram's generator
  rbf_step      — the full RBF gram + cholesky + matvec fwd+bwd (GPR-shaped)
  nochol_step   — same step with cholesky replaced by tril(K) (cost floor)
"""
import sys, time, os

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def scan_time(step, init, iters=4000, reps=3):
    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (step(c), None), c, None, length=iters)[0]

    c = run(init)
    jax.block_until_ready(c)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        c = run(init)
        jax.block_until_ready(c)
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e6  # us/step


def main(n=40):
    key = jax.random.PRNGKey(0)
    X = jax.random.uniform(key, (n, 1), jnp.float32) * 6.0
    u = jax.random.normal(key, (n,), jnp.float32)

    def gram(ell):
        d2 = jnp.sum((X[:, None, :] - X[None, :, :]) ** 2, -1) / (ell**2)
        return jnp.exp(-0.5 * d2) + 1e-4 * jnp.eye(n)

    def chol_fwd(ell):
        L = jnp.linalg.cholesky(gram(ell))
        return ell + 1e-9 * L[0, 0]

    def chol_fwdbwd(ell):
        g = jax.grad(lambda e: jnp.sum(jnp.linalg.cholesky(gram(e))))(ell)
        return ell + 1e-9 * g

    def rbf_step(ell):
        def f(e):
            L = jnp.linalg.cholesky(gram(e))
            y = L @ u
            return jnp.sum(y * y)

        return ell + 1e-9 * jax.grad(f)(ell)

    def nochol_step(ell):
        def f(e):
            L = jnp.tril(gram(e))
            y = L @ u
            return jnp.sum(y * y)

        return ell + 1e-9 * jax.grad(f)(ell)

    init = jnp.float32(1.0)
    for name, step in [
        ("nochol_step", nochol_step),
        ("chol_fwd", chol_fwd),
        ("chol_fwdbwd", chol_fwdbwd),
        ("rbf_step", rbf_step),
    ]:
        print("%-12s %7.2f us/step" % (name, scan_time(step, init)), flush=True)


if __name__ == "__main__" and (len(sys.argv) < 2 or sys.argv[1] != "v"):
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40)


def variants(n=40):
    from jax.lax import linalg as lxl

    key = jax.random.PRNGKey(0)
    X = jax.random.uniform(key, (n, 1), jnp.float32) * 6.0
    u = jax.random.normal(key, (n,), jnp.float32)

    def gram(ell):
        d2 = jnp.sum((X[:, None, :] - X[None, :, :]) ** 2, -1) / (ell**2)
        return jnp.exp(-0.5 * d2) + 1e-4 * jnp.eye(n)

    def mk(chol):
        def step(ell):
            def f(e):
                y = chol(gram(e)) @ u
                return jnp.sum(y * y)
            return ell + 1e-9 * jax.grad(f)(ell)
        return step

    cases = {
        "jnp_chol": mk(jnp.linalg.cholesky),
        "nosym": mk(lambda A: lxl.cholesky(A, symmetrize_input=False)),
    }
    init = jnp.float32(1.0)
    for nm, st in cases.items():
        print("n=%d %-10s %7.2f us/step" % (n, nm, scan_time(st, init)), flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "v":
    for n in (40, 128):
        variants(n)
