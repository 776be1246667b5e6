"""Roofline / MFU accounting for the compute-bound paths (VERDICT r3 #3).

For each path: analytic FLOPs (formula stated inline), XLA's own
cost-analysis FLOPs where available, measured steady-state rate (scanned
loop, dispatch amortized), achieved FLOP/s, and the fraction of v5e peak.

Peak model: the v5e datasheet bf16 MXU peak is 197 TFLOP/s. The fp32
ceiling is NOT assumed — a 2048^3 ``precision=HIGHEST`` f32 matmul is
measured first and its rate becomes the EMPIRICAL attainable peak that
every MFU%% divides by. (Measured on this chip: 148-164 TF/s across
sessions, 75-83%% of the bf16 datasheet number — the folk rule "f32 = bf16/4 via multi-pass" is
off by 4x here, so an assumed denominator would overstate every MFU
figure; all henbun_tpu numerics are f32 HIGHEST, CLAUDE.md.)

FLOP conventions (LINPACK): cholesky(n) = n^3/3; triangular solve with m
RHS = n^2 m; matmul [a,b]x[b,c] = 2abc. Cost-analysis FLOPs are XLA's
count for the WHOLE jitted step (forward + backward + update), which is
what the MFU numbers use when available; analytic numbers size the
dominant kernel alone.

Usage: python benchmarks/roofline_bench.py [--iters 2000]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

PEAK_BF16 = 197e12  # datasheet, for reference only
PEAK_MEAS = [None]  # filled by the sanity matmul rows


def scan_rate(step, init, iters, reps=3):
    """Steady-state us/iter of `carry -> carry` inside one jitted scan."""

    @jax.jit
    def run(c):
        return jax.lax.scan(
            lambda c, _: (step(c), None), c, None, length=iters
        )[0]

    c = run(init)
    jax.block_until_ready(c)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(init))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def xla_flops(fn, *args):
    """XLA cost-analysis FLOPs for one call of `fn(*args)`, or None."""
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", None))
    except Exception:
        return None


def row(name, flops, sec, note=""):
    gf = flops / sec / 1e9
    peak = PEAK_MEAS[0] if PEAK_MEAS[0] else PEAK_BF16
    print(
        "%-44s %10.3g FLOP %9.1f us %9.1f GFLOP/s  %6.2f%% MFU  %5.2f%% bf16-ds  %s"
        % (
            name,
            flops,
            sec * 1e6,
            gf,
            100.0 * gf * 1e9 / peak,
            100.0 * gf * 1e9 / PEAK_BF16,
            note,
        )
    )
    return gf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    args = ap.parse_args()
    key = jax.random.PRNGKey(0)

    # ---- sanity: can this chip actually reach the assumed peaks? ----------
    # a 2048^3 matmul is the most MXU-friendly op there is; these rows
    # CALIBRATE the peak assumption the MFU%s below divide by.
    for dt, name in ((jnp.float32, "f32 HIGHEST"), (jnp.bfloat16, "bf16")):
        M = jax.random.normal(key, (2048, 2048), dt)

        def stepmm(c, M=M, dt=dt):
            P = jax.lax.dot_general(
                M + c.astype(dt) * 0, M,
                (((1,), (0,)), ((), ())),
                precision=(jax.lax.Precision.HIGHEST
                           if dt == jnp.float32 else None),
            )
            return c + P[0, 0].astype(jnp.float32) * 1e-30

        sec = scan_rate(stepmm, jnp.float32(0.0), max(args.iters // 4, 200))
        gf = row("sanity matmul 2048^3 %s" % name, 2 * 2048**3, sec)
        PEAK_MEAS[0] = max(PEAK_MEAS[0] or 0.0, gf * 1e9)
    print("empirical peak (MFU denominator): %.1f TF/s   "
          "bf16 datasheet: %.0f TF/s" % (PEAK_MEAS[0] / 1e12, PEAK_BF16 / 1e12))

    # ---- Pallas cholesky128_vbatched --------------------------------------
    from henbun_tpu.ops.pallas_chol import cholesky128_vbatched
    from henbun_tpu.ops.pallas_solve import tri_solve128_vbatched

    n = 128
    # B beyond ~16 exceeds the kernel's scoped VMEM (whole batch is
    # vectorized in-register by design; the batched trainer uses B=16)
    for B in (8, 16):
        A = jax.random.normal(key, (B, n, n), jnp.float32)
        A = A @ jnp.swapaxes(A, -1, -2) + n * jnp.eye(n)

        def step(c, A=A):
            L = cholesky128_vbatched(A + c * 1e-30)
            return c + L[0, 0, 0] * 1e-30

        sec = scan_rate(step, jnp.float32(0.0), args.iters)
        row("pallas chol128_vbatched B=%d (n^3/3 each)" % B,
            B * n**3 / 3.0, sec)

        # XLA's batched cholesky on the same shapes, for context: these
        # small-matrix paths are SERIALIZATION-bound, not FLOP-bound — the
        # Pallas win is wall-clock vs this row, not MFU
        def stepx(c, A=A):
            L = jnp.linalg.cholesky(A + c * 1e-30)
            return c + L[0, 0, 0] * 1e-30

        sec = scan_rate(stepx, jnp.float32(0.0), args.iters)
        row("  xla batched cholesky B=%d" % B, B * n**3 / 3.0, sec)

    for B in (8, 16):
        A = jax.random.normal(key, (B, n, n), jnp.float32)
        L = jnp.linalg.cholesky(
            A @ jnp.swapaxes(A, -1, -2) + n * jnp.eye(n)
        )
        Rhs = jax.random.normal(key, (B, n, n), jnp.float32)

        def step(c, L=L, Rhs=Rhs):
            Xs = tri_solve128_vbatched(L, Rhs + c * 1e-30)
            return c + Xs[0, 0, 0] * 1e-30

        sec = scan_rate(step, jnp.float32(0.0), args.iters)
        row("pallas tri_solve128_vbatched B=%d (n^2 m)" % B,
            B * n**2 * n, sec)

        def stepx(c, L=L, Rhs=Rhs):
            Xs = jax.scipy.linalg.solve_triangular(
                L, Rhs + c * 1e-30, lower=True
            )
            return c + Xs[0, 0, 0] * 1e-30

        sec = scan_rate(stepx, jnp.float32(0.0), args.iters)
        row("  xla batched triangular_solve B=%d" % B, B * n**2 * n, sec)

    # ---- exact-gram GPR evidence step (the n^3 family) --------------------
    # the GPRMarginal hot path verbatim: RBF gram -> safe-free cholesky ->
    # solve + logdet, forward + reverse. Dominant kernel: chol n^3/3 fwd +
    # ~2 trsm in the backward.
    from henbun_tpu.ops.linalg import safe_cholesky, tri_solve

    # "lib" rows run safe_cholesky (the library path: custom-VJP backward,
    # Murray's algorithm via the tri-solve dispatches); "xla" rows run
    # jnp.linalg.cholesky with XLA's native factorization gradient. At
    # n >= 2048 the difference isolates the custom backward's cost (the
    # blocked forward dispatch was measured and KILLED, PERF.md §Roofline)
    for ngram, variants in (
        (512, ("lib",)),
        (1024, ("lib",)),
        (2048, ("lib", "xla")),
        (4096, ("lib", "xla")),
    ):
        X = jax.random.uniform(key, (ngram, 1), jnp.float32) * 6.0
        y = jnp.sin(X[:, 0]) + 0.1 * jax.random.normal(key, (ngram,))

        for variant in variants:
            def logml(ell, X=X, y=y, ngram=ngram, variant=variant):
                d2 = jnp.sum((X[:, None, :] - X[None, :, :]) ** 2, -1) / ell**2
                K = jnp.exp(-0.5 * d2) + 1e-4 * jnp.eye(ngram)
                L = (
                    safe_cholesky(K, 0.0)
                    if variant == "lib"
                    else jnp.linalg.cholesky(K)
                )
                a = tri_solve(L, y[:, None])
                return -0.5 * jnp.sum(a * a) - jnp.sum(
                    jnp.log(jnp.diagonal(L))
                )

            grad = jax.grad(logml)
            fl = xla_flops(lambda e: (logml(e), grad(e)), jnp.float32(1.0))

            def step(c, logml=logml, grad=grad):
                v, g = logml(c), grad(c)
                return c + 1e-30 * (v + g)

            iters = max(args.iters // 4 // max(ngram // 1024, 1) ** 2, 8)
            sec = scan_rate(step, jnp.float32(1.0), iters)
            analytic = ngram**3 / 3.0 * 3.0  # fwd chol + ~2 chol-sized bwd
            row("exact-gram evidence n=%d fwd+bwd (%s)" % (ngram, variant),
                fl if fl else analytic, sec,
                note="(xla count)" if fl else "(analytic est)")

    # ---- SVGP m=128 analytic ELBO step ------------------------------------
    m_ind = 128
    batch = 512
    z = jnp.linspace(0.0, 6.0, m_ind)[:, None]
    xb = jax.random.uniform(key, (batch, 1), jnp.float32) * 6.0
    yb = jnp.sin(xb[:, 0])
    q_mu0 = jnp.zeros((m_ind,))
    q_sqrt0 = jnp.eye(m_ind)

    def elbo(params, xb=xb, yb=yb):
        q_mu, q_sqrt, ell = params
        d2m = jnp.sum((z[:, None, :] - z[None, :, :]) ** 2, -1) / ell**2
        Kmm = jnp.exp(-0.5 * d2m) + 1e-4 * jnp.eye(m_ind)
        Lm = jnp.linalg.cholesky(Kmm)
        d2c = jnp.sum((z[:, None, :] - xb[None, :, :]) ** 2, -1) / ell**2
        Kmn = jnp.exp(-0.5 * d2c)
        Bproj = tri_solve(Lm, Kmn)  # [m, B]
        mean = Bproj.T @ q_mu
        T = jnp.tril(q_sqrt).T @ Bproj
        qvar = jnp.sum(T * T, axis=0)
        corr = 1.0 - jnp.sum(Bproj * Bproj, axis=0)
        var = jnp.maximum(qvar + corr, 0.0)
        ell_term = -0.5 * jnp.sum(jnp.square(yb - mean) + var)
        Lq = jnp.tril(q_sqrt)
        kl = 0.5 * (
            jnp.sum(q_mu * q_mu)
            + jnp.sum(Lq * Lq)
            - 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(Lq))))
            - m_ind
        )
        return ell_term - kl

    grad_e = jax.grad(elbo)
    p0 = (q_mu0, q_sqrt0, jnp.float32(1.0))
    fl = xla_flops(lambda p: (elbo(p), grad_e(p)), p0)

    def stepsv(p):
        v = elbo(p)
        g = grad_e(p)
        return jax.tree_util.tree_map(lambda a, b: a + 1e-30 * b, p,
                                      jax.tree_util.tree_map(
                                          lambda x: x * 0 + v, g))

    sec = scan_rate(stepsv, p0, max(args.iters // 2, 500))
    analytic = (
        m_ind**3 / 3.0            # chol Kmm
        + m_ind**2 * batch        # Lm^-1 Kmn
        + 2 * m_ind**2 * batch    # Lq^T Bproj
    ) * 3.0                       # fwd + ~2x bwd
    row("SVGP m=128 analytic ELBO B=512 fwd+bwd",
        fl if fl else analytic, sec,
        note="(xla count)" if fl else "(analytic est)")

    # ---- the latency-bound headline, for contrast -------------------------
    n40 = 40
    X40 = jax.random.uniform(key, (n40, 1), jnp.float32) * 6.0
    y40 = jnp.sin(X40[:, 0])

    def logml40(ell):
        d2 = jnp.sum((X40[:, None, :] - X40[None, :, :]) ** 2, -1) / ell**2
        K = jnp.exp(-0.5 * d2) + 1e-4 * jnp.eye(n40)
        L = jnp.linalg.cholesky(K)
        a = tri_solve(L, y40[:, None])
        return -0.5 * jnp.sum(a * a) - jnp.sum(jnp.log(jnp.diagonal(L)))

    g40 = jax.grad(logml40)
    fl40 = xla_flops(lambda e: (logml40(e), g40(e)), jnp.float32(1.0))

    def step40(c):
        return c + 1e-30 * (logml40(c) + g40(c))

    sec40 = scan_rate(step40, jnp.float32(1.0), args.iters)
    gf = row("headline-shaped GPR n=40 fwd+bwd", fl40 or 2e5, sec40,
             note="(LATENCY-bound)")
    print(
        "  -> n=40 step at the empirical peak would take %.3f us; measured"
        " %.1f us => %.1f%% of the step is latency/bandwidth, not MXU math"
        % (
            (fl40 or 2e5) / PEAK_MEAS[0] * 1e6,
            sec40 * 1e6,
            100.0 * (1.0 - (fl40 or 2e5) / PEAK_MEAS[0] / sec40),
        )
    )


if __name__ == "__main__":
    main()
