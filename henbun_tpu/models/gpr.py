"""GP regression model family — the reference's flagship workload
(`/root/reference/notebooks/GaussianProcess.ipynb` cells 6-31): 1D GPR with a
fullrank Gaussian variational posterior over the whitened latent f, a Gaussian
or robust Student-t likelihood, and trainable kernel variance / lengthscale /
noise variance.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

import henbun_tpu as hb
from henbun_tpu import densities
from henbun_tpu.ops.linalg import matmul_hp, tri_solve


class GPR(hb.model.Model):
    """Whitened-parameterization GP regression:
    f = chol(K(X)) @ q * sqrt(k_var),  y ~ N(f, var) or St(f, var, 3).
    """

    def setUp(self, X, Y, q_shape="fullrank", kern=None, analytic_kl=False):
        self.X = hb.Data(X)
        self.Y = hb.Data(Y)
        # variational posterior over the whitened latent, one per datapoint:
        # shaped like Y ([n, 1]), NOT like X — with multi-dimensional inputs
        # (d > 1) the latent is still one value per row (X.shape, the
        # notebook's choice, coincides only because its inputs are 1-D)
        self.q = hb.variationals.Gaussian(
            shape=list(Y.shape), q_shape=q_shape, analytic_kl=analytic_kl
        )
        self.kern = kern if kern is not None else hb.gp.kernels.UnitRBF()
        # kernel and likelihood variances, positive-constrained
        self.k_var = hb.Variable(shape=[1], transform=hb.transforms.positive)
        self.var = hb.Variable(shape=[1], transform=hb.transforms.positive)

    def f_sample(self):
        """A posterior sample of the latent function at X (fresh noise each
        trace; the analog of the notebook's cell-17 op)."""
        return matmul_hp(self.kern.Cholesky(self.X), self.q) * jnp.sqrt(self.k_var)

    def predict_f(self, x_new, q_shape="diagonal"):
        """Posterior samples of f at new inputs x_new [n*, d] — the
        prediction API the reference lacks. Use with Model.draws:
        >>> bands = m.draws(lambda mm: mm.predict_f(grid), 100)
        """
        from henbun_tpu.gp.gp import whitened_conditional

        u = jnp.swapaxes(self.q, -1, -2)  # [1, n] whitened sample
        out = whitened_conditional(self.kern, x_new, self.X, u, q_shape)
        return jnp.swapaxes(out, -1, -2) * jnp.sqrt(self.k_var)

    @hb.AutoOptimize()
    def ELBO_gaussian(self):
        y_fit = self.f_sample()
        return jnp.sum(densities.gaussian(self.Y, y_fit, self.var)) - self.KL()

    @hb.AutoOptimize()
    def ELBO_student(self):
        """Robust regression variant: Student-t likelihood with 3 dof."""
        y_fit = self.f_sample()
        return jnp.sum(densities.student_t(self.Y, y_fit, self.var, 3.0)) - self.KL()

    @hb.AutoOptimize()
    def ELBO_analytic(self):
        """Closed-form expected log-likelihood (no f sampling): with the
        whitened q = scale * N(mu, S) and Lk = chol(K(X)),

            E[f] = sqrt(k_var) scale Lk mu
            V[f_i] = k_var scale^2 (Lk S Lk^T)_ii
            E[log N(y|f, var)] = log N(y | E[f], var) - V[f] / (2 var)

        With `analytic_kl=True` the whole objective is DETERMINISTIC, and
        since a fullrank Gaussian q over the whitened latent contains the
        exact posterior of this conjugate likelihood, the optimal ELBO equals
        the exact log marginal likelihood — which natural gradients reach in
        a few hundred steps where the reference's MC loop runs 20,000
        (GaussianProcess.ipynb cells 9-14)."""
        fmean, fvar = self._f_marginals()
        ell = jnp.sum(densities.gaussian(self.Y, fmean, self.var)) - jnp.sum(
            fvar
        ) / (2.0 * self.var[0])
        return ell - self.KL()

    @hb.AutoOptimize()
    def ELBO_student_quadrature(self):
        """Deterministic robust-regression ELBO: the Student-t likelihood has
        no closed-form Gaussian expectation, so integrate each marginal f_i
        with Gauss-Hermite quadrature (ops.quadrature) — the zero-variance
        counterpart of `ELBO_student`'s single-sample estimator."""
        from henbun_tpu.ops.quadrature import gauss_hermite_expectation

        fmean, fvar = self._f_marginals()
        y = self.Y[:, 0]

        def log_lik(f):  # f: [n, deg]
            return densities.student_t(y[:, None], f, self.var, 3.0)

        ell = jnp.sum(gauss_hermite_expectation(log_lik, fmean[:, 0], fvar))
        return ell - self.KL()

    @hb.AutoOptimize()
    def log_marginal_laplace_student(self):
        """Laplace evidence for the robust Student-t likelihood — the
        deterministic alternative to both the MC `ELBO_student` (cells 28-31
        of the reference notebook) and `ELBO_student_quadrature`: no
        variational posterior to fit at all. Optimizing this trains ONLY the
        hyperparameters (kernel, k_var, var); the latent posterior is the
        Newton mode + curvature computed inside every step
        (`inference/laplace.py`). Compile with plain Adam; q gets zero
        gradients and stays put."""
        from henbun_tpu.inference.laplace import laplace_whitened

        Lk = self.kern.Cholesky(self.X) * jnp.sqrt(self.k_var)
        res = laplace_whitened(
            lambda f: densities.student_t(self.Y, f, self.var, 3.0), Lk,
            fused=("student_t", {"y": self.Y, "var": self.var, "df": 3.0}),
        )
        return res.log_marginal

    @hb.AutoOptimize()
    def log_marginal_ep_student(self):
        """EP evidence for the robust Student-t likelihood — the
        moment-matching alternative to `log_marginal_laplace_student`.
        Student-t is not log-concave, so sites with negative incoming
        precision are clipped flat and the sweeps use conservative damping
        (0.3); check `ep().delta` when in doubt."""
        from henbun_tpu.inference.ep import ep_gp
        from henbun_tpu.ops.linalg import matmul_hp

        Lk = self.kern.Cholesky(self.X) * jnp.sqrt(self.k_var)
        K = matmul_hp(Lk, jnp.swapaxes(Lk, -1, -2))
        return ep_gp(
            lambda f: densities.student_t(self.Y, f, self.var, 3.0),
            K, sweeps=60, damping=0.3,
        ).log_marginal

    def predict_f_ep(self, x_new):
        """EP posterior marginals (mean [n*, 1], var [n*, 1]) of f at new
        inputs under the robust Student-t likelihood — the moment-matched
        counterpart of `predict_f_laplace`."""
        from henbun_tpu.inference.ep import ep_gp, ep_latent_marginals
        from henbun_tpu.ops.linalg import matmul_hp

        Lk = self.kern.Cholesky(self.X) * jnp.sqrt(self.k_var)
        K = matmul_hp(Lk, jnp.swapaxes(Lk, -1, -2))
        loglik = lambda f: densities.student_t(self.Y, f, self.var, 3.0)
        res = ep_gp(loglik, K, sweeps=60, damping=0.3)
        Ks = self.kern.K(self.X, x_new) * self.k_var
        kdiag = self.kern.Kdiag(x_new) * self.k_var[0]
        return ep_latent_marginals(res, K, Ks, kdiag)

    def laplace_student(self):
        """Full :class:`~henbun_tpu.inference.laplace.LaplaceResult` at the
        current hyperparameters: evaluate with ``m.run(GPR.laplace_student)``
        or call inside any traced method."""
        from henbun_tpu.inference.laplace import laplace_whitened

        Lk = self.kern.Cholesky(self.X) * jnp.sqrt(self.k_var)
        return laplace_whitened(
            lambda f: densities.student_t(self.Y, f, self.var, 3.0), Lk,
            fused=("student_t", {"y": self.Y, "var": self.var, "df": 3.0}),
        )

    def predict_f_laplace(self, x_new):
        """Laplace posterior marginals (mean [n*, 1], var [n*, 1]) of f at
        new inputs, deterministic (no draws needed):

            E[f*] = s A^T v_mode,  A = Lk^-1 K(X, x*),  s = sqrt(k_var)
            V[f*] = s^2 (Kdiag(x*) - colnorm(A)^2 + colnorm(G)^2),
            G = Lb^-1 A  (posterior-of-v part, B = Lb Lb^T from the mode)
        """
        from henbun_tpu.inference.laplace import (
            laplace_latent_marginals,
            laplace_whitened,
        )

        Lk = self.kern.Cholesky(self.X) * jnp.sqrt(self.k_var)
        loglik = lambda f: densities.student_t(self.Y, f, self.var, 3.0)
        res = laplace_whitened(loglik, Lk)
        Ks = self.kern.K(self.X, x_new) * self.k_var  # [n, n*]
        kdiag = self.kern.Kdiag(x_new) * self.k_var[0]  # [n*]
        return laplace_latent_marginals(loglik, Lk, res, Ks, kdiag)

    def _f_marginals(self):
        """Per-point Gaussian marginals of f under q: (mean [n, 1], var [n]),

            E[f] = sqrt(k_var) scale Lk mu
            V[f_i] = k_var scale^2 (Lk S Lk^T)_ii,  Lk = chol(K(X)).
        """
        from henbun_tpu.ops.linalg import fill_triangular

        q = self.__dict__["q"]  # the Variational node, not a sample
        mu = q.q_mu  # [n]
        Lk = self.kern.Cholesky(self.X)  # [n, n]
        s = jnp.sqrt(self.k_var) * jnp.reshape(q.scale, ())
        fmean = s * matmul_hp(Lk, mu[:, None])  # [n, 1]
        if q.q_shape == "diagonal":
            # (Lk diag(e^{2r}) Lk^T)_ii = sum_j Lk_ij^2 e^{2 r_j}
            fvar = jnp.square(s) * (
                jnp.square(Lk) @ jnp.exp(2.0 * q.q_sqrt)
            )  # [n]
        else:
            Lq = (
                fill_triangular(q.q_sqrt, q.size)
                if q.q_shape == "fullrank_packed"
                else jnp.tril(q.q_sqrt)
            )
            A = matmul_hp(Lk, Lq)  # [n, n]
            fvar = jnp.square(s) * jnp.sum(jnp.square(A), axis=1)
        return fmean, fvar


class GPRMarginal(hb.model.Model):
    """Exact-marginal GP regression: hyperparameters only, latent f
    integrated out analytically. `log_marginal` is the HMC/NUTS target for
    BASELINE config 4's "GP hyperparameters" half — sampling runs in free
    space with transform Jacobians added by inference.make_log_prob."""

    def setUp(self, X, Y, kern=None):
        self.X = hb.Data(X)
        self.Y = hb.Data(Y)
        self.kern = kern if kern is not None else hb.gp.kernels.UnitRBF()
        self.k_var = hb.Variable(shape=[1], transform=hb.transforms.positive)
        self.var = hb.Variable(shape=[1], transform=hb.transforms.positive)

    @hb.AutoOptimize()
    def log_marginal(self):
        """log N(y | 0, k_var*K + var*I) via the Cholesky-factor density
        (densities.multivariate_normal), plus weak LogNormal hyperpriors."""
        from henbun_tpu.ops.linalg import safe_cholesky

        K = self.k_var * self.kern.K(self.X)
        n = K.shape[0]
        S = K + self.var * jnp.eye(n, dtype=K.dtype)
        L = safe_cholesky(S, 1e-6)
        lml = densities.multivariate_normal(self.Y, jnp.zeros_like(self.Y), L)
        log_prior = (
            jnp.sum(densities.lognormal(self.kern.lengthscales, 0.0, 1.0))
            + jnp.sum(densities.lognormal(self.k_var, 0.0, 1.0))
            + jnp.sum(densities.lognormal(self.var, -2.0, 1.0))
        )
        return lml + log_prior

    def predict_f(self, x_new):
        """Exact GP posterior at new inputs, analytically:

            mean = K*n (Knn + var I)^-1 y
            cov  = K** - K*n (Knn + var I)^-1 Kn*

        (all kernel blocks scaled by k_var). Returns (mean [n*, 1],
        variance [n*, 1]) — no sampling; for hyperparameter-marginalized
        prediction, call under `Model.run` once per MCMC hyper draw."""
        from henbun_tpu.ops.linalg import safe_cholesky

        Knn = self.k_var * self.kern.K(self.X)
        n = Knn.shape[0]
        # default (1e-4-scale) jitter: gradients through a float32 Cholesky
        # NaN at ~1e-5 jitter on ill-conditioned grams even when the forward
        # pass succeeds, and callers may differentiate predictions
        L = safe_cholesky(Knn + self.var * jnp.eye(n, dtype=Knn.dtype))
        Ksn = self.k_var * self.kern.K(jnp.asarray(x_new), self.X)  # [n*, n]
        # A = L^-1 Kn*  -> mean = A^T (L^-1 y), cov_diag = k** - sum A^2
        import jax

        A = tri_solve(L, Ksn.T)  # [n, n*]
        alpha = tri_solve(L, self.Y)
        mean = A.T @ alpha  # [n*, 1]
        kss = self.k_var * self.kern.Kdiag(jnp.asarray(x_new))  # [n*]
        var = jnp.maximum(kss - jnp.sum(jnp.square(A), axis=0), 0.0)
        return mean, var[:, None]


def make_sine_dataset(n=40, noise=0.3, seed=0):
    """The notebook's synthetic dataset: y = sin(x) + eps on [0, 6]."""
    rng = np.random.default_rng(seed)
    X = np.linspace(0, 6, n).reshape(-1, 1).astype(np.float32)
    Y = (np.sin(X) + rng.normal(size=(n, 1)) * noise).astype(np.float32)
    return X, Y


class SparseGPRobust(hb.model.Model):
    """Deterministic ROBUST regression at inducing-point scale:
    y ~ Student-t(df)(f, var) with f a sparse GP — evidence-trained like
    `GPR.log_marginal_laplace_student` / `log_marginal_ep_student` but with
    every factorization m x m, so the heavy-tailed deterministic engines
    reach n >= 1e5 (the likelihood-agnostic rectangular `laplace_whitened`
    and `ep_gp_projected`; same DTC projection as `models.SparseGPC`).

    Student-t is NOT log-concave: the Laplace path relies on the
    saddle-free |W| Newton ladder, the EP path on clipped sites and
    conservative damping (0.3) — both behaviors inherited from the dense
    engines where they are measured and tested. Train FULL-BATCH (see
    SparseGPC's note on minibatch evidence).
    """

    def setUp(self, X, Y, num_inducing=64, kern=None, newton_iters=15,
              df=3.0, train_z=False, z_penalty=None, z_init=None):
        from ._zguard import setup_z_guard

        self.x = hb.MinibatchData(X)
        self.y = hb.MinibatchData(Y)
        self.n_data = X.shape[0]
        self._newton_iters = int(newton_iters)
        self._df = float(df)
        if z_init is not None:
            # explicit initial layout (the reference takes z as a plain
            # constructor argument, gp.py:86-97); the barrier onset and
            # the train_z free-space scale derive from THIS layout
            z = np.asarray(z_init, np.float32)
        else:
            z = np.quantile(
                np.asarray(X), np.linspace(0.0, 1.0, int(num_inducing)),
                axis=0,
            ).astype(np.float32)
        # frozen z by default — see SparseGPC.setUp (inducing-point
        # collision under evidence training); train_z=True opts in under
        # the collision barrier
        setup_z_guard(self, z, train_z, z_penalty, self.n_data)
        self.gp = hb.gp.SparseGP(
            kern if kern is not None else hb.gp.kernels.UnitRBF(), z,
            collections=None if train_z else ["inducing_z"],
            # free-space rescale: one Adam step moves z by ~lr * 5 d0, not
            # ~lr — unscaled z random-walks across its own inter-point
            # spacing at typical lr and lives INSIDE the collision barrier
            # (measured: penalty -66 nats/pt at n=1e5 m=128 Adam 0.05)
            z_scale=5.0 * self._z_d0 if train_z else None,
        )
        self.k_var = hb.Variable(shape=[1], transform=hb.transforms.positive)
        self.var = hb.Variable(shape=[1], transform=hb.transforms.positive)

    def _loglik(self):
        y, var, df = self.y, self.var, self._df
        return lambda f: densities.student_t(y, f, var, df)

    def _fused(self):
        """Closed-form spec so BATCHED traces take the fused Newton
        kernel (ops/pallas_newton.py); must mirror `_loglik`."""
        return ("student_t", {"y": self.y, "var": self.var, "df": self._df})

    def _A(self, x):
        LnT = self.gp._effective_LT(x)  # [m, B]
        return jnp.swapaxes(LnT, -1, -2) * jnp.sqrt(self.k_var)

    @hb.AutoOptimize()
    def log_marginal_laplace(self):
        """Sparse Laplace evidence (saddle-free Newton; IFT gradients)."""
        from henbun_tpu.inference.laplace import laplace_whitened

        from ._zguard import z_guard

        return laplace_whitened(
            self._loglik(), self._A(self.x),
            newton_iters=self._newton_iters, fused=self._fused(),
        ).log_marginal - z_guard(self)

    @hb.AutoOptimize()
    def log_marginal_ep(self):
        """Projected EP evidence through the UNROLLED sweeps
        (implicit_diff=False — measured at n=2e4 with 4% gross outliers:
        as the noise variance sharpens, the outlier sites collectively
        thrash between explaining and rejecting their point and the mean
        site residual grows to ~0.2 regardless of damping/sweeps
        (0.05-0.3 / 60-480 swept), so the stationarity premise of the
        fixed-point gradient is structurally violated and the guard
        rightly aborts it. Reverse-mode through the damped sweeps needs
        no premise; the fit matches the Laplace engine (RMSE ~0.005 on
        the outlier bed). Clipped sites + damping 0.3 as in the dense
        Student-t engine."""
        from henbun_tpu.inference.ep import ep_gp_projected

        from ._zguard import z_guard

        return ep_gp_projected(
            self._loglik(), self._A(self.x), sweeps=60, damping=0.3,
            implicit_diff=False,
        ).log_marginal - z_guard(self)

    # --- Bayesian hyperparameters (inference/api.py samplers) ---------------
    def _hyperprior(self):
        """Weak lognormal(0, 4) log-priors on (k_var, noise var, kernel
        lengthscales) — keeps the sampling target proper. Override to
        change."""
        p = jnp.sum(densities.lognormal(self.k_var, 0.0, 4.0))
        p = p + jnp.sum(densities.lognormal(self.var, 0.0, 4.0))
        ls = getattr(self.gp.kern, "lengthscales", None)
        if ls is not None:
            p = p + jnp.sum(densities.lognormal(ls, 0.0, 4.0))
        return p

    @hb.AutoOptimize()
    def log_posterior(self):
        """Sparse robust (Student-t) Laplace evidence + weak hyperpriors:
        ``hb.inference.sample_posterior(m, "log_posterior")`` gives Bayesian
        hyperparameters for heavy-tailed regression at inducing-point scale
        (see `SparseGPC.log_posterior`)."""
        from henbun_tpu.inference.laplace import laplace_whitened

        from ._zguard import z_guard

        ev = laplace_whitened(
            self._loglik(), self._A(self.x),
            newton_iters=self._newton_iters, fused=self._fused(),
        ).log_marginal
        return ev - z_guard(self) + self._hyperprior()

    def predict_f(self, x_new):
        """Laplace posterior marginals (mean [n*, 1], var [n*, 1]) of the
        latent at new inputs, residual (FITC) variance restored."""
        from henbun_tpu.inference.laplace import (
            laplace_projected_marginals,
            laplace_whitened,
        )

        loglik = self._loglik()
        A = self._A(self.x)
        res = laplace_whitened(
            loglik, A, newton_iters=self._newton_iters
        )
        x_new = jnp.asarray(x_new)
        LsT = self.gp._effective_LT(x_new)
        Astar = jnp.swapaxes(LsT, -1, -2) * jnp.sqrt(self.k_var)
        corr = (
            jnp.maximum(
                self.gp._additional_cov(x_new, LsT, "diagonal"), 0.0
            )
            * self.k_var[0]
        )
        return laplace_projected_marginals(loglik, A, res, Astar, corr)

    def predict_f_ep(self, x_new):
        """EP posterior marginals at new inputs — the moment-matched
        counterpart of `predict_f`."""
        from henbun_tpu.inference.ep import (
            ep_gp_projected,
            ep_projected_marginals,
        )

        A = self._A(self.x)
        res = ep_gp_projected(
            self._loglik(), A, sweeps=60, damping=0.3
        )
        x_new = jnp.asarray(x_new)
        LsT = self.gp._effective_LT(x_new)
        Astar = jnp.swapaxes(LsT, -1, -2) * jnp.sqrt(self.k_var)
        corr = (
            jnp.maximum(
                self.gp._additional_cov(x_new, LsT, "diagonal"), 0.0
            )
            * self.k_var[0]
        )
        return ep_projected_marginals(res, A, Astar, corr)
