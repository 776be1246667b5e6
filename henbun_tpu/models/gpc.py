"""Binary GP classification via Laplace or expectation propagation.

The GPML ch. 3 classic, TPU-shaped: the Bernoulli-sigmoid likelihood is
log-concave, so the whitened Newton mode (`inference/laplace.py`, one
static-trip-count XLA scan) IS the posterior mode, the evidence trains the
hyperparameters with no variational parameters at all, and prediction is
deterministic — latent marginals from the mode curvature, then the
predictive probability by Gauss-Hermite quadrature of the sigmoid. The EP
counterparts (`log_marginal_ep` / `predict_p_ep`, inference/ep.py) match
moments instead of curvature — GPML ch. 3.6's accuracy reference for this
model, at the cost of ~30 damped parallel sweeps instead of ~15 Newton
iterations.

Two scales share this module:

* ``GPC`` — the exact-gram, full-batch classifier for n up to a few
  thousand per chip (O(n^3) factorizations).
* ``SparseGPC`` — the INDUCING-POINT Laplace classifier: the same
  deterministic evidence and predictive pipeline at n >= 1e5, every
  factorization m x m (the reference's own scaling hook, its inducing-point
  approximation `/root/reference/Henbun/gp/gp.py:53-143`, applied to the
  deterministic engine instead of the sampling path). With z = X it IS
  GPC's Laplace (pinned by a test).

Complements `SVGPClassification` (models/svgp.py — minibatched inducing
point quadrature/MC-VI): these train hyperparameters by evidence with no
variational parameters at all. The reference ships the (broken)
`densities.bernoulli` and no classifier at all
(`/root/reference/Henbun/densities.py:35-36`).

Labels y are {0, 1} floats of shape [n, 1].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

import henbun_tpu as hb


def _bernoulli_logit(y, f):
    """Elementwise log p(y | f) = y log sigmoid(f) + (1-y) log sigmoid(-f),
    computed via log_sigmoid for stability at large |f|."""
    return y * jax.nn.log_sigmoid(f) + (1.0 - y) * jax.nn.log_sigmoid(-f)


class GPC(hb.model.Model):
    """Laplace GP binary classifier: p(y=1 | x) = sigmoid(f(x)),
    f ~ GP(0, k_var * k(x, x'))."""

    def setUp(self, X, Y, kern=None):
        self.X = hb.Data(X)
        self.Y = hb.Data(Y)
        self.kern = kern if kern is not None else hb.gp.kernels.UnitRBF()
        self.k_var = hb.Variable(shape=[1], transform=hb.transforms.positive)

    def _loglik(self):
        Y = self.Y
        return lambda f: _bernoulli_logit(Y, f)

    def _fused(self):
        """Closed-form spec for the fused batched Newton kernel."""
        return ("bernoulli_logit", {"y": self.Y})

    def _Lk(self):
        return self.kern.Cholesky(self.X) * jnp.sqrt(self.k_var)

    @hb.AutoOptimize()
    def log_marginal_laplace(self):
        """Laplace evidence — deterministic, trains kernel hyperparameters
        through the unrolled Newton loop."""
        from henbun_tpu.inference.laplace import laplace_whitened

        return laplace_whitened(
            self._loglik(), self._Lk(), fused=self._fused()
        ).log_marginal

    def laplace(self):
        """Full :class:`~henbun_tpu.inference.laplace.LaplaceResult` at the
        current hyperparameters (evaluate with ``m.run(GPC.laplace)``)."""
        from henbun_tpu.inference.laplace import laplace_whitened

        return laplace_whitened(self._loglik(), self._Lk(),
                                fused=self._fused())

    def predict_p(self, x_new, deg=20):
        """Posterior predictive p(y=1 | x_new) [n*, 1], deterministic:
        latent Laplace marginals, then E[sigmoid(f*)] by `deg`-point
        Gauss-Hermite quadrature (exact enough that MacKay's probit shortcut
        is unnecessary)."""
        from henbun_tpu.inference.laplace import (
            laplace_latent_marginals,
            laplace_whitened,
        )
        from henbun_tpu.ops.quadrature import gauss_hermite_expectation

        loglik = self._loglik()
        Lk = self._Lk()
        res = laplace_whitened(loglik, Lk, fused=self._fused())
        Ks = self.kern.K(self.X, x_new) * self.k_var
        kdiag = self.kern.Kdiag(x_new) * self.k_var[0]
        mean, var = laplace_latent_marginals(loglik, Lk, res, Ks, kdiag)
        p = gauss_hermite_expectation(
            lambda f: jax.nn.sigmoid(f), mean[:, 0], var[:, 0], deg=deg
        )
        return p[:, None]

    # --- expectation propagation (inference/ep.py) ------------------------
    def _K(self):
        """Scaled gram — EP's stable forms want K itself, not its factor."""
        X = self.X
        Lk = self.kern.Cholesky(X)  # reuse the jittered construction
        from henbun_tpu.ops.linalg import matmul_hp

        return matmul_hp(Lk, jnp.swapaxes(Lk, -1, -2)) * self.k_var

    @hb.AutoOptimize()
    def log_marginal_ep(self):
        """EP evidence — deterministic like the Laplace one, usually a
        tighter approximation for classification (GPML ch. 3.6); trains the
        hyperparameters through the unrolled damped sweeps."""
        from henbun_tpu.inference.ep import ep_gp

        return ep_gp(self._loglik(), self._K()).log_marginal

    def ep(self, sweeps=30, damping=0.5):
        """Full :class:`~henbun_tpu.inference.ep.EPResult` at the current
        hyperparameters (evaluate with ``m.run(GPC.ep)``)."""
        from henbun_tpu.inference.ep import ep_gp

        return ep_gp(self._loglik(), self._K(), sweeps=sweeps, damping=damping)

    def predict_p_ep(self, x_new, deg=20):
        """Posterior predictive p(y=1 | x_new) [n*, 1] under the EP
        posterior — the accuracy reference for binary GP classification
        (EP's moment matching beats Laplace's mode curvature)."""
        from henbun_tpu.inference.ep import ep_gp, ep_latent_marginals
        from henbun_tpu.ops.quadrature import gauss_hermite_expectation

        K = self._K()
        res = ep_gp(self._loglik(), K)
        Ks = self.kern.K(self.X, x_new) * self.k_var
        kdiag = self.kern.Kdiag(x_new) * self.k_var[0]
        mean, var = ep_latent_marginals(res, K, Ks, kdiag)
        p = gauss_hermite_expectation(
            lambda f: jax.nn.sigmoid(f), mean[:, 0], var[:, 0], deg=deg
        )
        return p[:, None]


class SparseGPC(hb.model.Model):
    """Inducing-point Laplace GP binary classifier: deterministic
    non-Gaussian training, evidence and prediction at large n.

    DTC projection: the likelihood sees f = A v with
    A = sqrt(k_var) (Lm^-1 K(z, x))^T [n, m] and a whitened inducing latent
    v ~ N(0, I_m) — `laplace_whitened` accepts the rectangular projection
    directly, so the Newton mode, IFT evidence gradients and curvature all
    factorize m x m: O(n m^2 + m^3) per iteration instead of the exact
    gram's O(n^3). Prediction restores the residual (FITC) variance the
    projection can't express via `_additional_cov`, then Gauss-Hermite
    integrates the sigmoid — the same pipeline as GPC.

    Train FULL-BATCH (the Newton mode is a deterministic function of all
    fed rows; optimize() without minibatch_size). A minibatch objective
    would be the Laplace evidence OF THE MINIBATCH — stochastic and
    unscaled — so don't, unless you know you want that.
    """

    def setUp(self, X, Y, num_inducing=128, kern=None, newton_iters=15,
              train_z=False, z_penalty=None, z_init=None):
        import numpy as np

        from ._zguard import setup_z_guard

        self.x = hb.MinibatchData(X)
        self.y = hb.MinibatchData(Y)
        self.n_data = X.shape[0]
        self._newton_iters = int(newton_iters)
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
        # z is FROZEN by default in the evidence families: evidence training
        # drives neighboring inducing points into collision (measured on the
        # multiclass sibling at n=1e5, m=128, Adam 0.05: min spacing 0.047
        # -> 5.6e-4 by step 115, NaN at 119 — coincident z is a rank-
        # deficient Kmm whose f32 Cholesky GRADIENT blows past any jitter
        # rescue, the cliff CLAUDE.md documents). A collision adds no
        # capacity, so freezing costs nothing at quantile init.
        # train_z=True re-enables, SAFELY: the objectives subtract the
        # `gp.gp.z_repulsion` barrier (inactive above half the init min
        # spacing, infinite at coincidence) so z can migrate but not collide.
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

    def _loglik(self):
        y = self.y
        return lambda f: _bernoulli_logit(y, f)

    def _fused(self):
        """Closed-form spec for the fused batched Newton kernel."""
        return ("bernoulli_logit", {"y": self.y})

    def _A(self, x):
        """The projection sqrt(k_var) (Lm^-1 K(z, x))^T: [B, m]."""
        LnT = self.gp._effective_LT(x)  # [m, B]
        return jnp.swapaxes(LnT, -1, -2) * jnp.sqrt(self.k_var)

    @hb.AutoOptimize()
    def log_marginal_laplace(self):
        """Sparse Laplace evidence — deterministic; trains the kernel
        hyperparameters (and z too under ``train_z=True``, guarded by the
        collision barrier)."""
        from henbun_tpu.inference.laplace import laplace_whitened

        from ._zguard import z_guard

        return laplace_whitened(
            self._loglik(), self._A(self.x),
            newton_iters=self._newton_iters, fused=self._fused(),
        ).log_marginal - z_guard(self)

    def laplace(self):
        """Full :class:`~henbun_tpu.inference.laplace.LaplaceResult` at the
        current hyperparameters (``m.run(SparseGPC.laplace)``); ``v_mode``
        is the whitened inducing mode [m, 1]."""
        from henbun_tpu.inference.laplace import laplace_whitened

        return laplace_whitened(
            self._loglik(), self._A(self.x),
            newton_iters=self._newton_iters, fused=self._fused(),
        )

    def predict_f_marginals(self, x_new):
        """Latent Laplace marginals (mean [n*, 1], var [n*, 1]) at new
        inputs; variance includes the residual (FITC) term."""
        from henbun_tpu.inference.laplace import (
            laplace_projected_marginals,
            laplace_whitened,
        )

        loglik = self._loglik()
        A = self._A(self.x)
        res = laplace_whitened(
            loglik, A, newton_iters=self._newton_iters,
            fused=self._fused(),
        )
        x_new = jnp.asarray(x_new)
        LsT = self.gp._effective_LT(x_new)  # [m, n*]
        Astar = jnp.swapaxes(LsT, -1, -2) * jnp.sqrt(self.k_var)
        corr = (
            jnp.maximum(
                self.gp._additional_cov(x_new, LsT, "diagonal"), 0.0
            )
            * self.k_var[0]
        )
        return laplace_projected_marginals(loglik, A, res, Astar, corr)

    def predict_p(self, x_new, deg=20):
        """Deterministic posterior predictive p(y=1 | x_new) [n*, 1]."""
        from henbun_tpu.ops.quadrature import gauss_hermite_expectation

        mean, var = self.predict_f_marginals(x_new)
        p = gauss_hermite_expectation(
            lambda f: jax.nn.sigmoid(f), mean[:, 0], var[:, 0], deg=deg
        )
        return p[:, None]

    # --- Bayesian hyperparameters (inference/api.py samplers) ---------------
    def _hyperprior(self):
        """Weak lognormal(0, 4) log-priors on the evidence hyperparameters
        (k_var + the kernel's lengthscales when it has them) — keeps the
        sampling target proper without informing it. Override to change."""
        from henbun_tpu import densities

        p = jnp.sum(densities.lognormal(self.k_var, 0.0, 4.0))
        ls = getattr(self.gp.kern, "lengthscales", None)
        if ls is not None:
            p = p + jnp.sum(densities.lognormal(ls, 0.0, 4.0))
        return p

    @hb.AutoOptimize()
    def log_posterior(self):
        """Sparse Laplace evidence + weak hyperpriors: the target for
        BAYESIAN hyperparameters at inducing-point scale —
        ``hb.inference.sample_posterior(m, "log_posterior")`` runs ChEES
        over (k_var, lengthscales), every chain's gradient through the IFT
        mode under vmap (the batched dispatch path). The n >= 1e5 regime is
        where hyperparameter uncertainty actually matters; the dense `GPC`
        counterpart is gated in tests/test_laplace.py. Matches the
        reference's hyperparameters-as-Variationals idea
        (`/root/reference/Henbun/gp/kernels.py:43-51`) with an exact
        sampler instead of a variational family."""
        from henbun_tpu.inference.laplace import laplace_whitened

        from ._zguard import z_guard

        ev = laplace_whitened(
            self._loglik(), self._A(self.x),
            newton_iters=self._newton_iters, fused=self._fused(),
        ).log_marginal
        return ev - z_guard(self) + self._hyperprior()

    # --- expectation propagation (inference/ep.py, projected) --------------
    @hb.AutoOptimize()
    def log_marginal_ep(self):
        """Sparse (projected) EP evidence — the moment-matching counterpart
        of `log_marginal_laplace`, at the same O(n m^2) per sweep. Trains
        under the same ep_delta convergence guard as the dense engine."""
        from henbun_tpu.inference.ep import ep_gp_projected

        from ._zguard import z_guard

        return (
            ep_gp_projected(self._loglik(), self._A(self.x)).log_marginal
            - z_guard(self)
        )

    def ep(self, sweeps=30, damping=0.5):
        """Full :class:`~henbun_tpu.inference.ep.EPResult` at the current
        hyperparameters (``m.run(SparseGPC.ep)``)."""
        from henbun_tpu.inference.ep import ep_gp_projected

        return ep_gp_projected(
            self._loglik(), self._A(self.x), sweeps=sweeps, damping=damping
        )

    def predict_p_ep(self, x_new, deg=20):
        """Deterministic posterior predictive p(y=1 | x_new) [n*, 1] under
        the projected EP posterior — the accuracy reference at SVGP scale
        (moment matching beats mode curvature for classification)."""
        from henbun_tpu.inference.ep import ep_gp_projected, ep_projected_marginals
        from henbun_tpu.ops.quadrature import gauss_hermite_expectation

        A = self._A(self.x)
        res = ep_gp_projected(self._loglik(), A)
        x_new = jnp.asarray(x_new)
        LsT = self.gp._effective_LT(x_new)
        Astar = jnp.swapaxes(LsT, -1, -2) * jnp.sqrt(self.k_var)
        corr = (
            jnp.maximum(
                self.gp._additional_cov(x_new, LsT, "diagonal"), 0.0
            )
            * self.k_var[0]
        )
        mean, var = ep_projected_marginals(res, A, Astar, corr)
        p = gauss_hermite_expectation(
            lambda f: jax.nn.sigmoid(f), mean[:, 0], var[:, 0], deg=deg
        )
        return p[:, None]


class SparseGPMulticlass(hb.model.Model):
    """Inducing-point multiclass (softmax) Laplace classifier:
    DETERMINISTIC K-class evidence training at n >= 1e5 — the evidence
    counterpart of `SVGPMulticlass.ELBO_bound` (variational) and the scaled
    counterpart of the numpy oracle in tests/test_multiclass_oracle.py
    (with z = X and float64 it IS that oracle; pinned).

    The softmax couples classes per point (GPML ch. 3.5 block curvature),
    so this rides the dedicated `multiclass_laplace_projected` engine —
    which since round 5 works entirely on the curvature's SQUARE-ROOT
    factor (shifted CholeskyQR2, never forming I + A^T W A), so the old
    n * k_var ~ 2e5 f32 wall is GONE: the formerly-NaN n=1e5, m=128, K=3
    workload trains 500 steps clean on chip
    (`benchmarks/multiclass_scale_bench.py`), and accuracy vs a float64
    oracle degrades gracefully only past n * k_var ~ 1e7 (docs/PERF.md
    §Multiclass square-root envelope). Labels Y are integer class indices
    [n, 1]. Train FULL-BATCH (see SparseGPC's note); full-batch steps at
    n=1e5 are ~0.24 s of device time — cap `settings.tpu.scan_chunk` on
    remote-execution-budgeted environments."""

    def setUp(self, X, Y, num_classes, num_inducing=64, kern=None,
              newton_iters=15, train_z=False, z_penalty=None, z_init=None):
        import numpy as np

        from ._zguard import setup_z_guard

        self._K = int(num_classes)
        self._newton_iters = int(newton_iters)
        self.x = hb.MinibatchData(X)
        self.y = hb.MinibatchData(np.asarray(Y, np.int32))
        self.n_data = X.shape[0]
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
        # frozen z by default — see SparseGPC.setUp (the collision was
        # measured on THIS family); train_z=True opts in under the
        # collision barrier
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

    def _A(self, x):
        LnT = self.gp._effective_LT(x)  # [m, B]
        return jnp.swapaxes(LnT, -1, -2) * jnp.sqrt(self.k_var)

    @hb.AutoOptimize()
    def log_marginal_laplace(self):
        """Multiclass Laplace evidence — deterministic; IFT gradients."""
        from henbun_tpu.inference.laplace import multiclass_laplace_projected

        from ._zguard import z_guard

        return multiclass_laplace_projected(
            self._A(self.x), self.y[:, 0], self._K,
            newton_iters=self._newton_iters,
        ).log_marginal - z_guard(self)

    def laplace(self):
        """Full MulticlassLaplaceResult at the current hyperparameters."""
        from henbun_tpu.inference.laplace import multiclass_laplace_projected

        return multiclass_laplace_projected(
            self._A(self.x), self.y[:, 0], self._K,
            newton_iters=self._newton_iters,
        )

    def predict_p(self, x_new, num=512):
        """Deterministic posterior predictive class probabilities [n*, K]:
        joint per-point class-logit Gaussians from the blocked curvature,
        then E[softmax] by `num` fixed-key quasi-MC draws inside one
        program (the same estimator as SVGPMulticlass.predict_p_mean —
        the softmax admits no separable quadrature)."""
        from henbun_tpu.inference.laplace import (
            multiclass_laplace_joint_marginals,
            multiclass_laplace_projected,
        )

        A = self._A(self.x)
        res = multiclass_laplace_projected(
            A, self.y[:, 0], self._K, newton_iters=self._newton_iters
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
        means, covs = multiclass_laplace_joint_marginals(A, res, Astar, corr)
        # scale-aware floor + safe_cholesky, not a fixed absolute 1e-8: at
        # large k_var the f32-rounded near-PSD per-point covariances can dip
        # below any absolute jitter and NaN the predictive draws
        from henbun_tpu.inference.laplace import _with_floor
        from henbun_tpu.ops.linalg import safe_cholesky

        chols = safe_cholesky(_with_floor(covs, 1e-8), 1e-8)
        eps = jax.random.normal(
            jax.random.PRNGKey(0), (int(num),) + means.shape,
            dtype=means.dtype,
        )  # [num, n*, K]
        draws = means[None] + jnp.einsum("jkl,sjl->sjk", chols, eps)
        return jnp.mean(jax.nn.softmax(draws, axis=-1), axis=0)
