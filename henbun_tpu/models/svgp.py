"""Sparse variational GP regression at scale (SVGP-style).

The reference provides the pieces — `SparseGP.samples` (`gp/gp.py:53-143`),
`MinibatchData`, whitened `Normal` variational inducing values — but no
assembled large-N workload. This family assembles them: minibatch SVI over N
datapoints with m inducing points, the scalable-GP counterpart of the n^3
GPR family.

    u ~ N(0, I) whitened inducing values, q(u) = Normal(q_mu, q_sqrt)
    f_i = [Lm^-1 K(z, x_i)]^T u (+ diagonal correction noise) * sqrt(k_var)
    ELBO = N/|B| sum_{i in B} log N(y_i | f_i, var) - KL(q(u) || N(0, I))
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

import henbun_tpu as hb
from henbun_tpu import densities


def _whitened_marginals(gp, q, x, k_var):
    """Per-point Gaussian marginals of f at x under the whitened inducing
    posterior q(u) = N(mu, S): returns (f_mean [B], f_var [B]).

        E[f_i] = (B^T mu)_i sqrt(k_var),  B = Lm^-1 K(z, x)
        V[f_i] = k_var [ (B^T S B)_ii + (Knn - Kmn^T Kmm^-1 Kmn)_ii ]
    """
    from henbun_tpu.ops.linalg import fill_triangular, matmul_hp

    mu = q.q_mu
    LnT = gp._effective_LT(x)  # [m, B]
    mean = matmul_hp(mu[None, :], LnT)[0]
    if q.q_shape == "diagonal":
        Svar = jnp.exp(2.0 * q.q_sqrt)
        qvar = jnp.sum(jnp.square(LnT) * Svar[:, None], axis=0)
    else:
        Lq = (
            fill_triangular(q.q_sqrt, q.size)
            if q.q_shape == "fullrank_packed"
            else jnp.tril(q.q_sqrt)
        )
        T = matmul_hp(jnp.swapaxes(Lq, -1, -2), LnT)
        qvar = jnp.sum(jnp.square(T), axis=0)
    corr = gp._additional_cov(x, LnT, "diagonal")
    # corr cancels slightly NEGATIVE in f32 at inputs coinciding with
    # inducing points (guaranteed by the quantile-z init on training rows;
    # same failure _safe_corr_std documents) — clamp so sqrt(f_var) in the
    # quadrature/predictive consumers can't NaN. The floor is a tiny
    # POSITIVE (not 0): a degenerate q could land the total exactly on the
    # sqrt-gradient singularity.
    return mean * jnp.sqrt(k_var), jnp.maximum(qvar + corr, 1e-12) * k_var


def _layered_whitened_marginals(gp, q, x, k_var):
    """Per-latent Gaussian marginals for a LAYERED whitened inducing
    posterior (q has ``n_layers=[Q]``, shape [1, m], one shared SparseGP):
    returns (mean [Q, B], var [Q, B]). The layered counterpart of
    `_whitened_marginals`; shared by the multiclass, multi-output and any
    other multi-latent sparse family."""
    from henbun_tpu.ops.linalg import fill_triangular

    LnT = gp._effective_LT(x)  # [m, B]
    mu = q.q_mu  # [Q, m]
    mean = jnp.einsum("km,mb->kb", mu, LnT)
    if q.q_shape == "diagonal":
        Svar = jnp.exp(2.0 * q.q_sqrt)  # [Q, m]
        qvar = jnp.einsum("km,mb->kb", Svar, jnp.square(LnT))
    else:
        Lq = (
            fill_triangular(q.q_sqrt, q.size)
            if q.q_shape == "fullrank_packed"
            else jnp.tril(q.q_sqrt)
        )  # [Q, m, m]
        T = jnp.einsum("kmn,mb->knb", Lq, LnT)  # Lq^T B per latent
        qvar = jnp.sum(jnp.square(T), axis=1)
    corr = gp._additional_cov(x, LnT, "diagonal")  # [B]
    kv = jnp.reshape(k_var, ())
    # clamp as in _whitened_marginals: corr goes slightly negative in f32
    # at inducing-point-coincident inputs and consumers sqrt this (positive
    # floor — keep off the sqrt-gradient singularity at exactly 0)
    return mean * jnp.sqrt(kv), jnp.maximum(qvar + corr[None, :], 1e-12) * kv


class SVGPRegression(hb.model.Model):
    def setUp(self, X, Y, num_inducing=64, q_shape="fullrank",
              analytic_kl=False):
        self.x = hb.MinibatchData(X)
        self.y = hb.MinibatchData(Y)
        self.n_data = X.shape[0]
        # inducing locations initialized on quantiles of the data
        z = np.quantile(
            X, np.linspace(0.0, 1.0, num_inducing), axis=0
        ).astype(np.float32)
        self.gp = hb.gp.SparseGP(hb.gp.kernels.UnitRBF(), z)
        # whitened inducing-value posterior: one sample per trace, shared
        # across the minibatch (n_batch=1 broadcasting over the batch matmul)
        self.u = hb.variationals.Normal(
            shape=[1, num_inducing], q_shape=q_shape, analytic_kl=analytic_kl
        )
        if q_shape == "fullrank":
            # start q(u) at the whitened prior N(0, I): the default
            # mean=stddev dense init gives a near-singular ones-matrix factor
            # at m >= ~50 whose Sigma^-1 overflows float32 (it silently
            # freezes natural-gradient training — every step fails the PD
            # guard). Identity is also just the right prior-matched init.
            self.u.q_sqrt = np.eye(num_inducing, dtype=np.float32)
        self.k_var = hb.Variable(shape=[1], transform=hb.transforms.positive)
        self.var = hb.Variable(shape=[1], transform=hb.transforms.positive)

    def f(self, q_shape="diagonal"):
        """Posterior function samples at the current minibatch, [1, |B|]."""
        return self.gp.samples(self.x, self.u, q_shape) * jnp.sqrt(self.k_var)

    def predict_f(self, x_new, q_shape="diagonal"):
        """Posterior samples of f at new inputs [n*, d] -> [1, n*].

        SparseGP.samples already conditions on arbitrary inputs (the
        inducing-point projection Lm^-1 K(z, x*) does not care whether x* is
        a training minibatch), so prediction is the same code path as
        training. Use with Model.draws for bands:
        >>> bands = m.draws(lambda mm: mm.predict_f(grid)[0], 100)
        """
        return self.gp.samples(
            jnp.asarray(x_new), self.u, q_shape
        ) * jnp.sqrt(self.k_var)

    def predict_y(self, x_new, q_shape="diagonal"):
        """Predictive samples of y at new inputs: f plus observation noise.
        Use with Model.draws; the draw axis then covers both posterior and
        noise variability."""
        from henbun_tpu.core import context as _ctx

        f = self.predict_f(x_new, q_shape)
        eps = jax.random.normal(
            _ctx.current().tagged_key("predict_y"), f.shape, dtype=f.dtype
        )
        return f + jnp.sqrt(self.var) * eps

    def predict_f_marginals(self, x_new):
        """DETERMINISTIC posterior marginals (mean [n*, 1], var [n*, 1]) of
        f at new inputs — the closed-form counterpart of averaging
        `predict_f` draws (same `_whitened_marginals` algebra the analytic
        ELBO trains against), no sampling noise."""
        fmean, fvar = _whitened_marginals(
            self.gp, self.__dict__["u"], jnp.asarray(x_new), self.k_var
        )
        return fmean[:, None], fvar[:, None]

    @hb.AutoOptimize()
    def ELBO(self):
        f = self.f()[0][:, None]  # [|B|, 1]
        batch = f.shape[0]
        scale = self.n_data / batch
        log_lik = jnp.sum(densities.gaussian(self.y, f, self.var))
        return scale * log_lik - self.KL()

    @hb.AutoOptimize()
    def ELBO_student_quadrature(self):
        """Deterministic ROBUST regression ELBO at SVGP scale: Student-t(3)
        likelihood integrated per-marginal with Gauss-Hermite quadrature —
        the large-n counterpart of `GPR.ELBO_student_quadrature` (the exact
        Gaussian expectation has no closed form for heavy tails). Pair with
        Adam or natgrad(0.1-0.3) like the classification quadrature ELBO."""
        from henbun_tpu.ops.quadrature import gauss_hermite_expectation

        fmean, fvar = _whitened_marginals(
            self.gp, self.__dict__["u"], self.x, self.k_var
        )
        y = self.y[:, 0]

        def log_lik(f):  # f: [B, deg]
            return densities.student_t(y[:, None], f, self.var, 3.0)

        ell = jnp.sum(gauss_hermite_expectation(log_lik, fmean, fvar))
        return (self.n_data / fmean.shape[0]) * ell - self.KL()

    @hb.AutoOptimize()
    def ELBO_analytic(self):
        """Closed-form expected log-likelihood (no f sampling): with
        whitened q(u) = N(mu, S) and B = Lm^-1 K(z, x),

            E[f_i] = (B^T mu)_i sqrt(k_var)
            V[f_i] = k_var [ (B^T S B)_ii + (Knn - Kmn^T Kmm^-1 Kmn)_ii ]
            E[log N(y|f, var)] = log N(y | E[f], var) - V[f] / (2 var)

        Zero likelihood-gradient variance from the u sample — the estimator
        the natural-gradient optimizer wants (Salimbeni & al.; the MC `ELBO`
        above is the reference-style single-sample estimator). Combine with
        `analytic_kl=True` on the inducing posterior for a fully
        deterministic objective given the minibatch."""
        fmean, fvar = _whitened_marginals(
            self.gp, self.__dict__["u"], self.x, self.k_var
        )
        ell = jnp.sum(
            densities.gaussian(self.y, fmean[:, None], self.var)
        ) - jnp.sum(fvar) / (2.0 * self.var[0])
        batch = fmean.shape[0]
        return (self.n_data / batch) * ell - self.KL()


class SVGPClassification(hb.model.Model):
    """Binary GP classification: p(y=1 | x) = sigmoid(f(x)), non-conjugate
    Bernoulli likelihood handled by the reparameterized MC ELBO.

    The reference ships `densities.bernoulli` but no model consumes it (and
    its TF<1.0 `tf.select` makes it unrunnable there, densities.py:35-36 —
    fixed here); this family puts it to work on the inducing-point GP.
    Labels y are {0, 1} floats.
    """

    def setUp(self, X, Y, num_inducing=32, q_shape="fullrank"):
        self.x = hb.MinibatchData(X)
        self.y = hb.MinibatchData(Y)
        self.n_data = X.shape[0]
        z = np.quantile(
            X, np.linspace(0.0, 1.0, num_inducing), axis=0
        ).astype(np.float32)
        self.gp = hb.gp.SparseGP(hb.gp.kernels.UnitRBF(), z)
        self.u = hb.variationals.Normal(
            shape=[1, num_inducing], q_shape=q_shape, analytic_kl=True
        )
        if q_shape == "fullrank":
            self.u.q_sqrt = np.eye(num_inducing, dtype=np.float32)
        self.k_var = hb.Variable(shape=[1], transform=hb.transforms.positive)

    def logit_f(self, x, q_shape="diagonal"):
        return self.gp.samples(x, self.u, q_shape) * jnp.sqrt(self.k_var)

    def predict_p(self, x_new, q_shape="diagonal"):
        """Samples of p(y=1 | x_new); average draws for the posterior
        predictive probability."""
        return jax.nn.sigmoid(self.logit_f(jnp.asarray(x_new), q_shape))

    def predict_p_mean(self, x_new, deg=20):
        """DETERMINISTIC posterior predictive p(y=1 | x_new) [n*, 1]:
        Gauss-Hermite quadrature of the sigmoid over the whitened latent
        marginals — no draws, matching GPC.predict_p's contract."""
        from henbun_tpu.ops.quadrature import gauss_hermite_expectation

        fmean, fvar = _whitened_marginals(
            self.gp, self.__dict__["u"], jnp.asarray(x_new), self.k_var
        )
        p = gauss_hermite_expectation(
            lambda f: jax.nn.sigmoid(f), fmean, fvar, deg=deg
        )
        return p[:, None]

    @hb.AutoOptimize()
    def ELBO(self):
        f = self.logit_f(self.x)[0][:, None]  # [|B|, 1]
        p = jnp.clip(jax.nn.sigmoid(f), 1e-6, 1.0 - 1e-6)
        batch = f.shape[0]
        scale = self.n_data / batch
        log_lik = jnp.sum(densities.bernoulli(p, self.y))
        return scale * log_lik - self.KL()

    @hb.AutoOptimize()
    def ELBO_quadrature(self):
        """Deterministic (given the minibatch) classification ELBO: the
        Bernoulli likelihood has no closed-form expectation, so integrate
        each Gaussian marginal f_i with 20-point Gauss-Hermite quadrature
        (ops.quadrature). Zero-variance expected log-likelihood — the
        natural-gradient-compatible counterpart of the MC `ELBO` above.

        log p(y|f) = y f - softplus(f) (numerically stable log-sigmoid form).
        """
        from henbun_tpu.ops.quadrature import gauss_hermite_expectation

        fmean, fvar = _whitened_marginals(
            self.gp, self.__dict__["u"], self.x, self.k_var
        )
        y = self.y[:, 0]

        def log_lik(f):  # f: [B, deg]
            return y[:, None] * f - jax.nn.softplus(f)

        ell = jnp.sum(gauss_hermite_expectation(log_lik, fmean, fvar))
        batch = fmean.shape[0]
        return (self.n_data / batch) * ell - self.KL()


class SVGPCount(hb.model.Model):
    """Count regression (log-Gaussian Cox style): y ~ Poisson(exp(f)).

    The exp link makes the expected log-likelihood CLOSED FORM under the
    Gaussian marginals q(f_i) = N(m_i, v_i):

        E[log Poisson(y | e^f)] = y m - exp(m + v/2) - log y!

    (E[e^f] is the lognormal mean), so `ELBO_analytic` is deterministic given
    the minibatch — zero gradient variance on a NON-conjugate likelihood with
    no quadrature at all. The reference ships `densities.poisson` with no
    consumer (`/root/reference/Henbun/densities.py:39-41`); this family puts
    it to work. Counts y are float arrays of non-negative integers.
    """

    def setUp(self, X, Y, num_inducing=32, q_shape="fullrank"):
        self.x = hb.MinibatchData(X)
        self.y = hb.MinibatchData(Y)
        self.n_data = X.shape[0]
        z = np.quantile(
            X, np.linspace(0.0, 1.0, num_inducing), axis=0
        ).astype(np.float32)
        self.gp = hb.gp.SparseGP(hb.gp.kernels.UnitRBF(), z)
        self.u = hb.variationals.Normal(
            shape=[1, num_inducing], q_shape=q_shape, analytic_kl=True
        )
        if q_shape == "fullrank":
            self.u.q_sqrt = np.eye(num_inducing, dtype=np.float32)
        self.k_var = hb.Variable(shape=[1], transform=hb.transforms.positive)
        # mean log-rate offset (counts are rarely centered on rate 1)
        self.f0 = hb.Variable(shape=[1])

    def _marginals(self, x):
        fmean, fvar = _whitened_marginals(
            self.gp, self.__dict__["u"], x, self.k_var
        )
        return fmean + self.f0[0], fvar

    @hb.AutoOptimize()
    def ELBO(self):
        """Single-sample MC estimator (reference style)."""
        f = self.gp.samples(self.x, self.u)[0][:, None] * jnp.sqrt(
            self.k_var
        ) + self.f0
        rate = jnp.exp(f)
        scale = self.n_data / f.shape[0]
        return scale * jnp.sum(densities.poisson(rate, self.y)) - self.KL()

    @hb.AutoOptimize()
    def ELBO_analytic(self):
        """Deterministic ELBO via the lognormal-mean identity (see class
        docstring) — natural-gradient/Adam trainable with zero variance."""
        fmean, fvar = self._marginals(self.x)
        y = self.y[:, 0]
        ell = jnp.sum(
            y * fmean
            - jnp.exp(fmean + fvar / 2.0)
            - jax.lax.lgamma(y + 1.0)
        )
        scale = self.n_data / fmean.shape[0]
        return scale * ell - self.KL()

    def predict_rate(self, x_new):
        """Posterior mean and variance of the RATE exp(f*) at new inputs
        (lognormal moments): mean = exp(m + v/2), var = (e^v - 1) mean^2.
        Returns (mean [n*, 1], var [n*, 1])."""
        fmean, fvar = self._marginals(jnp.asarray(x_new))
        mean = jnp.exp(fmean + fvar / 2.0)
        var = (jnp.exp(fvar) - 1.0) * jnp.square(mean)
        return mean[:, None], var[:, None]


class SVGPMulticlass(hb.model.Model):
    """K-class GP classification: p(y = k | x) = softmax(F(x))_k with K
    independent latent GPs sharing one kernel (the latent axis is a leading
    `n_layers` batch dimension — batched solves, one gram per step).

    The softmax couples the latents, so there is no separable quadrature;
    the objective is the reparameterized MC ELBO (the reference's estimator
    family). Labels Y are integer class indices [n, 1].
    """

    def setUp(self, X, Y, num_classes, num_inducing=32, q_shape="fullrank"):
        K = int(num_classes)
        self._K = K
        self.x = hb.MinibatchData(X)
        self.y = hb.MinibatchData(np.asarray(Y, np.int32))
        self.n_data = X.shape[0]
        z = np.quantile(
            X, np.linspace(0.0, 1.0, num_inducing), axis=0
        ).astype(np.float32)
        self.gp = hb.gp.SparseGP(hb.gp.kernels.UnitRBF(), z)
        self.u = hb.variationals.Normal(
            shape=[1, num_inducing], n_layers=[K], q_shape=q_shape,
            analytic_kl=True,
        )
        if q_shape == "fullrank":
            eye = np.eye(num_inducing, dtype=np.float32)
            self.u.q_sqrt = np.broadcast_to(
                eye, (K, num_inducing, num_inducing)
            ).copy()
        self.k_var = hb.Variable(shape=[1], transform=hb.transforms.positive)

    def logits(self, x):
        """One posterior sample of the K logits at x: [B, K]."""
        u = jnp.reshape(self.u, (self._K, -1))  # [K, m]
        f = self.gp.samples(x, u, "diagonal") * jnp.sqrt(self.k_var)
        return jnp.swapaxes(f, -1, -2)  # [B, K]

    def predict_p(self, x_new):
        """Samples of the class-probability vectors [n*, K]; average draws
        (Model.draws) for the posterior predictive."""
        return jax.nn.softmax(self.logits(jnp.asarray(x_new)), axis=-1)

    @hb.AutoOptimize()
    def ELBO(self):
        f = self.logits(self.x)  # [B, K]
        logp = jnp.take_along_axis(
            jax.nn.log_softmax(f, axis=-1), self.y, axis=-1
        )  # [B, 1]
        scale = self.n_data / f.shape[0]
        return scale * jnp.sum(logp) - self.KL()

    def _logit_marginals(self, x):
        """Per-class Gaussian marginals of the logits at x: ([K, B], [K, B])."""
        return _layered_whitened_marginals(
            self.gp, self.__dict__["u"], x, self.k_var
        )

    @hb.AutoOptimize()
    def ELBO_bound(self):
        """DETERMINISTIC multiclass training bound (closed form, no
        sampling): Jensen on the partition function gives

            E_q[log softmax(F)_y] >= m_y - log sum_c exp(m_c + v_c / 2)

        (E[e^{f_c}] is the lognormal mean — exact), so this is a valid,
        slightly looser ELBO that trains with zero gradient variance where
        the MC `ELBO` pays single-sample noise on the coupled softmax.
        The looseness is the Jensen gap of log E[sum e^f] vs E[log sum e^f]
        — small once the per-class variances v_c are O(1) or the classes
        separate. Pair with Adam (deterministic but not conjugate); the
        multiclass-Laplace oracle test gates the probabilities it learns."""
        mean, var = self._logit_marginals(self.x)  # [K, B]
        y = self.y[:, 0]  # [B] int class indices
        m_y = jnp.take_along_axis(mean, y[None, :], axis=0)[0]  # [B]
        lse = jax.scipy.special.logsumexp(mean + var / 2.0, axis=0)  # [B]
        ell = jnp.sum(m_y - lse)
        return (self.n_data / mean.shape[1]) * ell - self.KL()

    def predict_p_mean(self, x_new, num=512):
        """DETERMINISTIC posterior predictive class probabilities [n*, K]:
        E[softmax(F)] over the per-class Gaussian logit marginals, estimated
        with `num` fixed-key quasi-MC draws INSIDE one call — reproducible
        (same inputs, same answer) unlike averaging `predict_p` draws, and
        one program rather than `num` trace replays. The softmax couples the
        K latents, so no separable quadrature exists (class docstring)."""
        x_new = jnp.asarray(x_new)
        mean, var = self._logit_marginals(x_new)  # [K, B]
        eps = jax.random.normal(
            jax.random.PRNGKey(0), (num,) + mean.shape, dtype=mean.dtype
        )
        logits = mean[None] + jnp.sqrt(var)[None] * eps  # [num, K, B]
        p = jax.nn.softmax(logits, axis=1)
        return jnp.swapaxes(jnp.mean(p, axis=0), -1, -2)  # [B, K]
