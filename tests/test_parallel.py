"""Multi-device tests on the 8-virtual-CPU mesh (SURVEY §4 oracle g):
data-parallel training must be numerically equivalent to single-device."""

import numpy as np
import jax
import jax.numpy as jnp

from reni_tpu.core import sphere
from reni_tpu.models.reni import RENIConfig, RENIModel
from reni_tpu.parallel import mesh as pmesh
from reni_tpu.train import tasks
from reni_tpu.train.optim import OptimConfig


def _model():
    return RENIModel(
        RENIConfig(
            model_type="VariationalAutoDecoder",
            equivariance="SO2",
            latent_dim=4,
            hidden_layers=1,
            hidden_features=32,
            output_activation=None,
        )
    )


def _synthetic(n, width, seed=0):
    d = np.asarray(sphere.get_directions(width))[0]
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        np.stack(
            [np.tanh(d @ rng.normal(size=(3, 3))) for _ in range(n)]
        ).astype(np.float32)
    )


def test_make_mesh_shapes():
    m = pmesh.make_mesh()
    assert m.shape == {"data": 8, "pixel": 1, "model": 1}
    m = pmesh.make_mesh(n_pixel=2)
    assert m.shape == {"data": 4, "pixel": 2, "model": 1}
    m = pmesh.make_mesh(n_data=2, n_pixel=4)
    assert m.shape == {"data": 2, "pixel": 4, "model": 1}
    m = pmesh.make_mesh(n_data=2, n_pixel=2, n_model=2)
    assert m.shape == {"data": 2, "pixel": 2, "model": 2}
    m = pmesh.make_mesh(n_model=4)
    assert m.shape == {"data": 2, "pixel": 1, "model": 4}


def test_pad_batch_to():
    assert pmesh.pad_batch_to(3, 4) == 4
    assert pmesh.pad_batch_to(8, 4) == 8
    assert pmesh.pad_batch_to(9, 8) == 16


def test_dp_training_matches_single_device():
    """Same seeds, same data: an 8-way data/pixel-sharded fit must produce
    the same parameters as the unsharded fit (GSPMD DP == DDP semantics)."""
    images = _synthetic(6, 16, seed=1)
    cfg = tasks.TaskConfig(
        task="FIT_DECODER",
        optim=OptimConfig(lr_start=1e-4, lr_end=1e-5),
        batch_size=8,  # divisible by the data axis; 6 images -> masked rows
        epochs=5,
        multi_res_training=False,
        final_resolution=(8, 16),
        kld_weighting=1e-4,
    )

    model = _model()
    params0 = model.init(jax.random.PRNGKey(0), dataset_size=6)

    p_single, m_single = tasks.fit_task(
        model, params0, cfg, lambda res: images, jax.random.PRNGKey(1)
    )
    m = pmesh.make_mesh(n_data=4, n_pixel=2)
    p_shard, m_shard = tasks.fit_task(
        model, params0, cfg, lambda res: images, jax.random.PRNGKey(1), mesh=m
    )

    np.testing.assert_allclose(
        m_single["fit_decoder_loss"], m_shard["fit_decoder_loss"], rtol=2e-4
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5
        ),
        p_single,
        p_shard,
    )


def test_sharded_latent_rows_update_disjointly():
    """With DP over the batch, each device carries distinct dataset rows;
    after one epoch every latent row must have moved (replicated-table
    masked-update correctness, SURVEY §2c)."""
    images = _synthetic(8, 16, seed=2)
    cfg = tasks.TaskConfig(
        task="FIT_DECODER",
        optim=OptimConfig(lr_start=1e-2, lr_end=1e-2),
        batch_size=8,
        epochs=1,
        multi_res_training=False,
        final_resolution=(8, 16),
    )
    model = _model()
    params0 = model.init(jax.random.PRNGKey(2), dataset_size=8)
    mu0 = np.asarray(params0["latents"]["mu"])
    m = pmesh.make_mesh()  # 8-way data parallel: one image per device
    p, _ = tasks.fit_task(
        model, params0, cfg, lambda res: images, jax.random.PRNGKey(3), mesh=m
    )
    moved = np.abs(np.asarray(p["latents"]["mu"]) - mu0).reshape(8, -1).max(axis=1)
    assert (moved > 0).all()


def test_sharded_latent_table_matches_replicated():
    """Row-sharding the latent tables (embedding-style, SURVEY §2c) must be
    numerically identical to the replicated-table fit."""
    from reni_tpu.parallel.mesh import sharded_stage_runner
    from reni_tpu.train.optim import build_optimizer

    images = _synthetic(8, 16, seed=4)
    model = _model()
    params0 = model.init(jax.random.PRNGKey(5), dataset_size=8)
    opt = build_optimizer(OptimConfig(lr_start=1e-3, lr_end=1e-3, epochs=4, steps_per_epoch=1))

    from reni_tpu.core import sphere as sph

    step = tasks.make_fit_decoder_step(
        model, opt, sph.get_directions(16), sph.get_sineweight(16), kld_weighting=1e-4
    )

    m = pmesh.make_mesh(n_data=4, n_pixel=2)
    results = []
    for shard_latents in (False, True):
        state = tasks.init_train_state(model, params0, opt, jax.random.PRNGKey(6))
        runner = sharded_stage_runner(m, shard_latents=shard_latents)
        state, metrics = runner(step, state, images, 4, 8)
        results.append((jax.device_get(state.params), np.asarray(metrics["loss"])))
    np.testing.assert_allclose(results[0][1], results[1][1], rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
        results[0][0],
        results[1][0],
    )


def test_sharded_latent_table_non_divisible_rows():
    """A latent table whose row count does not divide the data axis is
    zero-padded for row-sharding and sliced back — numerically identical to
    the replicated fit (no silent replication fallback)."""
    from reni_tpu.core import sphere as sph
    from reni_tpu.parallel.mesh import sharded_stage_runner
    from reni_tpu.train.optim import build_optimizer

    images = _synthetic(6, 16, seed=10)  # 6 rows on a 4-wide data axis
    model = _model()
    params0 = model.init(jax.random.PRNGKey(11), dataset_size=6)
    opt = build_optimizer(
        OptimConfig(lr_start=1e-3, lr_end=1e-3, epochs=3, steps_per_epoch=1)
    )
    step = tasks.make_fit_decoder_step(
        model, opt, sph.get_directions(16), sph.get_sineweight(16),
        kld_weighting=1e-4,
    )
    m = pmesh.make_mesh(n_data=4, n_pixel=2)
    results = []
    for shard_latents in (False, True):
        state = tasks.init_train_state(model, params0, opt, jax.random.PRNGKey(12))
        runner = sharded_stage_runner(m, shard_latents=shard_latents)
        state, metrics = runner(step, state, images, 3, 8)
        results.append((jax.device_get(state.params), np.asarray(metrics["loss"])))
    assert results[1][0]["latents"]["mu"].shape == (6, 4, 3)  # unpadded back
    np.testing.assert_allclose(results[0][1], results[1][1], rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
        results[0][0],
        results[1][0],
    )


def test_state_sharding_rejects_unpadded_table():
    import pytest

    model = _model()
    params = model.init(jax.random.PRNGKey(13), dataset_size=6)
    m = pmesh.make_mesh(n_data=4, n_pixel=2)
    with pytest.raises(ValueError, match="pad_latent_rows"):
        pmesh.state_sharding(m, {"latents": params["latents"]}, shard_latents=True)


def test_decode_sharded_matches_unsharded():
    model = _model()
    params = model.init(jax.random.PRNGKey(7), dataset_size=2)
    Z = model.latents(params, jnp.arange(2))
    d = np.asarray((np.random.default_rng(8).normal(size=(1, 64, 3))).astype(np.float32))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    ref = np.asarray(model.apply(params, Z, d))
    out = np.asarray(pmesh.decode_sharded(model, params, Z, d))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_fit_inverse_under_mesh():
    """The inverse-render task must run data-sharded (5-D render targets)."""
    from reni_tpu.models.reni import RENIConfig, RENIModel
    from reni_tpu.render import mesh as mesh_lib
    from reni_tpu.render.inverse import InverseRenderSetup, fit_inverse

    model = RENIModel(
        RENIConfig(
            model_type="VariationalAutoDecoder",
            equivariance="SO2",
            latent_dim=4,
            hidden_layers=1,
            hidden_features=32,
            output_activation=None,
            fixed_decoder=True,
        )
    )
    params = model.init(jax.random.PRNGKey(0), dataset_size=4)
    images = _synthetic(4, 16, seed=9) * 0.5
    setup = InverseRenderSetup(
        mesh_lib.make_uv_sphere(8, 16), render_resolution=16, kd=0.5, light_chunk=64
    )
    cfg = tasks.TaskConfig(
        task="FIT_INVERSE",
        optim=OptimConfig(lr_start=5e-2, lr_end=1e-2),
        batch_size=4,
        epochs=6,
        multi_res_training=False,
        final_resolution=(8, 16),
        prior_loss_weight=1e-7,
        cosine_similarity_weight=1e-3,
    )
    m = pmesh.make_mesh(n_data=4, n_pixel=2)
    p, metrics = fit_inverse(
        model, params, cfg, lambda res: images, lambda x: x,
        jax.random.PRNGKey(1), setup=setup, mesh=m,
    )
    assert np.isfinite(metrics["fit_inverse_loss"]).all()
    assert metrics["fit_inverse_loss"][-1] < metrics["fit_inverse_loss"][0]


def test_dryrun_multichip_gate():
    """The driver's multi-chip gate: dryrun_multichip(8) must pass. On this
    8-virtual-device CPU harness it runs inline; with fewer devices it
    self-provisions a CPU subprocess (exercised via n=1... inline here)."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_multihost_single_process_noop():
    from reni_tpu.parallel import multihost

    assert multihost.initialize() is False  # no coordinator: no-op
    assert multihost.is_primary() is True
    m = multihost.global_mesh(n_pixel=2)
    assert m.shape == {"data": 4, "pixel": 2, "model": 1}


def test_profiling_trace_and_benchmark():
    from reni_tpu.utils import profiling

    import jax.numpy as jnp

    def f(x):
        return x * 1.000001 + 1e-9

    dt, final = profiling.benchmark_fn(jax.jit(f), jnp.ones((64,)), n=3)
    assert dt > 0 and np.isfinite(float(final.sum()))

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        with profiling.trace(d):
            jax.block_until_ready(jax.jit(f)(jnp.ones((64,))))
        import os

        assert any(os.scandir(d))  # trace files written


def test_tp_training_matches_single_device():
    """Tensor-parallel trunk (model axis, Megatron column/row layout) must
    reproduce the unsharded fit — GSPMD inserts the psums, semantics are
    unchanged up to fp reassociation of the sharded contractions."""
    images = _synthetic(6, 16, seed=20)
    cfg = tasks.TaskConfig(
        task="FIT_DECODER",
        optim=OptimConfig(lr_start=1e-4, lr_end=1e-5),
        batch_size=8,
        epochs=5,
        multi_res_training=False,
        final_resolution=(8, 16),
        kld_weighting=1e-4,
    )
    model = _model()
    params0 = model.init(jax.random.PRNGKey(21), dataset_size=6)

    p_single, m_single = tasks.fit_task(
        model, params0, cfg, lambda res: images, jax.random.PRNGKey(22)
    )
    m = pmesh.make_mesh(n_data=2, n_pixel=2, n_model=2)
    p_tp, m_tp = tasks.fit_task(
        model, params0, cfg, lambda res: images, jax.random.PRNGKey(22), mesh=m
    )
    np.testing.assert_allclose(
        m_single["fit_decoder_loss"], m_tp["fit_decoder_loss"], rtol=5e-4
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5
        ),
        p_single,
        p_tp,
    )


def test_tp_only_mesh_matches_single_device():
    """A pure-TP mesh (1 x 1 x 8: hidden features split 8 ways, 4 lanes per
    shard) must also match — no data/pixel sharding to hide behind."""
    images = _synthetic(4, 16, seed=23)
    cfg = tasks.TaskConfig(
        task="FIT_DECODER",
        optim=OptimConfig(lr_start=1e-4, lr_end=1e-4),
        batch_size=4,
        epochs=3,
        multi_res_training=False,
        final_resolution=(8, 16),
        kld_weighting=1e-4,
    )
    model = _model()
    params0 = model.init(jax.random.PRNGKey(24), dataset_size=4)
    p_single, m_single = tasks.fit_task(
        model, params0, cfg, lambda res: images, jax.random.PRNGKey(25)
    )
    m = pmesh.make_mesh(n_data=1, n_pixel=1, n_model=8)
    p_tp, m_tp = tasks.fit_task(
        model, params0, cfg, lambda res: images, jax.random.PRNGKey(25), mesh=m
    )
    np.testing.assert_allclose(
        m_single["fit_decoder_loss"], m_tp["fit_decoder_loss"], rtol=5e-4
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5
        ),
        p_single,
        p_tp,
    )


def test_tp_specs_alternate_and_shard_moments():
    """The TP layout: even trunk layers column-parallel, odd row-parallel,
    final row-parallel iff fed sharded activations; adam moments shard like
    their parameters."""
    from jax.sharding import PartitionSpec as P
    from reni_tpu.train.optim import build_optimizer

    model = _model()  # 1 hidden layer -> trunk layers [0, 1], final fed by odd
    params = model.init(jax.random.PRNGKey(26), dataset_size=4)
    opt = build_optimizer(
        OptimConfig(lr_start=1e-3, lr_end=1e-3, epochs=1, steps_per_epoch=1)
    )
    state = tasks.init_train_state(model, params, opt, jax.random.PRNGKey(27))
    m = pmesh.make_mesh(n_data=2, n_pixel=2, n_model=2)
    sh = pmesh.state_sharding(m, state)

    dec = sh.trainable["decoder"]
    assert dec["layers"][0]["w"].spec == P(None, "model")
    assert dec["layers"][0]["b"].spec == P("model")
    assert dec["layers"][1]["w"].spec == P("model", None)
    assert dec["layers"][1]["b"].spec == P()
    # trunk has 2 layers; last (idx 1) is row-parallel -> final replicated
    assert dec["final"]["w"].spec == P()
    # latents stay replicated; adam moments mirror the parameter shardings
    assert sh.trainable["latents"]["mu"].spec == P()
    moment_specs = {
        str(p): s.spec
        for p, s in jax.tree_util.tree_leaves_with_path(sh.opt_state)
        if "decoder" in str(p)
    }
    assert any(v == P(None, "model") for v in moment_specs.values())
    assert any(v == P("model", None) for v in moment_specs.values())


def test_tp_rejects_non_divisible_hidden():
    import pytest

    model = RENIModel(
        RENIConfig(
            model_type="AutoDecoder",
            equivariance="SO2",
            latent_dim=4,
            hidden_layers=1,
            hidden_features=30,  # not divisible by model axis 4
            output_activation=None,
        )
    )
    params = model.init(jax.random.PRNGKey(28), dataset_size=2)
    m = pmesh.make_mesh(n_data=1, n_pixel=2, n_model=4)
    with pytest.raises(ValueError, match="model axis"):
        pmesh.state_sharding(m, {"decoder": params["decoder"]})
