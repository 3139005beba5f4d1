"""TPU.STREAM_DATA: the host-resident / per-step-transfer trainer path must
be semantically identical to the device-resident whole-stage-scan path —
same batches, same zero-masked ragged tail, same optimizer trajectory."""

import numpy as np
import jax
import jax.numpy as jnp

from reni_tpu.core import sphere
from reni_tpu.models.reni import RENIConfig, RENIModel
from reni_tpu.parallel import mesh as pmesh
from reni_tpu.train import tasks
from reni_tpu.train.optim import OptimConfig, build_optimizer


def _setup(n_images=5, width=32, batch_size=2, latent_dim=4):
    model = RENIModel(
        RENIConfig(
            model_type="VariationalAutoDecoder",
            equivariance="SO2",
            latent_dim=latent_dim,
            hidden_layers=1,
            hidden_features=32,
            output_activation=None,
        )
    )
    params = model.init(jax.random.PRNGKey(0), dataset_size=n_images)
    directions = sphere.get_directions(width)
    sineweight = sphere.get_sineweight(width)
    optimizer = build_optimizer(
        OptimConfig(lr_start=1e-3, lr_end=1e-4, epochs=4, steps_per_epoch=3)
    )
    step_fn = tasks.make_fit_decoder_step(
        model, optimizer, directions, sineweight, kld_weighting=1e-4
    )
    state = tasks.init_train_state(model, params, optimizer, jax.random.PRNGKey(1))
    rng = np.random.default_rng(2)
    images = rng.normal(size=(n_images, (width // 2) * width, 3)).astype(
        np.float32
    )
    return model, step_fn, state, images, batch_size


def _trees_close(a, b, tol):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=tol, rtol=tol)


def test_streaming_matches_resident_single_device():
    """Ragged dataset (5 images, batch 2): streaming and resident runners
    execute the identical step sequence — parameters agree to fp noise and
    per-epoch metrics match."""
    model, step_fn, state, images, bs = _setup()
    n_epochs = 4

    st_res, m_res = tasks.run_stage(step_fn, state, jnp.asarray(images), n_epochs, bs)
    run_stream = tasks.streaming_stage_runner()
    st_str, m_str = run_stream(step_fn, state, images, n_epochs, bs)

    _trees_close(st_res.params, st_str.params, 1e-6)
    assert set(m_res.keys()) == set(m_str.keys())
    for k in m_res:
        assert np.asarray(m_res[k]).shape == (n_epochs,)
        np.testing.assert_allclose(
            np.asarray(m_res[k]), np.asarray(m_str[k]), atol=1e-5, rtol=1e-5
        )


def test_streaming_matches_resident_on_mesh():
    """Streaming over a 4x2 data x pixel mesh: the sharded per-batch
    device_put path reproduces the unsharded resident fit."""
    model, step_fn, state, images, bs = _setup(n_images=8, batch_size=4)
    n_epochs = 3

    st_res, m_res = tasks.run_stage(step_fn, state, jnp.asarray(images), n_epochs, bs)

    mesh = pmesh.make_mesh(n_data=4, n_pixel=2)
    run_stream = tasks.streaming_stage_runner(mesh)
    st_str, m_str = run_stream(step_fn, state, images, n_epochs, bs)

    _trees_close(st_res.params, st_str.params, 1e-5)
    for k in m_res:
        np.testing.assert_allclose(
            np.asarray(m_res[k]), np.asarray(m_str[k]), atol=1e-4, rtol=1e-4
        )


def test_fit_task_stream_flag_end_to_end():
    """The public fit_task(stream=True) path (host images_at callable, the
    curriculum, callbacks) matches stream=False."""
    model = RENIModel(
        RENIConfig(
            model_type="AutoDecoder",
            equivariance="SO2",
            latent_dim=4,
            hidden_layers=1,
            hidden_features=32,
            output_activation=None,
        )
    )
    params = model.init(jax.random.PRNGKey(0), dataset_size=3)
    rng = np.random.default_rng(5)
    host_imgs = {
        (16, 32): rng.normal(size=(3, 512, 3)).astype(np.float32),
        (8, 16): rng.normal(size=(3, 128, 3)).astype(np.float32),
    }
    cfg = tasks.TaskConfig(
        task="FIT_DECODER",
        optim=OptimConfig(lr_start=1e-3, lr_end=1e-4),
        batch_size=2,
        epochs=8,
        multi_res_training=True,
        initial_resolution=(8, 16),
        final_resolution=(16, 32),
        curriculum=(4,),
    )

    def images_at(res, epoch=None):
        return host_imgs[tuple(res)]

    seen = []

    def cb(state, epoch, metrics, res):
        seen.append(epoch)

    p_stream, m_stream = tasks.fit_task(
        model, params, cfg, images_at, jax.random.PRNGKey(1),
        stream=True, callback_every=2, callback=cb,
    )
    p_res, m_res = tasks.fit_task(
        model, params, cfg,
        lambda res, epoch=None: jnp.asarray(host_imgs[tuple(res)]),
        jax.random.PRNGKey(1),
    )
    _trees_close(p_stream, p_res, 1e-6)
    for k in m_res:
        np.testing.assert_allclose(
            np.asarray(m_res[k]), np.asarray(m_stream[k]), atol=1e-5, rtol=1e-5
        )
    assert seen == [2, 4, 6, 8]  # callbacks fired at segment boundaries


def test_streaming_with_shard_latents():
    """STREAM_DATA + SHARD_LATENTS (the truly-huge case: images stream from
    host, latent tables row-shard across 'data'): both the per-step and the
    chunked streaming runners must match the resident row-sharded fit —
    including the non-divisible pad/unpad (6 rows on a 4-wide axis)."""
    model, step_fn, state, images, bs = _setup(n_images=6, batch_size=2)
    n_epochs = 3
    mesh = pmesh.make_mesh(n_data=4, n_pixel=2)

    run_res = pmesh.sharded_stage_runner(mesh, shard_latents=True)
    st_res, m_res = run_res(step_fn, state, jnp.asarray(images), n_epochs, bs)

    for chunk in (1, 2):
        run_stream = tasks.streaming_stage_runner(
            mesh, chunk=chunk, shard_latents=True
        )
        st_str, m_str = run_stream(step_fn, state, images, n_epochs, bs)
        _trees_close(
            jax.device_get(st_res.params), jax.device_get(st_str.params), 1e-5
        )
        for k in m_res:
            np.testing.assert_allclose(
                np.asarray(m_res[k]), np.asarray(m_str[k]), atol=1e-4, rtol=1e-4
            )


def test_streaming_mesh_with_fused_kernel():
    """Streaming + mesh + USE_PALLAS (the shipped default trunk): the
    kernel_mesh context must route the per-batch jitted step through the
    shard_map-partitioned fused kernel, matching the XLA streaming fit."""
    def build(use_pallas):
        model = RENIModel(
            RENIConfig(
                model_type="AutoDecoder",
                conditioning="Cond-by-Concat",
                equivariance="SO2",
                latent_dim=4,
                hidden_layers=1,
                hidden_features=128,  # lane-aligned: kernel-supported width
                output_activation=None,
                use_pallas=use_pallas,
                pallas_trunk="float32",
            )
        )
        params = model.init(jax.random.PRNGKey(0), dataset_size=8)
        directions = sphere.get_directions(32)
        sineweight = sphere.get_sineweight(32)
        optimizer = build_optimizer(
            OptimConfig(lr_start=1e-3, lr_end=1e-4, epochs=2, steps_per_epoch=2)
        )
        step_fn = tasks.make_fit_decoder_step(
            model, optimizer, directions, sineweight, kld_weighting=1e-4
        )
        state = tasks.init_train_state(
            model, params, optimizer, jax.random.PRNGKey(1)
        )
        return step_fn, state

    rng = np.random.default_rng(3)
    images = rng.normal(size=(8, 512, 3)).astype(np.float32)
    mesh = pmesh.make_mesh(n_data=4, n_pixel=2)
    run_stream = tasks.streaming_stage_runner(mesh)

    step_k, state_k = build(True)
    st_k, m_k = run_stream(step_k, state_k, images, 2, 4)
    step_x, state_x = build(False)
    st_x, m_x = run_stream(step_x, state_x, images, 2, 4)

    _trees_close(st_k.params, st_x.params, 5e-5)
    np.testing.assert_allclose(
        np.asarray(m_k["loss"]), np.asarray(m_x["loss"]), atol=1e-5, rtol=1e-5
    )


def test_streaming_mesh_nondivisible_pixel_axis():
    """A pixel count not divisible by the pixel axis must replicate it —
    the same fallback policy shard_stage_data applies (shared helper)."""
    model, step_fn, state, images, bs = _setup(n_images=8, width=24, batch_size=4)
    # width 24 -> npix = 12*24 = 288; 288 % 2 == 0, so craft npix=290
    rng = np.random.default_rng(7)
    images = rng.normal(size=(8, 290, 3)).astype(np.float32)
    directions = jnp.asarray(rng.normal(size=(1, 290, 3)).astype(np.float32))
    sineweight = jnp.abs(jnp.asarray(rng.normal(size=(1, 290, 3)))).astype(
        jnp.float32
    )
    optimizer = build_optimizer(
        OptimConfig(lr_start=1e-3, lr_end=1e-4, epochs=2, steps_per_epoch=2)
    )
    step_fn = tasks.make_fit_decoder_step(
        model, optimizer, directions, sineweight, kld_weighting=1e-4
    )
    state = tasks.init_train_state(model, params_of(model, 8), optimizer,
                                   jax.random.PRNGKey(1))

    st_res, m_res = tasks.run_stage(step_fn, state, jnp.asarray(images), 2, 4)
    mesh = pmesh.make_mesh(n_data=2, n_pixel=4)  # 290 % 4 != 0 -> replicate
    run_stream = tasks.streaming_stage_runner(mesh)
    st_str, m_str = run_stream(step_fn, state, images, 2, 4)
    _trees_close(st_res.params, st_str.params, 1e-5)


def params_of(model, n):
    return model.init(jax.random.PRNGKey(0), dataset_size=n)


def test_largest_divisor_leq():
    assert tasks._largest_divisor_leq(12, 8) == 6
    assert tasks._largest_divisor_leq(12, 4) == 4
    assert tasks._largest_divisor_leq(5, 4) == 1
    assert tasks._largest_divisor_leq(1, 8) == 1
    assert tasks._largest_divisor_leq(7, 0) == 1


def test_streaming_chunked_matches_resident():
    """TPU.STREAM_CHUNK: K batches scanned per dispatch must reproduce the
    resident fit exactly — whole-epoch chunk (K == nb) and the K=1
    fallback when no divisor <= chunk exists (nb=3, chunk=2)."""
    model, step_fn, state, images, bs = _setup()  # 5 imgs, bs 2 -> nb = 3
    n_epochs = 4
    st_res, m_res = tasks.run_stage(step_fn, state, jnp.asarray(images), n_epochs, bs)

    for chunk in (3, 2):  # K = 3 (one chunk/epoch) and K = 1 (fallback)
        run_stream = tasks.streaming_stage_runner(chunk=chunk)
        st_str, m_str = run_stream(step_fn, state, images, n_epochs, bs)
        _trees_close(st_res.params, st_str.params, 1e-6)
        for k in m_res:
            assert np.asarray(m_str[k]).shape == (n_epochs,)
            np.testing.assert_allclose(
                np.asarray(m_res[k]), np.asarray(m_str[k]), atol=1e-5, rtol=1e-5
            )


def test_stream_chunk_clamped_by_scan_step_cap(monkeypatch):
    """RENI_TPU_MAX_SCAN_STEPS (the per-dispatch step cap crash-resume
    budgets around) must clamp K: chunk=4 with a cap of 2 runs K=2 —
    and still matches the resident fit."""
    monkeypatch.setenv("RENI_TPU_MAX_SCAN_STEPS", "2")
    model, step_fn, state, images, bs = _setup(n_images=8, batch_size=2)
    st_res, m_res = tasks.run_stage(step_fn, state, jnp.asarray(images), 2, bs)
    st_str, m_str = tasks.streaming_stage_runner(chunk=4)(
        step_fn, state, images, 2, bs
    )
    _trees_close(st_res.params, st_str.params, 1e-6)
    np.testing.assert_allclose(
        np.asarray(m_res["loss"]), np.asarray(m_str["loss"]), atol=1e-5, rtol=1e-5
    )


def test_streaming_chunked_on_mesh():
    """Chunked streaming over a data x pixel mesh: the (K·B, P, 3) staged
    super-slice + in-scan row gather reproduces the unsharded resident fit
    (multi-chunk epochs: nb=4, K=2)."""
    model, step_fn, state, images, bs = _setup(n_images=8, batch_size=2)
    n_epochs = 3
    st_res, m_res = tasks.run_stage(step_fn, state, jnp.asarray(images), n_epochs, bs)

    mesh = pmesh.make_mesh(n_data=2, n_pixel=2)
    run_stream = tasks.streaming_stage_runner(mesh, chunk=2)
    st_str, m_str = run_stream(step_fn, state, images, n_epochs, bs)

    _trees_close(st_res.params, st_str.params, 1e-5)
    for k in m_res:
        np.testing.assert_allclose(
            np.asarray(m_res[k]), np.asarray(m_str[k]), atol=1e-4, rtol=1e-4
        )


def test_stream_chunk_layout_roundtrip():
    """stream_chunk_layout: staging images[perm] gives every data shard a
    contiguous block of its own rows, and the shard-local `rows` indices
    reconstruct exactly the original per-step batches."""
    mesh = pmesh.make_mesh(n_data=4, n_pixel=1)
    rng = np.random.default_rng(17)
    K, B, nd = 3, 8, 4
    idx_chunk = rng.integers(0, 1000, size=(K, B))
    perm, rows = pmesh.stream_chunk_layout(mesh, idx_chunk)
    assert perm.shape == (K * B,) and rows.shape == (K, B)
    bd = B // nd
    flat = perm  # identity "source": staged values ARE the dataset rows
    for k in range(K):
        got = np.concatenate([
            flat[d * K * bd : (d + 1) * K * bd][rows[k, d * bd : (d + 1) * bd]]
            for d in range(nd)
        ])
        np.testing.assert_array_equal(got, idx_chunk[k])


def test_chunk_gather_collective_free():
    """The shard_map'd chunk gather must compile without moving image bytes
    between shards (no all-gather/all-to-all/collective-permute)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = pmesh.make_mesh(n_data=4, n_pixel=2)
    gather = pmesh.chunk_gather(mesh, "pixel")
    imgs = jax.device_put(
        jnp.zeros((16, 8, 3)), NamedSharding(mesh, P("data", "pixel", None))
    )
    rows = jax.device_put(
        jnp.zeros((8,), jnp.int32), NamedSharding(mesh, P("data"))
    )
    txt = jax.jit(gather).lower(imgs, rows).compile().as_text()
    for coll in ("all-gather", "all-to-all", "collective-permute"):
        assert coll not in txt, f"chunk gather emitted {coll}"


def test_chunk_slice_data_sharded_residency():
    """The staged super-slice is data-sharded: each device holds K·B/n_data
    rows, not the full K·B chunk (the whole point of streaming is the HBM
    cap)."""
    from jax.sharding import NamedSharding

    mesh = pmesh.make_mesh(n_data=4, n_pixel=2)
    chunk_sh, _ = pmesh.stream_chunk_shardings(mesh, npix=8)
    buf = jax.device_put(jnp.zeros((16, 8, 3)), chunk_sh)
    shard_rows = {s.data.shape[0] for s in buf.addressable_shards}
    assert shard_rows == {16 // 4}


def test_streaming_on_tp_mesh():
    """Streaming (chunked) composes with a model (tensor-parallel) axis:
    on a 2x2x2 data x pixel x model mesh the trunk runs Megatron-sharded
    (state_sharding applies the TP layout) while batches stream — must
    match the unsharded resident fit."""
    model, step_fn, state, images, bs = _setup(n_images=8, batch_size=4)
    n_epochs = 2
    st_res, m_res = tasks.run_stage(step_fn, state, jnp.asarray(images), n_epochs, bs)

    mesh = pmesh.make_mesh(n_data=2, n_pixel=2, n_model=2)
    run_stream = tasks.streaming_stage_runner(mesh, chunk=2)
    st_str, m_str = run_stream(step_fn, state, images, n_epochs, bs)

    _trees_close(
        jax.device_get(st_res.params), jax.device_get(st_str.params), 1e-5
    )
    for k in m_res:
        np.testing.assert_allclose(
            np.asarray(m_res[k]), np.asarray(m_str[k]), atol=1e-4, rtol=1e-4
        )


def test_fit_task_stream_chunk_end_to_end():
    """fit_task(stream=True, stream_chunk=2) — the public wiring — matches
    the resident fit through the curriculum."""
    model = RENIModel(
        RENIConfig(
            model_type="AutoDecoder",
            equivariance="SO2",
            latent_dim=4,
            hidden_layers=1,
            hidden_features=32,
            output_activation=None,
        )
    )
    params = model.init(jax.random.PRNGKey(0), dataset_size=4)
    rng = np.random.default_rng(13)
    host_imgs = rng.normal(size=(4, 512, 3)).astype(np.float32)
    cfg = tasks.TaskConfig(
        task="FIT_DECODER",
        optim=OptimConfig(lr_start=1e-3, lr_end=1e-4),
        batch_size=2,  # nb = 2 -> K = 2: one dispatch per epoch
        epochs=4,
        multi_res_training=False,
        final_resolution=(16, 32),
    )
    p_stream, m_stream = tasks.fit_task(
        model, params, cfg, lambda res, epoch=None: host_imgs,
        jax.random.PRNGKey(1), stream=True, stream_chunk=2,
    )
    p_res, m_res = tasks.fit_task(
        model, params, cfg, lambda res, epoch=None: jnp.asarray(host_imgs),
        jax.random.PRNGKey(1),
    )
    _trees_close(p_stream, p_res, 1e-6)
    for k in m_res:
        np.testing.assert_allclose(
            np.asarray(m_res[k]), np.asarray(m_stream[k]), atol=1e-5, rtol=1e-5
        )


def test_stream_resume_mid_task_matches_uninterrupted():
    """Crash-recovery composition: a streaming+chunked fit interrupted at
    epoch 3 (capturing what a checkpoint stores: params + opt state) and
    resumed with start_epoch=3 must land exactly where the uninterrupted
    6-epoch streaming fit lands."""
    model = RENIModel(
        RENIConfig(
            model_type="AutoDecoder",
            equivariance="SO2",
            latent_dim=4,
            hidden_layers=1,
            hidden_features=32,
            output_activation=None,
        )
    )
    params0 = model.init(jax.random.PRNGKey(0), dataset_size=4)
    rng = np.random.default_rng(29)
    imgs = rng.normal(size=(4, 128, 3)).astype(np.float32)
    images_at = lambda res, epoch=None: imgs
    cfg = tasks.TaskConfig(
        task="FIT_DECODER",
        optim=OptimConfig(lr_start=1e-3, lr_end=1e-4),
        batch_size=2,
        epochs=6,
        multi_res_training=False,
        final_resolution=(8, 16),
    )
    kw = dict(stream=True, stream_chunk=2)

    p_full, _ = tasks.fit_task(
        model, params0, cfg, images_at, jax.random.PRNGKey(1), **kw
    )

    cap = {}

    def cb(state, epoch, metrics, res):
        if epoch == 3:
            cap["params"] = jax.device_get(state.params)
            cap["opt"] = jax.device_get(state.opt_state)
            return True  # simulate the crash/stop after the checkpoint

    tasks.fit_task(
        model, params0, cfg, images_at, jax.random.PRNGKey(1),
        callback_every=3, callback=cb, **kw
    )
    assert "params" in cap
    p_resumed, _ = tasks.fit_task(
        model, cap["params"], cfg, images_at, jax.random.PRNGKey(1),
        start_epoch=3, initial_opt_state=cap["opt"], **kw
    )
    _trees_close(p_full, p_resumed, 1e-6)


def test_streaming_with_reaugment():
    """stream=True composes with reaugment (per-epoch re-staged images):
    both runners consume the per-epoch host arrays identically."""
    model = RENIModel(
        RENIConfig(
            model_type="AutoDecoder",
            equivariance="SO2",
            latent_dim=4,
            hidden_layers=1,
            hidden_features=32,
            output_activation=None,
        )
    )
    params = model.init(jax.random.PRNGKey(0), dataset_size=3)
    rng = np.random.default_rng(11)
    per_epoch = {
        e: rng.normal(size=(3, 512, 3)).astype(np.float32) for e in range(5)
    }
    cfg = tasks.TaskConfig(
        task="FIT_DECODER",
        optim=OptimConfig(lr_start=1e-3, lr_end=1e-4),
        batch_size=2,
        epochs=4,
        multi_res_training=False,
        final_resolution=(16, 32),
    )

    def images_at(res, epoch=None):
        return per_epoch[epoch if epoch is not None else 0]

    p_stream, m_stream = tasks.fit_task(
        model, params, cfg, images_at, jax.random.PRNGKey(1),
        stream=True, reaugment=True,
    )
    p_res, m_res = tasks.fit_task(
        model, params, cfg,
        lambda res, epoch=None: jnp.asarray(
            per_epoch[epoch if epoch is not None else 0]
        ),
        jax.random.PRNGKey(1), reaugment=True,
    )
    _trees_close(p_stream, p_res, 1e-6)
    np.testing.assert_allclose(
        np.asarray(m_res["fit_decoder_loss"]),
        np.asarray(m_stream["fit_decoder_loss"]),
        atol=1e-5, rtol=1e-5,
    )


def test_streaming_bf16_transfer_dtype():
    """TPU.STREAM_DTYPE=bfloat16 halves the transfer bytes: the staged
    batches are bf16 (targets quantized) and the optimizer trajectory
    tracks the f32 tier to quantization error — on an ndarray source and
    composing with a DiskRowSource-style prefetching source."""
    model, step_fn, state, images, B = _setup()

    run_f32 = tasks.streaming_stage_runner()
    sf, mf = run_f32(step_fn, state, images, 2, B)

    run_bf16 = tasks.streaming_stage_runner(stream_dtype=jnp.bfloat16)
    sb, mb = run_bf16(step_fn, state, images, 2, B)
    # close, not equal: bf16 targets differ at ~1e-2 relative
    np.testing.assert_allclose(
        np.asarray(mb["loss"]), np.asarray(mf["loss"]), rtol=2e-2
    )
    _trees_close(sb.trainable, sf.trainable, 5e-2)

    # the wrapper really narrows the staged rows
    cast = tasks._CastRows(images, jnp.bfloat16)
    assert cast[np.array([0, 1])].dtype == jnp.bfloat16
    assert cast.shape == images.shape

    # prefetch passthrough for out-of-core sources
    class FakeSrc:
        shape = images.shape
        dtype = images.dtype

        def __init__(self):
            self.prefetched = []

        def prefetch(self, rows):
            self.prefetched.append(np.asarray(rows))

        def __getitem__(self, rows):
            return images[rows]

    src = FakeSrc()
    wrapped = tasks._CastRows(src, jnp.bfloat16)
    wrapped.prefetch(np.array([1, 2]))
    assert src.prefetched and wrapped[np.array([1])].dtype == jnp.bfloat16


def test_streaming_bf16_on_mesh():
    """STREAM_DTYPE composes with the mesh staging path (put_rows feeds
    the data/pixel-sharded fused step with bf16 batches)."""
    model, step_fn, state, images, B = _setup(n_images=8, batch_size=4)
    mesh = pmesh.make_mesh(n_data=4, n_pixel=2, n_model=1)

    run_ref = tasks.streaming_stage_runner(mesh)
    sr, mr = run_ref(step_fn, state, images, 2, B)

    run_bf = tasks.streaming_stage_runner(mesh, stream_dtype=jnp.bfloat16)
    sb, mb = run_bf(step_fn, state, images, 2, B)
    np.testing.assert_allclose(
        np.asarray(mb["loss"]), np.asarray(mr["loss"]), rtol=2e-2
    )
    _trees_close(sb.trainable, sr.trainable, 5e-2)
