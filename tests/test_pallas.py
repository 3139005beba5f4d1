"""Fused Pallas kernel parity vs the jnp decomposed path (interpret mode on
CPU; the same kernel compiles on TPU — exercised by bench.py)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reni_tpu.kernels.siren_pallas import fused_apply
from reni_tpu.models.reni import RENIConfig, RENIModel


def _setup(equiv="SO2", N=9, L=3, H=128, act="tanh"):
    cfg = RENIConfig(
        model_type="AutoDecoder",
        equivariance=equiv,
        latent_dim=N,
        hidden_layers=L,
        hidden_features=H,
        output_activation=act,
    )
    model = RENIModel(cfg)
    params = model.init(jax.random.PRNGKey(0), dataset_size=3)
    rng = np.random.default_rng(1)
    Z = jnp.asarray(rng.normal(size=(3, N, 3)).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(1, 256, 3)).astype(np.float32))
    return model, params, Z, D


def _pallas(model, params, Z, D, trunk="float32"):
    cfg = model.config
    return fused_apply(
        params["decoder"],
        cfg.equivariance,
        cfg.latent_dim,
        Z,
        D,
        hidden_layers=cfg.hidden_layers,
        hidden_features=cfg.hidden_features,
        out_features=cfg.out_features,
        first_omega_0=cfg.first_omega_0,
        hidden_omega_0=cfg.hidden_omega_0,
        output_activation=cfg.output_activation,
        trunk=trunk,
        interpret=True,
    )


@pytest.mark.parametrize("equiv", ["SO3", "SO2", "None"])
def test_fused_forward_matches_jnp(equiv):
    model, params, Z, D = _setup(equiv=equiv)
    ref = np.asarray(model.apply(params, Z, D))
    out = np.asarray(_pallas(model, params, Z, D))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_fused_gradients_match_jnp():
    model, params, Z, D = _setup()

    def loss_p(dec, z):
        return jnp.sum(
            _pallas(model, {"decoder": dec, "latents": params["latents"]}, z, D) ** 2
        )

    def loss_r(dec, z):
        return jnp.sum(
            model.apply({"decoder": dec, "latents": params["latents"]}, z, D) ** 2
        )

    gp = jax.grad(loss_p, argnums=(0, 1))(params["decoder"], Z)
    gr = jax.grad(loss_r, argnums=(0, 1))(params["decoder"], Z)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=2e-5
        ),
        gp,
        gr,
    )


def test_model_level_pallas_flag():
    """RENIModel.apply dispatches to the kernel when use_pallas is set and
    produces the same output (interpret path not reachable through the flag,
    so compare at tolerance via the kernel's own interpret call)."""
    model, params, Z, D = _setup()
    cfg_p = dataclasses.replace(model.config, use_pallas=True, pallas_trunk="float32")
    # On CPU the non-interpret pallas_call still works through the
    # interpreter-capable lowering only when interpret=True; here we just
    # check the dispatch guard logic falls back cleanly for unsupported
    # shapes (hidden not multiple of 128).
    cfg_small = dataclasses.replace(cfg_p, hidden_features=32)
    model_small = RENIModel(cfg_small)
    params_small = model_small.init(jax.random.PRNGKey(2), dataset_size=3)
    out = model_small.apply(params_small, Z, D)  # falls back to jnp path
    assert out.shape == (3, 256, 3)


def test_fused_bf16_trunk_close():
    model, params, Z, D = _setup()
    ref = np.asarray(model.apply(params, Z, D))
    out = np.asarray(_pallas(model, params, Z, D, trunk="bfloat16"))
    # bf16 matmul inputs, f32 accumulation: outputs inside tanh stay close
    assert np.abs(out - ref).max() < 0.05
    assert np.abs(out - ref).mean() < 0.01


def test_fused_film_single_trunk_layer():
    """hidden_layers=1 makes the FiLM ws stack zero-length; the kernel must
    pad the dummy operand instead of handing pallas a zero-extent block
    (regression: the CLI graph dump crashed with ZeroDivisionError on the
    default FiLM config with 1 trunk layer)."""
    model, params, Z, D = _setup_film(L=1)
    ref = np.asarray(model.apply(params, Z, D))
    out = np.asarray(_pallas_film(model, params, Z, D))
    np.testing.assert_allclose(out, ref, atol=1e-5)

    def loss_p(dec, z):
        return jnp.sum(
            _pallas_film(
                model, {"decoder": dec, "latents": params["latents"]}, z, D
            )
            ** 2
        )

    def loss_r(dec, z):
        return jnp.sum(
            model.apply({"decoder": dec, "latents": params["latents"]}, z, D) ** 2
        )

    gp = jax.grad(loss_p, argnums=(0, 1))(params["decoder"], Z)
    gr = jax.grad(loss_r, argnums=(0, 1))(params["decoder"], Z)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=2e-5
        ),
        gp,
        gr,
    )


def _setup_film(equiv="SO2", N=9, L=3, H=128, act="tanh"):
    cfg = RENIConfig(
        model_type="AutoDecoder",
        conditioning="FiLM",
        equivariance=equiv,
        latent_dim=N,
        hidden_layers=L,
        hidden_features=H,
        mapping_layers=2,
        mapping_features=64,
        output_activation=act,
    )
    model = RENIModel(cfg)
    params = model.init(jax.random.PRNGKey(20), dataset_size=3)
    rng = np.random.default_rng(21)
    Z = jnp.asarray(rng.normal(size=(3, N, 3)).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(1, 256, 3)).astype(np.float32))
    return model, params, Z, D


def _pallas_film(model, params, Z, D, trunk="float32"):
    from reni_tpu.kernels.siren_pallas import fused_film_apply

    cfg = model.config
    return fused_film_apply(
        params["decoder"],
        cfg.equivariance,
        Z,
        D,
        hidden_layers=cfg.hidden_layers,
        hidden_features=cfg.hidden_features,
        out_features=cfg.out_features,
        output_activation=cfg.output_activation,
        trunk=trunk,
        interpret=True,
    )


@pytest.mark.parametrize("equiv", ["SO3", "SO2", "None"])
def test_fused_film_forward_matches_jnp(equiv):
    model, params, Z, D = _setup_film(equiv=equiv)
    ref = np.asarray(model.apply(params, Z, D))
    out = np.asarray(_pallas_film(model, params, Z, D))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_fused_film_gradients_match_jnp():
    model, params, Z, D = _setup_film()

    def loss_p(dec, z):
        return jnp.sum(
            _pallas_film(model, {"decoder": dec, "latents": params["latents"]}, z, D)
            ** 2
        )

    def loss_r(dec, z):
        return jnp.sum(
            model.apply({"decoder": dec, "latents": params["latents"]}, z, D) ** 2
        )

    gp = jax.grad(loss_p, argnums=(0, 1))(params["decoder"], Z)
    gr = jax.grad(loss_r, argnums=(0, 1))(params["decoder"], Z)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-5
        ),
        gp,
        gr,
    )


def test_fused_apply_fast_sine_matches_fast_jnp():
    """Kernel with fast_sine must equal the jnp decomposed path with the
    same fast sine (identical semantics, different executor)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from reni_tpu.kernels.siren_pallas import fused_apply
    from reni_tpu.models import siren
    from reni_tpu.models.reni import RENIConfig, RENIModel

    cfg = RENIConfig(
        equivariance="SO2",
        latent_dim=4,
        hidden_layers=2,
        hidden_features=128,
        output_activation="tanh",
    )
    model = RENIModel(cfg)
    params = model.init(jax.random.PRNGKey(0), dataset_size=2)
    rng = np.random.default_rng(2)
    Z = jnp.asarray(rng.normal(size=(2, 4, 3)).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(1, 128, 3)).astype(np.float32))

    ref = siren.apply_siren_decomposed(
        params["decoder"], "SO2", 4, Z,
        jnp.broadcast_to(D, (2, 128, 3)),
        last_layer_linear=True, output_activation="tanh",
        first_omega_0=30.0, hidden_omega_0=30.0, fast_sine=True,
    )
    out = fused_apply(
        params["decoder"], "SO2", 4, Z, D,
        hidden_layers=2, hidden_features=128, out_features=3,
        first_omega_0=30.0, hidden_omega_0=30.0, output_activation="tanh",
        trunk="float32", interpret=True, fast_sine=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # gradients through the custom VJP with fast sine/cosine
    def loss_k(p, z):
        o = fused_apply(
            p, "SO2", 4, z, D,
            hidden_layers=2, hidden_features=128, out_features=3,
            first_omega_0=30.0, hidden_omega_0=30.0, output_activation="tanh",
            trunk="float32", interpret=True, fast_sine=True,
        )
        return jnp.sum(o ** 2)

    def loss_j(p, z):
        o = siren.apply_siren_decomposed(
            p, "SO2", 4, z, jnp.broadcast_to(D, (2, 128, 3)),
            last_layer_linear=True, output_activation="tanh",
            first_omega_0=30.0, hidden_omega_0=30.0, fast_sine=True,
        )
        return jnp.sum(o ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1))(params["decoder"], Z)
    gj = jax.grad(loss_j, argnums=(0, 1))(params["decoder"], Z)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3
        ),
        gk,
        gj,
    )


def test_fused_apply_per_image_direction_grids():
    """The kernel accepts (B, P, 3) per-image grids, matching the jnp path
    (each image's tiles read their own direction block)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from reni_tpu.kernels.siren_pallas import fused_apply
    from reni_tpu.models import siren
    from reni_tpu.models.reni import RENIConfig, RENIModel

    cfg = RENIConfig(
        equivariance="SO2",
        latent_dim=4,
        hidden_layers=1,
        hidden_features=128,
        output_activation="tanh",
    )
    model = RENIModel(cfg)
    params = model.init(jax.random.PRNGKey(3), dataset_size=3)
    rng = np.random.default_rng(4)
    Z = jnp.asarray(rng.normal(size=(3, 4, 3)).astype(np.float32))
    D = rng.normal(size=(3, 128, 3)).astype(np.float32)
    D = jnp.asarray(D / np.linalg.norm(D, axis=-1, keepdims=True))

    ref = siren.apply_siren_decomposed(
        params["decoder"], "SO2", 4, Z, D,
        last_layer_linear=True, output_activation="tanh",
        first_omega_0=30.0, hidden_omega_0=30.0,
    )
    out = fused_apply(
        params["decoder"], "SO2", 4, Z, D,
        hidden_layers=1, hidden_features=128, out_features=3,
        first_omega_0=30.0, hidden_omega_0=30.0, output_activation="tanh",
        trunk="float32", interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_env_tile_override(monkeypatch):
    """RENI_TPU_PALLAS_TILE caps the tile (on-chip A/B sweeps)."""
    from reni_tpu.kernels.siren_pallas import _env_tile

    monkeypatch.setenv("RENI_TPU_PALLAS_TILE", "128")
    assert _env_tile(512) == 128
    monkeypatch.delenv("RENI_TPU_PALLAS_TILE")
    assert _env_tile(512) == 512




# ---------------------------------------------------------------------------
# single-launch train-step kernel (fused_step_mse)
# ---------------------------------------------------------------------------


def _step_mse(model, params, Z, D, tgt, sw, bm, trunk="float32"):
    from reni_tpu.kernels.siren_pallas import fused_step_mse

    cfg = model.config
    return fused_step_mse(
        params["decoder"],
        cfg.equivariance,
        cfg.latent_dim,
        Z,
        D,
        tgt,
        sw,
        bm,
        hidden_layers=cfg.hidden_layers,
        hidden_features=cfg.hidden_features,
        out_features=cfg.out_features,
        first_omega_0=cfg.first_omega_0,
        hidden_omega_0=cfg.hidden_omega_0,
        output_activation=cfg.output_activation,
        trunk=trunk,
        interpret=True,
    )


@pytest.mark.parametrize("act", ["tanh", "exp", None])
@pytest.mark.parametrize("equiv", ["SO2", "SO3"])
def test_fused_step_loss_and_grads_match_reference(equiv, act):
    """fused_step_mse == losses.weighted_mse(model.apply(...), tgt,
    sw * bmask) — value AND gradients w.r.t. Z and every decoder param,
    including a zero-masked ragged row."""
    from reni_tpu.train import losses

    model, params, Z, D = _setup(equiv=equiv, act=act)
    rng = np.random.default_rng(7)
    B, P = Z.shape[0], D.shape[1]
    scale = 0.02 if act == "exp" else 1.0  # keep exp well-conditioned
    tgt = jnp.asarray(rng.normal(size=(B, P, 3)).astype(np.float32))
    sw = jnp.asarray(np.abs(rng.normal(size=(1, P, 3))).astype(np.float32))
    bm = jnp.asarray([1.0, 1.0, 0.0], jnp.float32)  # ragged tail row

    def loss_fused(dec, z):
        p = {"decoder": dec, "latents": params["latents"]}
        return _step_mse(model, p, z * scale, D, tgt, sw, bm)

    def loss_ref(dec, z):
        p = {"decoder": dec, "latents": params["latents"]}
        out = model.apply(p, z * scale, D)
        return losses.weighted_mse(out, tgt, sw * bm[:, None, None])

    lf, gf = jax.value_and_grad(loss_fused, argnums=(0, 1))(
        params["decoder"], Z
    )
    lr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1))(
        params["decoder"], Z
    )
    np.testing.assert_allclose(float(lf), float(lr), rtol=2e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-6
        ),
        gf,
        gr,
    )


def test_fused_step_cotangent_scaling():
    """The vjp must scale by the incoming cotangent (loss = c * mse + ...)."""
    model, params, Z, D = _setup()
    rng = np.random.default_rng(3)
    B, P = Z.shape[0], D.shape[1]
    tgt = jnp.asarray(rng.normal(size=(B, P, 3)).astype(np.float32))
    sw = jnp.ones((1, P, 3), jnp.float32)
    bm = jnp.ones((B,), jnp.float32)

    g1 = jax.grad(lambda z: _step_mse(model, params, z, D, tgt, sw, bm))(Z)
    g3 = jax.grad(
        lambda z: 3.0 * _step_mse(model, params, z, D, tgt, sw, bm)
    )(Z)
    np.testing.assert_allclose(np.asarray(g3), 3.0 * np.asarray(g1), rtol=1e-5)


def test_fit_decoder_step_fused_matches_xla_path():
    """make_fit_decoder_step must produce the same losses and updated
    params whether the fused step kernel serves the MSE or the XLA path
    does (trace-time dispatch on fused_step_reason) — for both VAD and AD,
    with a ragged masked tail."""
    import dataclasses as dc

    from reni_tpu.core import sphere
    from reni_tpu.train import tasks
    from reni_tpu.train.optim import OptimConfig, build_optimizer

    for model_type in ("VariationalAutoDecoder", "AutoDecoder"):
        cfg = RENIConfig(
            model_type=model_type,
            equivariance="SO2",
            latent_dim=5,
            hidden_layers=2,
            hidden_features=128,
            output_activation="tanh",
            use_pallas=True,  # interpret-mode kernel on CPU
            pallas_trunk="float32",
        )
        model = RENIModel(cfg)
        params = model.init(jax.random.PRNGKey(0), dataset_size=5)
        directions = sphere.get_directions(32)
        sineweight = sphere.get_sineweight(32)
        optimizer = build_optimizer(
            OptimConfig(lr_start=1e-4, lr_end=1e-5, epochs=4, steps_per_epoch=1)
        )
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(
            rng.normal(size=(4, directions.shape[1], 3)).astype(np.float32)
        )
        batch = (
            imgs,
            jnp.asarray([0, 1, 2, 0], jnp.int32),
            jnp.asarray([1.0, 1.0, 1.0, 0.0], jnp.float32),
        )

        step_fused = tasks.make_fit_decoder_step(
            model, optimizer, directions, sineweight, kld_weighting=1e-4
        )
        model_xla = RENIModel(dc.replace(cfg, use_pallas=False))
        step_xla = tasks.make_fit_decoder_step(
            model_xla, optimizer, directions, sineweight, kld_weighting=1e-4
        )
        st = tasks.init_train_state(
            model, params, optimizer, jax.random.PRNGKey(1)
        )
        sf, mf = step_fused(st, batch)
        sx, mx = step_xla(st, batch)
        for k in mf:
            np.testing.assert_allclose(
                float(mf[k]), float(mx[k]), rtol=5e-5, err_msg=(model_type, k)
            )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
            ),
            sf.trainable,
            sx.trainable,
        )


@pytest.mark.parametrize("layers", [1, 3])
def test_fused_film_step_loss_and_grads_match_reference(layers):
    """FiLM fused_film_step_mse == weighted_mse(model.apply(...)) — value
    and gradients (incl. mapping-network grads through freqs/phases),
    with a zero-masked ragged row and the single-trunk-layer edge."""
    from reni_tpu.kernels.siren_pallas import fused_film_step_mse
    from reni_tpu.train import losses

    model, params, Z, D = _setup_film(L=layers)
    cfg = model.config
    rng = np.random.default_rng(5)
    B, P = Z.shape[0], D.shape[1]
    tgt = jnp.asarray(rng.normal(size=(B, P, 3)).astype(np.float32))
    sw = jnp.asarray(np.abs(rng.normal(size=(1, P, 3))).astype(np.float32))
    bm = jnp.asarray([1.0, 1.0, 0.0], jnp.float32)

    def loss_fused(dec, z):
        return fused_film_step_mse(
            dec, cfg.equivariance, z, D, tgt, sw, bm,
            hidden_layers=cfg.hidden_layers,
            hidden_features=cfg.hidden_features,
            out_features=cfg.out_features,
            output_activation=cfg.output_activation,
            trunk="float32", interpret=True,
        )

    def loss_ref(dec, z):
        out = model.apply({"decoder": dec, "latents": params["latents"]}, z, D)
        return losses.weighted_mse(out, tgt, sw * bm[:, None, None])

    lf, gf = jax.value_and_grad(loss_fused, argnums=(0, 1))(
        params["decoder"], Z
    )
    lr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1))(
        params["decoder"], Z
    )
    np.testing.assert_allclose(float(lf), float(lr), rtol=2e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=3e-6
        ),
        gf,
        gr,
    )


def test_fit_decoder_step_fused_film_matches_xla_path():
    """make_fit_decoder_step on a FiLM model dispatches to the FiLM fused
    step and matches the XLA path (losses + updated params)."""
    import dataclasses as dc

    from reni_tpu.core import sphere
    from reni_tpu.train import tasks
    from reni_tpu.train.optim import OptimConfig, build_optimizer

    cfg = RENIConfig(
        model_type="VariationalAutoDecoder",
        conditioning="FiLM",
        equivariance="SO2",
        latent_dim=5,
        hidden_layers=2,
        hidden_features=128,
        mapping_layers=2,
        mapping_features=64,
        output_activation="tanh",
        use_pallas=True,
        pallas_trunk="float32",
    )
    model = RENIModel(cfg)
    params = model.init(jax.random.PRNGKey(0), dataset_size=4)
    directions = sphere.get_directions(32)
    sineweight = sphere.get_sineweight(32)
    optimizer = build_optimizer(
        OptimConfig(lr_start=1e-4, lr_end=1e-5, epochs=4, steps_per_epoch=1)
    )
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.normal(size=(4, directions.shape[1], 3)).astype(np.float32)
    )
    batch = (
        imgs,
        jnp.asarray([0, 1, 2, 3], jnp.int32),
        jnp.asarray([1.0, 1.0, 1.0, 0.0], jnp.float32),
    )
    step_fused = tasks.make_fit_decoder_step(
        model, optimizer, directions, sineweight, kld_weighting=1e-4
    )
    model_xla = RENIModel(dataclasses.replace(cfg, use_pallas=False))
    step_xla = tasks.make_fit_decoder_step(
        model_xla, optimizer, directions, sineweight, kld_weighting=1e-4
    )
    st = tasks.init_train_state(model, params, optimizer, jax.random.PRNGKey(1))
    sf, mf = step_fused(st, batch)
    sx, mx = step_xla(st, batch)
    for k in mf:
        np.testing.assert_allclose(float(mf[k]), float(mx[k]), rtol=5e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        ),
        sf.trainable,
        sx.trainable,
    )
