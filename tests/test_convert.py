"""Checkpoint conversion tests, including the strongest parity oracle in the
suite: our decoder and an independent torch transcription of the reference
math produce identical radiance from the same (converted) weights."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reni_tpu.models.reni import RENIConfig, RENIModel
from reni_tpu.utils import convert


def _model(conditioning="Cond-by-Concat", variational=True, lll=True):
    return RENIModel(
        RENIConfig(
            model_type="VariationalAutoDecoder" if variational else "AutoDecoder",
            conditioning=conditioning,
            equivariance="SO2",
            latent_dim=6,
            hidden_layers=2,
            hidden_features=32,
            mapping_layers=2,
            mapping_features=32,
            last_layer_linear=lll,
            output_activation="tanh",
        )
    )


@pytest.mark.parametrize("conditioning", ["Cond-by-Concat", "FiLM"])
@pytest.mark.parametrize("variational", [True, False])
def test_roundtrip_params_state_dict(conditioning, variational):
    model = _model(conditioning, variational)
    params = model.init(jax.random.PRNGKey(0), dataset_size=3)
    sd = convert.params_to_torch_state_dict(params, model.config)
    back = convert.torch_state_dict_to_params(sd, model.config)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        back,
    )


def test_concat_forward_matches_torch_transcription():
    """Export our weights to the reference layout, rebuild the reference's
    concat SO2 VAD forward in torch, compare radiance bit-for-bit-ish."""
    import torch

    model = _model()
    params = model.init(jax.random.PRNGKey(1), dataset_size=2)
    sd = {k: torch.from_numpy(v.copy()) for k, v in
          convert.params_to_torch_state_dict(params, model.config).items()}

    rng = np.random.default_rng(0)
    Z_np = rng.normal(size=(2, 6, 3)).astype(np.float32)
    D_np = rng.normal(size=(2, 40, 3)).astype(np.float32)

    # --- torch forward (independent transcription of the published math) ---
    Z, D = torch.from_numpy(Z_np), torch.from_numpy(D_np)
    Z_xz = torch.stack((Z[:, :, 0], Z[:, :, 2]), -1)
    D_xz = torch.stack((D[:, :, 0], D[:, :, 2]), -1)
    G = torch.bmm(Z_xz, Z_xz.transpose(1, 2))
    z_invar = G.flatten(1)[:, None].repeat(1, 40, 1)
    innerprod = torch.bmm(D_xz, Z_xz.transpose(1, 2))
    d_norm = torch.sqrt(D[:, :, 0] ** 2 + D[:, :, 2] ** 2)[..., None]
    z_y = Z[:, :, 1][:, None].repeat(1, 40, 1)
    d_y = D[:, :, 1][..., None]
    x = torch.cat((innerprod, z_invar, d_norm, z_y, d_y), 2)
    for i in range(3):  # first + 2 hidden sine layers
        w = sd[f"model.net.{i}.linear.weight"]
        b = sd[f"model.net.{i}.linear.bias"]
        x = torch.sin(30.0 * (x @ w.T + b))
    w, b = sd["model.net.3.weight"], sd["model.net.3.bias"]
    expected = torch.tanh(x @ w.T + b).numpy()

    ours = np.asarray(model.apply(params, jnp.asarray(Z_np), jnp.asarray(D_np)))
    np.testing.assert_allclose(ours, expected, atol=2e-5)


def test_film_forward_matches_torch_transcription():
    import torch
    import torch.nn.functional as F

    model = _model("FiLM")
    params = model.init(jax.random.PRNGKey(2), dataset_size=2)
    sd = {k: torch.from_numpy(v.copy()) for k, v in
          convert.params_to_torch_state_dict(params, model.config).items()}

    rng = np.random.default_rng(3)
    Z_np = rng.normal(size=(2, 6, 3)).astype(np.float32)
    D_np = rng.normal(size=(2, 40, 3)).astype(np.float32)
    Z, D = torch.from_numpy(Z_np), torch.from_numpy(D_np)

    Z_xz = torch.stack((Z[:, :, 0], Z[:, :, 2]), -1)
    D_xz = torch.stack((D[:, :, 0], D[:, :, 2]), -1)
    G = torch.bmm(Z_xz, Z_xz.transpose(1, 2))
    z_invar = G.flatten(1)[:, None].repeat(1, 40, 1)
    innerprod = torch.bmm(D_xz, Z_xz.transpose(1, 2))
    d_norm = torch.sqrt(D[:, :, 0] ** 2 + D[:, :, 2] ** 2)[..., None]
    z_y = Z[:, :, 1][:, None].repeat(1, 40, 1)
    d_y = D[:, :, 1][..., None]
    siren_in = torch.cat((d_norm, d_y, innerprod), 2)
    mapping_in = torch.cat((z_invar, z_y), 2)  # reference tiles per-pixel

    # mapping_layers=2 -> linears at network.{0,2}, final at network.4
    h = mapping_in
    h = F.leaky_relu(h @ sd["model.mapping_network.network.0.weight"].T
                     + sd["model.mapping_network.network.0.bias"], 0.2)
    h = F.leaky_relu(h @ sd["model.mapping_network.network.2.weight"].T
                     + sd["model.mapping_network.network.2.bias"], 0.2)
    out_map = h @ sd["model.mapping_network.network.4.weight"].T \
        + sd["model.mapping_network.network.4.bias"]
    half = out_map.shape[-1] // 2
    freqs, phases = out_map[..., :half] * 15 + 30, out_map[..., half:]

    x = siren_in
    hf = 32
    for i in range(2):  # siren_hidden_layers=2 trunk FiLM layers
        w = sd[f"model.net.{i}.layer.weight"]
        b = sd[f"model.net.{i}.layer.bias"]
        pre = x @ w.T + b
        x = torch.sin(freqs[..., i * hf : (i + 1) * hf] * pre
                      + phases[..., i * hf : (i + 1) * hf])
    expected = torch.tanh(
        x @ sd["model.final_layer.weight"].T + sd["model.final_layer.bias"]
    ).numpy()

    ours = np.asarray(model.apply(params, jnp.asarray(Z_np), jnp.asarray(D_np)))
    np.testing.assert_allclose(ours, expected, atol=2e-5)


def test_load_reference_checkpoint_file(tmp_path):
    """A Lightning-style .ckpt (state_dict + hyper_parameters.config as a
    plain dict) loads into working params."""
    import torch

    model = _model()
    params = model.init(jax.random.PRNGKey(4), dataset_size=2)
    sd = {k: torch.from_numpy(v.copy()) for k, v in
          convert.params_to_torch_state_dict(params, model.config).items()}
    yacs_like = {
        "RENI": {
            "MODEL_TYPE": "VariationalAutoDecoder",
            "CONDITIONING": "Cond-by-Concat",
            "EQUIVARIANCE": "SO2",
            "LATENT_DIMENSION": 6,
            "HIDDEN_LAYERS": 2,
            "HIDDEN_FEATURES": 32,
            "OUT_FEATURES": 3,
            "LAST_LAYER_LINEAR": True,
            "OUTPUT_ACTIVATION": "tanh",
            "FIRST_OMEGA_0": 30.0,
            "HIDDEN_OMEGA_0": 30.0,
            "MAPPING_LAYERS": 2,
            "MAPPING_FEATURES": 32,
        }
    }
    path = str(tmp_path / "reference.ckpt")
    torch.save({"state_dict": sd, "hyper_parameters": {"config": yacs_like}}, path)

    loaded, cfg = convert.load_reference_checkpoint(path, task="FIT_LATENT")
    assert cfg.fixed_decoder is True
    assert cfg.latent_dim == 6
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-7
        ),
        params["decoder"],
        loaded["decoder"],
    )


def test_train_step_gradients_match_torch():
    """One FIT_DECODER gradient (AutoDecoder: deterministic, no sampling)
    computed by our jnp pipeline vs a torch transcription of the reference's
    loss and model on converted weights — every weight/latent gradient must
    match. This validates the entire differentiable path end-to-end."""
    import torch

    from reni_tpu.core import sphere
    from reni_tpu.train import losses

    model = _model(variational=False)
    params = model.init(jax.random.PRNGKey(5), dataset_size=2)
    sd = {k: torch.from_numpy(v.copy()).requires_grad_() for k, v in
          convert.params_to_torch_state_dict(params, model.config).items()}

    width = 16
    npix = 128
    D_np = np.asarray(sphere.get_directions(width))
    SW_np = np.asarray(sphere.get_sineweight(width))
    rng = np.random.default_rng(6)
    target_np = rng.normal(size=(2, npix, 3)).astype(np.float32) * 0.3

    # ---- torch forward+backward (independent transcription) ----
    Z = sd["model.Z"]
    D = torch.from_numpy(np.broadcast_to(D_np, (2, npix, 3)).copy())
    SW = torch.from_numpy(np.broadcast_to(SW_np, (2, npix, 3)).copy())
    target = torch.from_numpy(target_np)

    Z_xz = torch.stack((Z[:, :, 0], Z[:, :, 2]), -1)
    D_xz = torch.stack((D[:, :, 0], D[:, :, 2]), -1)
    G = torch.bmm(Z_xz, Z_xz.transpose(1, 2)).flatten(1)[:, None].repeat(1, npix, 1)
    ip = torch.bmm(D_xz, Z_xz.transpose(1, 2))
    dn = torch.sqrt(D[:, :, 0] ** 2 + D[:, :, 2] ** 2)[..., None]
    zy = Z[:, :, 1][:, None].repeat(1, npix, 1)
    x = torch.cat((ip, G, dn, zy, D[:, :, 1][..., None]), 2)
    for i in range(3):
        x = torch.sin(30.0 * (x @ sd[f"model.net.{i}.linear.weight"].T
                              + sd[f"model.net.{i}.linear.bias"]))
    out = torch.tanh(x @ sd["model.net.3.weight"].T + sd["model.net.3.bias"])
    loss_t = (((out - target) ** 2) * SW).view(2, -1).mean(1).sum(0)
    loss_t.backward()

    # ---- our pipeline ----
    import jax.numpy as jnp

    D_j = jnp.asarray(D_np)
    SW_j = jnp.asarray(SW_np)
    tgt = jnp.asarray(target_np)

    def loss_fn(p):
        Zj = p["latents"]["Z"]
        o = model.apply(p, Zj, D_j)
        return losses.weighted_mse(o, tgt, SW_j)

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)

    g_sd = convert.params_to_torch_state_dict(grads, model.config)
    for k, torch_param in sd.items():
        ours = g_sd[k]
        theirs = torch_param.grad.numpy()
        np.testing.assert_allclose(
            ours, theirs, rtol=1e-3, atol=2e-5,
            err_msg=f"gradient mismatch for {k}",
        )


def test_training_trajectory_matches_torch():
    """20 epochs of AD FIT_DECODER: our jit-scanned loop vs a torch loop
    (Adam + per-epoch ExponentialLR, reference semantics) from identical
    weights — the loss trajectories and final parameters must agree.
    Pins optimizer and schedule semantics, not just one gradient."""
    import math

    import torch

    from reni_tpu.core import sphere
    from reni_tpu.train import tasks
    from reni_tpu.train.optim import OptimConfig

    model = _model(variational=False)
    params = model.init(jax.random.PRNGKey(7), dataset_size=2)
    width, npix, epochs = 16, 128, 20
    lr0, lr1 = 1e-3, 1e-4

    rng = np.random.default_rng(8)
    target_np = (rng.normal(size=(2, npix, 3)) * 0.3).astype(np.float32)
    D_np = np.asarray(sphere.get_directions(width))
    SW_np = np.asarray(sphere.get_sineweight(width))

    # ---- torch loop ----
    sd = {k: torch.from_numpy(v.copy()).requires_grad_() for k, v in
          convert.params_to_torch_state_dict(params, model.config).items()}
    opt = torch.optim.Adam(list(sd.values()), lr=lr0, betas=(0.0, 0.999))
    gamma = math.exp(math.log(lr1 / lr0) / epochs)
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=gamma)
    D = torch.from_numpy(np.broadcast_to(D_np, (2, npix, 3)).copy())
    SW = torch.from_numpy(np.broadcast_to(SW_np, (2, npix, 3)).copy())
    target = torch.from_numpy(target_np)
    torch_losses = []
    for _ in range(epochs):
        opt.zero_grad()
        Z = sd["model.Z"]
        Z_xz = torch.stack((Z[:, :, 0], Z[:, :, 2]), -1)
        D_xz = torch.stack((D[:, :, 0], D[:, :, 2]), -1)
        G = torch.bmm(Z_xz, Z_xz.transpose(1, 2)).flatten(1)[:, None].repeat(1, npix, 1)
        ip = torch.bmm(D_xz, Z_xz.transpose(1, 2))
        dn = torch.sqrt(D[:, :, 0] ** 2 + D[:, :, 2] ** 2)[..., None]
        zy = Z[:, :, 1][:, None].repeat(1, npix, 1)
        x = torch.cat((ip, G, dn, zy, D[:, :, 1][..., None]), 2)
        for i in range(3):
            x = torch.sin(30.0 * (x @ sd[f"model.net.{i}.linear.weight"].T
                                  + sd[f"model.net.{i}.linear.bias"]))
        out = torch.tanh(x @ sd["model.net.3.weight"].T + sd["model.net.3.bias"])
        loss = (((out - target) ** 2) * SW).view(2, -1).mean(1).sum(0)
        loss.backward()
        opt.step()
        sched.step()
        torch_losses.append(float(loss))

    # ---- our loop ----
    import jax.numpy as jnp

    cfg = tasks.TaskConfig(
        task="FIT_DECODER",
        optim=OptimConfig(lr_start=lr0, lr_end=lr1, beta1=0.0, beta2=0.999),
        batch_size=2,
        epochs=epochs,
        multi_res_training=False,
        final_resolution=(width // 2, width),
    )
    new_params, metrics = tasks.fit_task(
        model, params, cfg, lambda r: jnp.asarray(target_np), jax.random.PRNGKey(9)
    )
    np.testing.assert_allclose(
        metrics["fit_decoder_loss"], torch_losses, rtol=2e-4
    )
    final_sd = convert.params_to_torch_state_dict(new_params, model.config)
    for k, t in sd.items():
        np.testing.assert_allclose(
            final_sd[k], t.detach().numpy(), rtol=1e-3, atol=3e-5,
            err_msg=f"parameter divergence at {k}",
        )


def test_convert_cli_round_trip(tmp_path):
    """cli/convert round trip: ours -> Lightning .ckpt -> ours preserves the
    decode exactly."""
    import jax
    import jax.numpy as jnp

    from reni_tpu.cli.convert import main as convert_main
    from reni_tpu.core import sphere
    from reni_tpu.models.reni import RENIConfig, RENIModel
    from reni_tpu.train import checkpoint as ckpt

    cfg = RENIConfig(latent_dim=4, hidden_layers=1, hidden_features=16,
                     output_activation="tanh")
    model = RENIModel(cfg)
    params = model.init(jax.random.PRNGKey(0), dataset_size=3)
    ours = str(tmp_path / "ours")
    ckpt.save_checkpoint(ours, params, model_config=cfg, metadata={})

    pt = str(tmp_path / "ref.ckpt")
    assert convert_main(["--to_torch", ours, "--out", pt]) == 0
    import torch

    blob = torch.load(pt, weights_only=False)
    assert any(k.startswith("model.net.") for k in blob["state_dict"])
    # the exported ckpt embeds a reference-layout config, so the import
    # side needs nothing else — the genuine zoo-migration path
    back = str(tmp_path / "back")
    assert convert_main(["--from_torch", pt, "--out", back]) == 0
    params2, _ = ckpt.load_checkpoint(back)
    D = sphere.get_directions(16)
    Z = model.latents(params, jnp.arange(3))
    np.testing.assert_allclose(
        np.asarray(model.apply(params, Z, D)),
        np.asarray(model.apply({"decoder": params2["decoder"],
                                "latents": params2["latents"]}, Z, D)),
        atol=1e-6,
    )
