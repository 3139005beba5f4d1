"""The bundled pretrained zoo matrix (data/Zoo) — the zero-egress analog of
the reference's Google-Drive model zoo (reference run.py:44-49,
src/utils/utils.py:93-103, setup.py:5-11).

Each bundled model must load through the public surfaces a reference user
would reach for: the notebook recipe (checkpoint -> decoder-only partial
load -> decode), the serving artifact (cli.serve / serve.load_exported),
and download_pretrained_models provisioning."""

import json
import os

import numpy as np
import pytest

from reni_tpu.utils import assets

pytestmark = pytest.mark.skipif(
    not assets.zoo_models(), reason="no bundled zoo in this checkout"
)


def test_zoo_matrix_covers_reference_axes():
    """The committed matrix spans the reference zoo's behavioural axes
    (run.py:44-49): both conditionings, more than one latent capacity, and
    both dynamic ranges — every entry named by the reference scheme."""
    models = assets.zoo_models()
    assert len(models) >= 6, sorted(models)
    for name, d in models.items():
        assert name.startswith("latent_dim_"), name
        assert os.path.isfile(os.path.join(d, "checkpoint.npz"))
        assert os.path.isfile(os.path.join(d, "decoder.jaxexport"))
        assert os.path.isfile(os.path.join(d, "config.yaml"))
    assert any("_cbc_" in n for n in models)
    assert any("_film_" in n for n in models)
    assert any(n.endswith("_hdr") for n in models)
    assert any(n.endswith("_ldr") for n in models)
    # both model types and both output activations (reference run.py:44-49
    # naming spans {vad,ad} and {tanh,exp})
    assert any("_vad_" in n for n in models)
    assert any("_ad_" in n for n in models)
    assert any("_tanh_" in n for n in models)
    assert any("_exp_" in n for n in models)
    dims = {n.split("_")[2] for n in models}
    assert len(dims) >= 2, dims


def test_zoo_default_is_best_measured_prior():
    """zoo_default() resolves to the entry with the highest eval-card test
    PSNR (the 'best prior' contract behind fit_prior --checkpoint zoo)."""
    models = assets.zoo_models()
    best = assets.zoo_default()
    assert best in models

    def psnr_of(d):
        try:
            with open(os.path.join(d, "eval.json")) as f:
                return float(json.load(f)["psnr_mean"])
        except (OSError, KeyError, ValueError):
            return float("-inf")

    assert psnr_of(models[best]) == max(psnr_of(d) for d in models.values())


def test_zoo_checkpoints_decode():
    """Every entry: checkpoint -> model rebuild -> finite bounded radiance."""
    from reni_tpu.core import sphere
    from reni_tpu.models.reni import RENIModel
    from reni_tpu.train import checkpoint as ckpt

    for name in sorted(assets.zoo_models()):
        path = assets.zoo_checkpoint(name)
        params, _ = ckpt.load_checkpoint(path)
        cfg = ckpt.load_model_config(path)
        assert cfg.hidden_features == 256, name
        assert f"latent_dim_{cfg.latent_dim}_" in name
        model = RENIModel(cfg)
        lat = params["latents"]
        Z = np.asarray(lat.get("mu", lat.get("Z")))[:2]
        D = np.broadcast_to(np.asarray(sphere.get_directions(32)), (2, 512, 3))
        out = np.asarray(model.apply(params, Z, D))
        assert out.shape == (2, 512, 3), name
        assert np.isfinite(out).all(), name
        if cfg.output_activation == "tanh":
            assert np.abs(out).max() <= 1.0 + 1e-5, name
        elif cfg.output_activation == "exp":
            assert out.min() > 0.0, name  # linear radiance
        # a trained decoder is not the constant function
        assert out.std() > 1e-3, name


def test_zoo_artifacts_match_checkpoint_decode():
    """Every entry's cpu+tpu serving artifact reproduces the in-process
    decode."""
    import dataclasses

    from reni_tpu import serve
    from reni_tpu.core import sphere
    from reni_tpu.models.reni import RENIModel
    from reni_tpu.train import checkpoint as ckpt

    for name, d in sorted(assets.zoo_models().items()):
        path = assets.zoo_checkpoint(name)
        params, _ = ckpt.load_checkpoint(path)
        # the artifact intentionally exports the XLA trunk (serve.py:
        # pallas_call is an opaque, non-portable custom call) — compare
        # against the same path
        cfg = dataclasses.replace(
            ckpt.load_model_config(path, fixed_decoder=True), use_pallas=False
        )
        model = RENIModel(cfg)
        lat = params["latents"]
        Z = np.asarray(lat.get("mu", lat.get("Z")))[:2].astype(np.float32)
        D = np.broadcast_to(
            np.asarray(sphere.get_directions(32), np.float32), (2, 512, 3)
        )
        fn = serve.load_exported(os.path.join(d, "decoder.jaxexport"))
        got = np.asarray(fn(Z, D))
        want = np.asarray(model.apply({"decoder": params["decoder"]}, Z, D))
        # exp-activation radiance is unbounded, so the bound is relative
        # there; tanh entries keep the tight absolute bound
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5, err_msg=name)


def test_zoo_partial_load_notebook_recipe():
    """The examples.ipynb contract: rebuild at a NEW dataset size with
    fixed_decoder=True and load only the decoder (reference
    src/models/RENI.py:347-360, examples.ipynb cell 4) — on the default
    (best) prior, the one fit_prior resolves."""
    import jax

    from reni_tpu.models.reni import build_model
    from reni_tpu.train import checkpoint as ckpt

    path = assets.zoo_checkpoint(assets.zoo_default())
    cfg = ckpt.load_model_config(path, fixed_decoder=True)
    model = build_model(cfg)
    params = ckpt.load_decoder_only(
        path, model, dataset_size=5, key=jax.random.PRNGKey(0)
    )
    lat = params["latents"]
    table = np.asarray(lat.get("mu", lat.get("Z")))
    assert table.shape[0] == 5  # fresh latent rows at the new size


def test_zoo_checkpoints_carry_no_optimizer_state():
    """Packaged artifacts ship weights only — make_zoo strips __opt__/__rng__
    (a periodic save that wins the lowest-loss scan carries adam moments)."""
    for name, d in sorted(assets.zoo_models().items()):
        for fname in ("checkpoint.npz", "latents_test.npz"):
            p = os.path.join(d, fname)
            if not os.path.isfile(p):
                continue
            with np.load(p) as z:
                bad = [k for k in z.files
                       if k.startswith("__opt__") or k == "__rng__"]
            assert not bad, (name, fname, bad)


def test_download_pretrained_models_provisions_bundle(tmp_path):
    out = tmp_path / "zoo"
    assets.download_pretrained_models(str(out))
    names = sorted(os.listdir(out))
    assert names == sorted(assets.zoo_models())
    # idempotent second call (already provisioned)
    assets.download_pretrained_models(str(out))
