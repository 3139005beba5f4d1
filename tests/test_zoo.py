"""The bundled pretrained zoo (data/Zoo) — the zero-egress analog of the
reference's Google-Drive model zoo (reference src/utils/utils.py:93-103,
setup.py:5-11).

Each bundled model must load through the public surfaces a reference user
would reach for: the notebook recipe (checkpoint -> decoder-only partial
load -> decode), the serving artifact (cli.serve / serve.load_exported),
and download_pretrained_models provisioning."""

import os

import numpy as np
import pytest

from reni_tpu.utils import assets

pytestmark = pytest.mark.skipif(
    not assets.zoo_models(), reason="no bundled zoo in this checkout"
)


def test_zoo_discovery_lists_flagship():
    models = assets.zoo_models()
    assert models, "data/Zoo exists but holds no checkpoint.npz dirs"
    for name, d in models.items():
        assert os.path.isfile(os.path.join(d, "checkpoint.npz"))
        assert os.path.isfile(os.path.join(d, "decoder.jaxexport"))
        assert os.path.isfile(os.path.join(d, "config.yaml"))


def test_zoo_checkpoint_decodes():
    """checkpoint -> model rebuild -> finite tanh-bounded radiance."""
    from reni_tpu.core import sphere
    from reni_tpu.models.reni import RENIModel
    from reni_tpu.train import checkpoint as ckpt

    name = sorted(assets.zoo_models())[0]
    path = assets.zoo_checkpoint(name)
    params, _ = ckpt.load_checkpoint(path)
    cfg = ckpt.load_model_config(path)
    assert cfg.latent_dim == 49 and cfg.hidden_features == 256
    model = RENIModel(cfg)
    lat = params["latents"]
    Z = np.asarray(lat.get("mu", lat.get("Z")))[:2]
    D = np.broadcast_to(np.asarray(sphere.get_directions(32)), (2, 512, 3))
    out = np.asarray(model.apply(params, Z, D))
    assert out.shape == (2, 512, 3)
    assert np.isfinite(out).all()
    assert np.abs(out).max() <= 1.0 + 1e-5  # tanh output activation
    # a trained decoder is not the constant function
    assert out.std() > 1e-3


def test_zoo_artifact_matches_checkpoint_decode():
    """The cpu+tpu serving artifact reproduces the in-process decode."""
    import dataclasses

    from reni_tpu import serve
    from reni_tpu.core import sphere
    from reni_tpu.models.reni import RENIModel
    from reni_tpu.train import checkpoint as ckpt

    name = sorted(assets.zoo_models())[0]
    d = assets.zoo_models()[name]
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
    want = np.asarray(
        model.apply({"decoder": params["decoder"]}, Z, D)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=0)


def test_zoo_partial_load_notebook_recipe():
    """The examples.ipynb contract: rebuild at a NEW dataset size with
    fixed_decoder=True and load only the decoder (reference
    src/models/RENI.py:347-360, examples.ipynb cell 4)."""
    import jax

    from reni_tpu.models.reni import build_model
    from reni_tpu.train import checkpoint as ckpt

    name = sorted(assets.zoo_models())[0]
    path = assets.zoo_checkpoint(name)
    cfg = ckpt.load_model_config(path, fixed_decoder=True)
    model = build_model(cfg)
    params = ckpt.load_decoder_only(
        path, model, dataset_size=5, key=jax.random.PRNGKey(0)
    )
    lat = params["latents"]
    table = np.asarray(lat.get("mu", lat.get("Z")))
    assert table.shape[0] == 5  # fresh latent rows at the new size


def test_download_pretrained_models_provisions_bundle(tmp_path):
    out = tmp_path / "zoo"
    assets.download_pretrained_models(str(out))
    names = sorted(os.listdir(out))
    assert names == sorted(assets.zoo_models())
    # idempotent second call (already provisioned)
    assets.download_pretrained_models(str(out))
