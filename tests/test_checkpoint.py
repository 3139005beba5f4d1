"""Checkpoint round trips and decoder-only partial restore (SURVEY §5)."""

import numpy as np
import jax

from reni_tpu.models.reni import RENIConfig, RENIModel
from reni_tpu.train import checkpoint as ckpt


def _model(fixed=False):
    return RENIModel(
        RENIConfig(
            latent_dim=4,
            hidden_layers=1,
            hidden_features=16,
            mapping_layers=1,
            mapping_features=16,
            fixed_decoder=fixed,
        )
    )


def test_roundtrip(tmp_path):
    model = _model()
    params = model.init(jax.random.PRNGKey(0), dataset_size=3)
    path = str(tmp_path / "ck")
    ckpt.save_checkpoint(
        path, params, model_config=model.config, metadata={"task": "FIT_DECODER", "epoch": 7}
    )
    loaded, meta = ckpt.load_checkpoint(path)
    assert meta["task"] == "FIT_DECODER" and meta["epoch"] == 7
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        loaded,
    )


def test_model_config_restore(tmp_path):
    model = _model()
    params = model.init(jax.random.PRNGKey(1), dataset_size=2)
    path = str(tmp_path / "ck")
    ckpt.save_checkpoint(path, params, model_config=model.config)
    cfg = ckpt.load_model_config(path, fixed_decoder=True)
    assert cfg.latent_dim == 4
    assert cfg.fixed_decoder is True


def test_decoder_only_restore_new_dataset_size(tmp_path):
    model = _model()
    params = model.init(jax.random.PRNGKey(2), dataset_size=3)
    path = str(tmp_path / "ck")
    ckpt.save_checkpoint(path, params, model_config=model.config)

    fixed = _model(fixed=True)
    new = ckpt.load_decoder_only(path, fixed, dataset_size=11, key=jax.random.PRNGKey(3))
    assert new["latents"]["mu"].shape == (11, 4, 3)
    assert np.asarray(new["latents"]["mu"]).max() == 0.0  # fixed-decoder init
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params["decoder"],
        new["decoder"],
    )

    # the restored decoder decodes identically
    rng = np.random.default_rng(0)
    Z = jax.numpy.asarray(rng.normal(size=(1, 4, 3)).astype(np.float32))
    D = jax.numpy.asarray(rng.normal(size=(1, 10, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(model.apply(params, Z, D)), np.asarray(fixed.apply(new, Z, D))
    )
