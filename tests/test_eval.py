"""Evaluation harness tests: PSNR sanity, the rotation-equivariance eval
(BASELINE config 3), in-painting region PSNR."""

import numpy as np
import jax
import jax.numpy as jnp

from reni_tpu import eval as ev
from reni_tpu.core import sphere
from reni_tpu.models.reni import RENIConfig, RENIModel
from reni_tpu.train import tasks
from reni_tpu.train.optim import OptimConfig


def _fit_model(images, res, epochs=250, N=8):
    model = RENIModel(
        RENIConfig(
            model_type="AutoDecoder",
            equivariance="SO2",
            latent_dim=N,
            hidden_layers=2,
            hidden_features=64,
            output_activation=None,
        )
    )
    params = model.init(jax.random.PRNGKey(0), dataset_size=images.shape[0])
    cfg = tasks.TaskConfig(
        task="FIT_DECODER",
        optim=OptimConfig(lr_start=1e-3, lr_end=1e-4, beta1=0.9, beta2=0.999),
        batch_size=images.shape[0],
        epochs=epochs,
        multi_res_training=False,
        final_resolution=res,
    )
    params, _ = tasks.fit_task(
        model, params, cfg, lambda r: images, jax.random.PRNGKey(1)
    )
    return model, params


def _smooth_envmaps(n, width, seed=0):
    d = np.asarray(sphere.get_directions(width))[0]
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        np.stack(
            [np.tanh(d @ rng.normal(size=(3, 3)) * 0.7) for _ in range(n)]
        ).astype(np.float32)
    )


def test_reconstruction_psnr_improves_with_fit():
    width = 32
    images = _smooth_envmaps(2, width)
    model, params = _fit_model(images, (16, 32))
    fitted = ev.reconstruction_psnr(model, params, images, (16, 32))
    fresh = ev.reconstruction_psnr(
        model,
        model.init(jax.random.PRNGKey(9), dataset_size=2),
        images,
        (16, 32),
    )
    assert fitted["psnr_mean"] > fresh["psnr_mean"] + 3
    assert fitted["psnr_per_image"].shape == (2,)


def test_equivariance_eval_self_consistency_high():
    """The SO2 decoder must be exactly equivariant: rotating latents equals
    rolling the decoded image, up to fp — self-consistency PSNR very high."""
    width = 32
    images = _smooth_envmaps(2, width, seed=3)
    model, params = _fit_model(images, (16, 32), epochs=60)
    out = ev.equivariance_eval(model, params, images, (16, 32), columns=4)
    assert out["self_consistency_psnr"] > 40, out
    # rotated reconstruction tracks (roughly) the base reconstruction quality
    base = ev.reconstruction_psnr(model, params, images, (16, 32))
    assert out["rotated_reconstruction_psnr"] > base["psnr_mean"] - 6


def test_inpainting_eval_regions():
    width = 32
    images = _smooth_envmaps(1, width, seed=5)
    model, params = _fit_model(images, (16, 32), epochs=120)
    mask = jnp.ones((1, 512, 3)).at[:, :100, :].set(0.0)
    out = ev.inpainting_eval(model, params, images, (16, 32), mask)
    assert np.isfinite(out["observed_psnr"]) and np.isfinite(out["hallucinated_psnr"])
    assert out["observed_psnr"] > 10
