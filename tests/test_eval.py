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


# ---------------------------------------------------------------------------
# SSIM (the paper's second metric)


def _ssim_oracle(x, y, data_range=1.0):
    """Independent numpy/scipy implementation of Wang et al. ssim.m:
    11x11 Gaussian sigma=1.5, population covariance, valid padding."""
    from scipy.signal import convolve2d

    ax = np.arange(11) - 5.0
    g1 = np.exp(-(ax**2) / (2 * 1.5**2))
    w = np.outer(g1, g1)
    w /= w.sum()
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2

    def f(a):
        # convolve2d with a symmetric kernel == correlation (filter2)
        return convolve2d(a, w, mode="valid")

    vals = []
    for c in range(x.shape[0]):
        xc, yc = x[c].astype(np.float64), y[c].astype(np.float64)
        mx, my = f(xc), f(yc)
        vx = f(xc * xc) - mx * mx
        vy = f(yc * yc) - my * my
        vxy = f(xc * yc) - mx * my
        s = ((2 * mx * my + c1) * (2 * vxy + c2)) / (
            (mx**2 + my**2 + c1) * (vx + vy + c2)
        )
        vals.append(s.mean())
    return float(np.mean(vals))


def test_ssim_matches_canonical_oracle():
    rng = np.random.default_rng(0)
    x = rng.random((2, 3, 20, 34)).astype(np.float32)
    y = np.clip(x + rng.normal(scale=0.1, size=x.shape), 0, 1).astype(np.float32)
    ours = ev.ssim_per_image(jnp.asarray(x), jnp.asarray(y))
    for i in range(2):
        ref = _ssim_oracle(x[i], y[i])
        assert abs(float(ours[i]) - ref) < 1e-5, (ours[i], ref)


def test_ssim_identity_and_ordering():
    rng = np.random.default_rng(1)
    x = rng.random((1, 3, 16, 32)).astype(np.float32)
    same = ev.ssim_per_image(x, x.copy())
    assert abs(float(same[0]) - 1.0) < 1e-6
    small = np.clip(x + rng.normal(scale=0.02, size=x.shape), 0, 1).astype(np.float32)
    big = np.clip(x + rng.normal(scale=0.3, size=x.shape), 0, 1).astype(np.float32)
    s_small = float(ev.ssim_per_image(x, small)[0])
    s_big = float(ev.ssim_per_image(x, big)[0])
    assert 1.0 > s_small > s_big
    # symmetric
    assert abs(s_small - float(ev.ssim_per_image(small, x)[0])) < 1e-6


def test_reconstruction_report_includes_ssim():
    width = 32
    images = _smooth_envmaps(2, width, seed=7)
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
    params = model.init(jax.random.PRNGKey(0), dataset_size=2)
    rep = ev.reconstruction_psnr(model, params, images, (16, 32))
    assert "ssim_mean" in rep and rep["ssim_per_image"].shape == (2,)
    assert -1.0 <= rep["ssim_mean"] <= 1.0
