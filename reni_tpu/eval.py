"""Evaluation harness for the BASELINE.json protocol.

Implements the measured comparisons SURVEY §6 / BASELINE.md call for:

- `reconstruction_psnr`: test-set PSNR after FIT_LATENT — decode each
  latent, unnormalise both sides, tonemap HDR with the reference's sRGB,
  PSNR in display space (per image and mean).
- `equivariance_eval`: BASELINE config 3 — reconstruct a *rotated*
  environment map via latent rotation Z @ R_y and compare against the
  pixel-rolled ground truth (equirectangular maps are periodic in azimuth,
  so an exact-column rotation has an exact GT).
- `inpainting_eval`: masked region PSNR — quality of the hallucinated
  (unobserved) pixels after masked latent fitting.

All pure functions over (model, params, images); the trainer and tests
share them.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from reni_tpu.core import sphere
from reni_tpu.models.reni import RENIModel


def _display(flat, res, unnormalise, is_hdr):
    h, w = res
    imgs = sphere.unflatten_image(flat, h, w)
    if unnormalise is not None:
        imgs = unnormalise(imgs)
    if is_hdr:
        imgs = sphere.srgb(imgs)
    return jnp.clip(imgs, 0.0, 1.0)


def psnr_per_image(pred, target) -> np.ndarray:
    mse = jnp.mean((pred - target) ** 2, axis=tuple(range(1, pred.ndim)))
    return np.asarray(10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12)))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return g / g.sum()


def _filter2_valid(img: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable 2-D correlation with a 1-D window, 'valid' padding.

    img: (..., H, W). The Gaussian window is symmetric so correlation ==
    convolution (Wang's ssim.m uses filter2, i.e. correlation)."""
    k = win.shape[0]
    # rows: moving weighted sum along H
    def conv1d(a, axis):
        n = a.shape[axis]
        sl = [slice(None)] * a.ndim
        out = 0.0
        for i in range(k):  # k=11 static -> unrolled, fine under jit
            sl[axis] = slice(i, n - k + 1 + i)
            out = out + win[i] * a[tuple(sl)]
        return out

    return conv1d(conv1d(img, -2), -1)


def ssim_per_image(pred, target, *, data_range: float = 1.0) -> np.ndarray:
    """Structural similarity (Wang et al. 2004), the paper's second metric.

    Canonical formulation: 11x11 Gaussian window sigma=1.5, K1=0.01,
    K2=0.03, population (uniform-weight) covariance, 'valid' padding —
    identical to the reference MATLAB ssim.m and to
    skimage.metrics.structural_similarity(gaussian_weights=True,
    use_sample_covariance=False). Computed per channel and averaged.

    pred/target: (S, C, H, W) in display space [0, data_range].
    """
    pred = jnp.asarray(pred, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    if pred.shape[-2] < 11 or pred.shape[-1] < 11:
        raise ValueError(
            f"ssim needs images >= 11x11 (the Gaussian window); got "
            f"{pred.shape[-2]}x{pred.shape[-1]}"
        )
    win = _gaussian_window()
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    mu_x = _filter2_valid(pred, win)
    mu_y = _filter2_valid(target, win)
    xx = _filter2_valid(pred * pred, win) - mu_x * mu_x
    yy = _filter2_valid(target * target, win) - mu_y * mu_y
    xy = _filter2_valid(pred * target, win) - mu_x * mu_y

    s = ((2 * mu_x * mu_y + c1) * (2 * xy + c2)) / (
        (mu_x**2 + mu_y**2 + c1) * (xx + yy + c2)
    )
    return np.asarray(jnp.mean(s, axis=tuple(range(1, s.ndim))))


def reconstruction_psnr(
    model: RENIModel,
    params,
    images: jnp.ndarray,
    res: tuple[int, int],
    *,
    unnormalise=None,
    is_hdr: bool = False,
) -> dict:
    """PSNR of latent-table reconstructions against the dataset images.

    images: (S, H*W, 3) normalised (as trained on)."""
    directions = sphere.get_directions(res[1])
    out = model.apply_idx(params, jnp.arange(images.shape[0]), directions)
    pred = _display(out, res, unnormalise, is_hdr)
    target = _display(images, res, unnormalise, is_hdr)
    per = psnr_per_image(pred, target)
    report = {"psnr_per_image": per, "psnr_mean": float(per.mean())}
    if res[0] >= 11 and res[1] >= 11:
        ssim = ssim_per_image(pred, target)
        report["ssim_per_image"] = ssim
        report["ssim_mean"] = float(ssim.mean())
    return report


def equivariance_eval(
    model: RENIModel,
    params,
    images: jnp.ndarray,
    res: tuple[int, int],
    *,
    columns: int = 8,
    unnormalise=None,
    is_hdr: bool = False,
) -> dict:
    """Rotate latents by a y-rotation of ``columns`` pixel columns; the
    decoded maps must equal the column-rolled reconstructions (BASELINE
    config 3). Returns PSNR between rotated-decode and rolled-decode, plus
    PSNR of rotated-decode against rolled ground truth."""
    h, w = res
    directions = sphere.get_directions(w)
    idx = jnp.arange(images.shape[0])
    Z = model.latents(params, idx)

    angle = -2.0 * np.pi * columns / w  # d @ R(-a) shifts content left by a
    r = jnp.asarray(sphere.rotation_y(angle).astype(np.float32))

    out_rot = model.apply(params, Z @ r, directions)
    out_base = model.apply(params, Z, directions)

    def roll(flat):
        img = flat.reshape(flat.shape[0], h, w, 3)
        return jnp.roll(img, columns, axis=2).reshape(flat.shape[0], h * w, 3)

    pred = _display(out_rot, res, unnormalise, is_hdr)
    self_target = _display(roll(out_base), res, unnormalise, is_hdr)
    gt_target = _display(roll(images), res, unnormalise, is_hdr)

    return {
        "self_consistency_psnr": float(psnr_per_image(pred, self_target).mean()),
        "rotated_reconstruction_psnr": float(psnr_per_image(pred, gt_target).mean()),
    }


def inpainting_eval(
    model: RENIModel,
    params,
    images: jnp.ndarray,
    res: tuple[int, int],
    mask: jnp.ndarray,
    *,
    unnormalise=None,
    is_hdr: bool = False,
) -> dict:
    """PSNR inside (observed) and outside (hallucinated) the mask after
    masked latent fitting. mask: (1, H*W, 3) with 1 = observed."""
    directions = sphere.get_directions(res[1])
    out = model.apply_idx(params, jnp.arange(images.shape[0]), directions)
    pred = _display(out, res, unnormalise, is_hdr)
    target = _display(images, res, unnormalise, is_hdr)

    m = sphere.unflatten_image(mask, *res)  # (1, 3, H, W)
    m = jnp.broadcast_to(m, pred.shape)

    def masked_psnr(sel):
        err = ((pred - target) ** 2 * sel).sum() / jnp.maximum(sel.sum(), 1.0)
        return float(10.0 * jnp.log10(1.0 / jnp.maximum(err, 1e-12)))

    return {
        "observed_psnr": masked_psnr(m),
        "hallucinated_psnr": masked_psnr(1.0 - m),
    }


def inverse_recovery_eval(
    model: RENIModel,
    params,
    images: jnp.ndarray,
    res: tuple[int, int],
    setup,
    *,
    unnormalise=None,
    batch: int = 4,
) -> dict:
    """FIT_INVERSE recovery quality: how well the fitted latents explain the
    scene through the renderer, and how much of the true environment they
    pin down.

    - ``render_correlation``: Pearson correlation between the recovered and
      ground-truth renders, per map (the observable the task optimises —
      the PERF.md teapot/torus figure of merit).
    - ``envmap_rel_error``: mean relative radiance error of the recovered
      environment maps against the true maps (includes the renderer's null
      space, so it lower-bounds what any single-scene inverse can achieve).

    ``setup``: a render.inverse.InverseRenderSetup (multi-view renders are
    compared view-stacked, exactly as the loss sees them)."""
    if unnormalise is None:
        unnormalise = lambda x: x  # identity: images already in radiance
    S = images.shape[0]
    directions = sphere.get_directions(res[1])
    sw = sphere.get_sineweight(res[1])
    render = setup.render_fn(res[1])

    gt = np.asarray(setup.generate_gt_renders(images, unnormalise, res[1]))
    corrs, rels = [], []
    for i in range(0, S, batch):
        idx = jnp.arange(i, min(i + batch, S))
        out = model.apply_idx(params, idx, directions)
        env = unnormalise(out)
        pred = np.asarray(render(env, jnp.broadcast_to(sw, env.shape)))
        g = gt[i : i + batch]
        for j in range(pred.shape[0]):
            p, t = pred[j].ravel(), g[j].ravel()
            p = p - p.mean()
            t = t - t.mean()
            denom = np.sqrt((p * p).sum() * (t * t).sum())
            corrs.append(float((p * t).sum() / max(denom, 1e-12)))
        true_env = np.asarray(unnormalise(images[i : i + batch]))
        env = np.asarray(env)
        rels.append(np.abs(env - true_env) / (np.abs(true_env) + 1e-6))
    corrs = np.asarray(corrs)
    rel = float(np.concatenate([r.ravel() for r in rels]).mean())
    return {
        "render_correlation_per_image": corrs,
        "render_correlation_mean": float(corrs.mean()),
        "render_correlation_min": float(corrs.min()),
        "envmap_rel_error": rel,
    }
