"""Example-image generation — the reference's LogExampleImagesCallback
(reference: src/lightning/callbacks.py:33-140) as a pure function.

Modes (TRAINER.LOGGER.IMAGES_TO_SHOW):
- "noise": decode random latent codes z ~ N(0, 1) — prior samples;
- "random": reconstruct random dataset rows, stacked above ground truth;
- a list of indices: reconstruct those rows.

HDR outputs are unnormalised and tonemapped with the reference's sRGB
(98th-percentile normalisation); grids use the torchvision layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from reni_tpu.core import sphere
from reni_tpu.models.reni import RENIModel
from reni_tpu.train.logging_utils import make_grid


def _postprocess(flat, res, unnormalise, is_hdr):
    """(B, H*W, 3) model output -> (B, H, W, 3) display image in [0, 1]."""
    h, w = res
    imgs = sphere.unflatten_image(flat, h, w)  # (B, C, H, W)
    if unnormalise is not None:
        imgs = unnormalise(imgs)
    if is_hdr:
        imgs = sphere.srgb(imgs)
    imgs = jnp.clip(imgs, 0.0, 1.0)
    return np.asarray(jnp.transpose(imgs, (0, 2, 3, 1)))


def example_images(
    model: RENIModel,
    params,
    res: tuple[int, int],
    *,
    mode="noise",
    n_images: int = 10,
    key=None,
    dataset_images=None,
    unnormalise=None,
    is_hdr: bool = False,
    mask=None,
    render_fn=None,
    gt_renders=None,
) -> np.ndarray:
    """-> (H', W', 3) grid in [0, 1]."""
    width = res[1]
    directions = sphere.get_directions(width)
    key = key if key is not None else jax.random.PRNGKey(0)

    if mode == "noise":
        z = jax.random.normal(key, (n_images, model.config.latent_dim, 3))
        out = model.apply(params, z, directions)
        if render_fn is not None:
            sw = sphere.get_sineweight(width)
            out_u = unnormalise(out) if unnormalise is not None else out
            renders = render_fn(out_u, jnp.broadcast_to(sw, out_u.shape))
            return make_grid(np.clip(np.asarray(sphere.srgb(
                jnp.transpose(renders, (0, 3, 1, 2)))), 0, 1).transpose(0, 2, 3, 1))
        return make_grid(_postprocess(out, res, unnormalise, is_hdr))

    total = dataset_images.shape[0]
    if mode == "random":
        idx = np.asarray(
            jax.random.permutation(key, total)[: min(n_images, total)]
        )
    else:
        idx = np.asarray(mode)[:n_images]

    out = model.apply_idx(params, jnp.asarray(idx), directions)

    if render_fn is not None and gt_renders is not None:
        # FIT_INVERSE: compare renders (callbacks.py:102-109)
        sw = sphere.get_sineweight(width)
        out_u = unnormalise(out) if unnormalise is not None else out
        renders = render_fn(out_u, jnp.broadcast_to(sw, out_u.shape))
        gt = gt_renders[idx]
        both = jnp.concatenate((gt, renders), axis=0)  # (2B, H, W, 3)
        both = sphere.srgb(jnp.transpose(both, (0, 3, 1, 2)))
        return make_grid(
            np.clip(np.asarray(jnp.transpose(both, (0, 2, 3, 1))), 0, 1),
            nrow=len(idx),
        )

    gt = dataset_images[idx]
    if mask is not None:
        gt = gt * mask
    gt_imgs = _postprocess(jnp.asarray(gt), res, unnormalise, is_hdr)
    out_imgs = _postprocess(out, res, unnormalise, is_hdr)
    return make_grid(np.concatenate((gt_imgs, out_imgs), axis=0), nrow=len(idx))
