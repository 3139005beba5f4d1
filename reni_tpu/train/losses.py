"""Loss functions with the reference's exact reduction semantics
(reference: src/utils/loss_functions.py).

Conventions preserved exactly (they change gradient scale, so they are
load-bearing for matching training dynamics):

- `weighted_mse`: mean over pixels*channels per sample, **sum over batch**
  (loss_functions.py:6-13).
- `kld`: per-sample sum over latent dims, divided by Z_dims (= 3N in the
  trainer), summed over batch (loss_functions.py:16-22).
- `weighted_cosine_similarity`: the reference computes torch
  `cosine_similarity(..., dim=1)` — i.e. cosine over the **pixel** axis of a
  (B, npix, 3) tensor, yielding one value per colour channel — and scales by
  ``sineweight[:, 0]`` (the first pixel's weight). We reproduce this
  behaviour bit-for-bit (loss_functions.py:25-32); it is how the published
  models were trained.
- `cosine_similarity`: plain 1 - mean cosine over dim 1
  (loss_functions.py:35-36), applied to (B, H, W, 3) renders in the inverse
  task.

All functions are pure and jit-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_EPS = 1e-20


def weighted_mse(model_output, ground_truth, sineweight) -> jnp.ndarray:
    se = ((model_output - ground_truth) ** 2) * sineweight
    return se.reshape(se.shape[0], -1).mean(axis=1).sum()


def kld(mu, log_var, z_dims: int = 1) -> jnp.ndarray:
    k = -0.5 * (1 + log_var - mu**2 - jnp.exp(log_var)).reshape(mu.shape[0], -1).sum(
        axis=1
    )
    return (k / z_dims).sum()


def _cosine_axis1(a, b) -> jnp.ndarray:
    """torch.nn.functional.cosine_similarity(a, b, dim=1, eps=1e-20)."""
    dot = (a * b).sum(axis=1)
    na = jnp.sqrt((a * a).sum(axis=1))
    nb = jnp.sqrt((b * b).sum(axis=1))
    return dot / (jnp.maximum(na, _EPS) * jnp.maximum(nb, _EPS))


def weighted_cosine_similarity(model_output, ground_truth, sineweight) -> jnp.ndarray:
    cos = _cosine_axis1(model_output, ground_truth)  # (B, 3)
    return (1.0 - (cos * sineweight[:, 0]).mean(axis=1)).sum()


def cosine_similarity(model_output, ground_truth) -> jnp.ndarray:
    return 1.0 - _cosine_axis1(model_output, ground_truth).mean()


# -- composite criteria (loss_functions.py:39-85) ---------------------------


def reni_train_loss(inputs, targets, sineweight):
    """AutoDecoder FIT_DECODER loss: weighted MSE only."""
    return weighted_mse(inputs, targets, sineweight)


def reni_vad_train_loss(inputs, targets, sineweight, mu, log_var, *, beta, z_dims):
    """VAD FIT_DECODER loss. Returns (loss, mse, kld)."""
    mse_loss = weighted_mse(inputs, targets, sineweight)
    kld_loss = beta * kld(mu, log_var, z_dims)
    return mse_loss + kld_loss, mse_loss, kld_loss


def reni_test_loss(inputs, targets, sineweight, Z, *, alpha, beta):
    """FIT_LATENT loss. Returns (loss, mse, prior, cosine)."""
    mse_loss = weighted_mse(inputs, targets, sineweight)
    prior_loss = alpha * jnp.sum(Z**2)
    cosine_loss = beta * weighted_cosine_similarity(inputs, targets, sineweight)
    return mse_loss + prior_loss + cosine_loss, mse_loss, prior_loss, cosine_loss


def reni_test_loss_inverse(inputs, targets, Z, *, alpha, beta):
    """FIT_INVERSE loss on (B, H, W, 3) renders. Returns (loss, mse, prior, cos)."""
    mse_loss = jnp.mean((inputs - targets) ** 2)
    prior_loss = alpha * jnp.sum(Z**2)
    cosine_loss = beta * cosine_similarity(inputs, targets)
    return mse_loss + prior_loss + cosine_loss, mse_loss, prior_loss, cosine_loss


# -- batch-masked variants (single source of truth for the ragged-tail
#    zero-masking the scanned trainer uses; with an all-ones bmask these are
#    exactly the reference criteria above, which tests pin) ------------------


def reni_test_loss_masked(inputs, targets, sineweight, Z, bmask, *, alpha, beta):
    """FIT_LATENT loss over a zero-padded batch. ``sineweight`` must already
    include the batch mask (and any in-painting mask); ``Z`` rows of padded
    samples must be zeroed by the caller. The cosine term excludes padded
    rows entirely (they would otherwise each add a constant 1, reference
    loss_functions.py:25-32 applied to a ragged tail)."""
    mse_loss = weighted_mse(inputs, targets, sineweight)
    prior_loss = alpha * jnp.sum(Z**2)
    cos_per = 1.0 - (_cosine_axis1(inputs, targets) * sineweight[:, 0]).mean(axis=1)
    cosine_loss = beta * (cos_per * bmask).sum()
    return mse_loss + prior_loss + cosine_loss, mse_loss, prior_loss, cosine_loss


def reni_test_loss_inverse_masked(inputs, targets, Z, bmask, *, alpha, beta):
    """FIT_INVERSE loss over a zero-padded batch of (B, H, W, 3) renders;
    reduces to `reni_test_loss_inverse` when bmask is all ones."""
    bm = bmask[:, None, None, None]
    n_valid = jnp.maximum(jnp.sum(bmask), 1.0)
    per_sample = np.prod(inputs.shape[1:])
    mse_loss = jnp.sum(bm * (inputs - targets) ** 2) / (n_valid * per_sample)
    prior_loss = alpha * jnp.sum(Z**2)
    cos_flat = _cosine_axis1(inputs * bm, targets * bm)
    cos_per = 1.0 - cos_flat.reshape(cos_flat.shape[0], -1).mean(axis=1)
    cosine_loss = beta * (cos_per * bmask).sum() / n_valid
    return mse_loss + prior_loss + cosine_loss, mse_loss, prior_loss, cosine_loss


def psnr(prediction, target, max_value: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB (evaluation metric)."""
    mse = jnp.mean((prediction - target) ** 2)
    return 10.0 * jnp.log10(max_value**2 / mse)
