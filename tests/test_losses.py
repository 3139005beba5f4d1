"""Loss reduction semantics vs hand values and the torch reference formulas
(SURVEY §4 oracle c)."""

import numpy as np
import jax.numpy as jnp

from reni_tpu.train import losses


def _rand(shape, seed):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def test_weighted_mse_hand_value():
    out = jnp.asarray([[[1.0, 2.0], [3.0, 4.0]]])  # (1, 2, 2)
    gt = jnp.zeros((1, 2, 2))
    w = jnp.ones((1, 2, 2)) * 2.0
    # mean over pixels*channels of 2*[1,4,9,16] = 2*30/4 = 15; sum over batch
    assert float(losses.weighted_mse(out, gt, w)) == 15.0


def test_weighted_mse_batch_sum_semantics():
    out, gt = jnp.ones((3, 4, 3)), jnp.zeros((3, 4, 3))
    w = jnp.ones((3, 4, 3))
    # per-sample mean is 1; summed over batch of 3
    assert float(losses.weighted_mse(out, gt, w)) == 3.0


def test_kld_hand_value():
    mu = jnp.zeros((2, 3))
    log_var = jnp.zeros((2, 3))
    # -(1/2) * sum(1 + 0 - 0 - 1) = 0 per sample
    assert float(losses.kld(mu, log_var)) == 0.0
    mu = jnp.ones((1, 2))
    log_var = jnp.zeros((1, 2))
    # per-dim: -(1/2)(1 + 0 - 1 - 1) = 0.5; sum = 1.0
    np.testing.assert_allclose(float(losses.kld(mu, log_var)), 1.0, atol=1e-6)


def test_kld_matches_torch_reference():
    import torch

    mu_np, lv_np = _rand((4, 5, 3), 0), _rand((4, 5, 3), 1)
    mu_t, lv_t = torch.from_numpy(mu_np), torch.from_numpy(lv_np)
    z_dims = 15
    expected = (
        (
            -0.5
            * ((1 + lv_t - mu_t.pow(2) - lv_t.exp()).view(mu_t.shape[0], -1)).sum(1)
            / z_dims
        )
        .sum(0)
        .item()
    )
    ours = float(losses.kld(jnp.asarray(mu_np), jnp.asarray(lv_np), z_dims))
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_weighted_cosine_matches_torch_reference():
    """The reference's cosine loss runs over dim=1 (the pixel axis) and
    weights by sineweight[:, 0]; reproduce torch's output exactly."""
    import torch
    import torch.nn.functional as F

    out_np, gt_np = _rand((2, 8, 3), 2), _rand((2, 8, 3), 3)
    sw_np = np.abs(_rand((2, 8, 3), 4))
    o_t, g_t, s_t = map(torch.from_numpy, (out_np, gt_np, sw_np))
    expected = (
        (1 - (F.cosine_similarity(o_t, g_t, dim=1, eps=1e-20) * s_t[:, 0]).mean(1))
        .sum(0)
        .item()
    )
    ours = float(
        losses.weighted_cosine_similarity(
            jnp.asarray(out_np), jnp.asarray(gt_np), jnp.asarray(sw_np)
        )
    )
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_cosine_similarity_matches_torch_reference():
    import torch
    import torch.nn.functional as F

    a_np, b_np = _rand((2, 4, 4, 3), 5), _rand((2, 4, 4, 3), 6)
    expected = (
        1 - F.cosine_similarity(torch.from_numpy(a_np), torch.from_numpy(b_np), dim=1, eps=1e-20).mean()
    ).item()
    ours = float(losses.cosine_similarity(jnp.asarray(a_np), jnp.asarray(b_np)))
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_composite_losses_combine():
    out, gt = jnp.ones((2, 4, 3)) * 0.5, jnp.zeros((2, 4, 3))
    sw = jnp.ones((2, 4, 3))
    mu, lv = jnp.zeros((2, 6)), jnp.zeros((2, 6))
    loss, mse, kl = losses.reni_vad_train_loss(
        out, gt, sw, mu, lv, beta=0.1, z_dims=6
    )
    np.testing.assert_allclose(float(loss), float(mse) + float(kl), rtol=1e-6)
    assert float(kl) == 0.0

    Z = jnp.ones((2, 3, 3))
    loss, mse, prior, cos = losses.reni_test_loss(
        out, gt, sw, Z, alpha=1e-2, beta=0.0
    )
    np.testing.assert_allclose(float(prior), 1e-2 * 18.0, rtol=1e-6)


def test_masked_test_loss_reduces_to_reference():
    """reni_test_loss_masked(bmask=1) == reni_test_loss bit-for-bit, and
    padded rows contribute exactly zero regardless of their contents."""
    out, gt = jnp.asarray(_rand((3, 8, 3), 7)), jnp.asarray(_rand((3, 8, 3), 8))
    sw = jnp.asarray(np.abs(_rand((3, 8, 3), 9)))
    Z = jnp.asarray(_rand((3, 4, 3), 10))
    ones = jnp.ones((3,))

    ref = losses.reni_test_loss(out, gt, sw, Z, alpha=1e-3, beta=1e-2)
    got = losses.reni_test_loss_masked(
        out, gt, sw, Z, ones, alpha=1e-3, beta=1e-2
    )
    for a, b in zip(ref, got):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)

    # pad a garbage row: masked loss must equal the 3-row loss exactly
    bmask = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    pad = lambda x, fill: jnp.concatenate([x, jnp.full((1,) + x.shape[1:], fill)])
    got_padded = losses.reni_test_loss_masked(
        pad(out, 123.0), pad(gt, -7.0),
        pad(sw, 99.0) * bmask[:, None, None],  # caller masks sineweight
        pad(Z, 5.0) * bmask[:, None, None],    # and the latent rows
        bmask, alpha=1e-3, beta=1e-2,
    )
    for a, b in zip(ref, got_padded):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_masked_inverse_loss_reduces_to_reference():
    r, gt = jnp.asarray(_rand((3, 4, 4, 3), 11)), jnp.asarray(_rand((3, 4, 4, 3), 12))
    Z = jnp.asarray(_rand((3, 4, 3), 13))
    ref = losses.reni_test_loss_inverse(r, gt, Z, alpha=1e-3, beta=1e-2)
    got = losses.reni_test_loss_inverse_masked(
        r, gt, Z, jnp.ones((3,)), alpha=1e-3, beta=1e-2
    )
    for a, b in zip(ref, got):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_psnr():
    a = jnp.zeros((4, 4))
    b = jnp.ones((4, 4)) * 0.1
    np.testing.assert_allclose(float(losses.psnr(a, b)), 20.0, rtol=1e-5)
