"""Invariance properties and width checks for the input encodings
(SURVEY §4 oracle a)."""

import numpy as np
import jax.numpy as jnp
import pytest

from reni_tpu.core import encodings, sphere


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape).astype(np.float32))


@pytest.mark.parametrize("equiv", ["SO3", "SO2", "None"])
def test_concat_widths(equiv):
    B, N, P = 2, 7, 13
    Z, D = _rand((B, N, 3), 1), _rand((B, P, 3), 2)
    x = encodings.invariant_representation(equiv, Z, D)
    assert x.shape == (B, P, encodings.concat_in_features(equiv, N))


def test_so3_invariance_under_random_rotation():
    B, N, P = 2, 5, 11
    Z, D = _rand((B, N, 3), 3), _rand((B, P, 3), 4)
    rng = np.random.default_rng(5)
    R = jnp.asarray(sphere.random_rotation(rng).astype(np.float32))
    x = encodings.so3_invariant(Z, D)
    x_rot = encodings.so3_invariant(Z @ R, D @ R)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_rot), atol=1e-5)


def test_so2_invariance_under_y_rotation():
    B, N, P = 2, 5, 11
    Z, D = _rand((B, N, 3), 6), _rand((B, P, 3), 7)
    R = jnp.asarray(sphere.rotation_y(0.7).astype(np.float32))
    x = encodings.so2_invariant(Z, D)
    x_rot = encodings.so2_invariant(Z @ R, D @ R)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_rot), atol=1e-5)


def test_so2_not_invariant_under_general_rotation():
    B, N, P = 1, 5, 11
    Z, D = _rand((B, N, 3), 8), _rand((B, P, 3), 9)
    rng = np.random.default_rng(10)
    R = jnp.asarray(sphere.random_rotation(rng).astype(np.float32))
    x = encodings.so2_invariant(Z, D)
    x_rot = encodings.so2_invariant(Z @ R, D @ R)
    assert not np.allclose(np.asarray(x), np.asarray(x_rot), atol=1e-3)


def test_no_invariance_changes_under_rotation():
    B, N, P = 1, 5, 11
    Z, D = _rand((B, N, 3), 11), _rand((B, P, 3), 12)
    R = jnp.asarray(sphere.rotation_y(1.1).astype(np.float32))
    x = encodings.no_invariance(Z, D)
    x_rot = encodings.no_invariance(Z @ R, D @ R)
    assert not np.allclose(np.asarray(x), np.asarray(x_rot), atol=1e-3)


def test_so2_concat_matches_torch_reference_formula():
    """Cross-check the SO2 concat encoding against an independent torch
    transcription of the reference math (RENI.py:31-53)."""
    import torch

    B, N, P = 2, 4, 9
    Z_np = np.random.default_rng(13).normal(size=(B, N, 3)).astype(np.float32)
    D_np = np.random.default_rng(14).normal(size=(B, P, 3)).astype(np.float32)

    Z, D = torch.from_numpy(Z_np), torch.from_numpy(D_np)
    Z_xz = torch.stack((Z[:, :, 0], Z[:, :, 2]), -1)
    D_xz = torch.stack((D[:, :, 0], D[:, :, 2]), -1)
    G = torch.bmm(Z_xz, torch.transpose(Z_xz, 1, 2))
    Z_xz_invar = G.flatten(start_dim=1).unsqueeze(1).repeat(1, D.shape[1], 1)
    innerprod = torch.bmm(D_xz, torch.transpose(Z_xz, 1, 2))
    D_xz_norm = torch.sqrt(D[:, :, 0] ** 2 + D[:, :, 2] ** 2).unsqueeze(2)
    Z_y = Z[:, :, 1].unsqueeze(1).repeat(1, innerprod.shape[1], 1)
    D_y = D[:, :, 1].unsqueeze(2)
    expected = torch.cat((innerprod, Z_xz_invar, D_xz_norm, Z_y, D_y), 2).numpy()

    ours = np.asarray(encodings.so2_invariant(jnp.asarray(Z_np), jnp.asarray(D_np)))
    np.testing.assert_allclose(ours, expected, atol=1e-5)


@pytest.mark.parametrize("equiv", ["SO3", "SO2", "None"])
def test_film_inputs_match_concat_pieces(equiv):
    B, N, P = 2, 4, 9
    Z, D = _rand((B, N, 3), 15), _rand((B, P, 3), 16)
    siren_in, mapping_in = encodings.film_inputs(equiv, Z, D)
    s_w, m_w = encodings.film_in_features(equiv, N)
    assert siren_in.shape == (B, P, s_w)
    assert mapping_in.shape == (B, m_w)


@pytest.mark.parametrize("equiv", ["SO3", "SO2", "None"])
def test_d_features_and_z_parts_shapes(equiv):
    B, N, P = 3, 6, 10
    Z, D = _rand((B, N, 3), 17), _rand((B, P, 3), 18)
    df = encodings.d_features(equiv, D)
    assert df.shape == (B, P, encodings.d_feature_width(equiv))
    parts = encodings.z_parts(equiv, Z)
    assert parts["proj"].shape[0] == B and parts["proj"].shape[2] == N
    assert parts["bias_feats"].shape[0] == B
