"""Closed-form properties of the sphere sampling grids (SURVEY §4 oracle b)."""

import numpy as np
import jax.numpy as jnp

from reni_tpu.core import sphere


def test_directions_shape_and_unit_norm():
    for w in (8, 32, 128):
        d = sphere.get_directions(w)
        assert d.shape == (1, (w // 2) * w, 3)
        norms = jnp.linalg.norm(d, axis=-1)
        np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-5)


def test_directions_y_up_convention():
    # phi near 0 at the first row -> direction near +y (north pole up)
    d = np.asarray(sphere.get_directions(64))[0]
    first_row = d[:64]
    assert (first_row[:, 1] > 0.99).all()
    last_row = d[-64:]
    assert (last_row[:, 1] < -0.99).all()


def test_directions_reference_formula():
    # spot-check the exact reference formula at a few pixels
    w = 32
    h = w // 2
    d = np.asarray(sphere.get_directions(w))[0]
    for pix in (0, 17, 255, 511):
        row, col = divmod(pix, w)
        u = (col + 1 - 0.5) / (w // 2)
        v = (row + 1 - 0.5) / (w // 2)
        theta = np.pi * (u - 1)
        phi = np.pi * v
        expect = np.array(
            [np.sin(phi) * np.sin(theta), np.cos(phi), -np.sin(phi) * np.cos(theta)]
        )
        np.testing.assert_allclose(d[pix], expect, atol=1e-6)


def test_sineweight_matches_sin_phi_and_sums_to_sphere_area():
    w = 128
    s = np.asarray(sphere.get_sineweight(w))[0]
    assert s.shape == ((w // 2) * w, 3)
    assert (s[:, 0] == s[:, 1]).all() and (s[:, 0] == s[:, 2]).all()
    # sum(sin phi) * pixel area ~ 4 pi
    h = w // 2
    pixel_area = (2 * np.pi / w) * (np.pi / h)
    total = s[:, 0].sum() * pixel_area
    np.testing.assert_allclose(total, 4 * np.pi, rtol=1e-3)


def test_solid_angles_sum_to_sphere():
    for w in (16, 64):
        omega = np.asarray(sphere.get_solid_angles(w))
        np.testing.assert_allclose(omega.sum(), 4 * np.pi, rtol=1e-6)


def test_flatten_unflatten_roundtrip():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(2, 3, 8, 16)).astype(np.float32))
    flat = sphere.flatten_image(imgs)
    assert flat.shape == (2, 128, 3)
    back = sphere.unflatten_image(flat, 8, 16)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(imgs))


def test_srgb_matches_torch_reference_semantics():
    """Validate the nested-quantile normalisation + OETF against a direct
    torch transcription of the reference formula (utils.py:30-42)."""
    import torch

    rng = np.random.default_rng(1)
    imgs = rng.gamma(1.5, 1.0, size=(2, 3, 8, 16)).astype(np.float32)

    t = torch.from_numpy(imgs)
    q = torch.quantile(
        torch.quantile(torch.quantile(t, 0.98, dim=(1)), 0.98, dim=(1)), 0.98, dim=(1)
    )
    t = t / q.unsqueeze(1).unsqueeze(2).unsqueeze(3)
    t = torch.clamp(t, 0.0, 1.0)
    expected = torch.where(
        t <= 0.0031308,
        12.92 * t,
        1.055 * torch.pow(torch.abs(t), 1 / 2.4) - 0.055,
    ).numpy()

    ours = np.asarray(sphere.srgb(jnp.asarray(imgs)))
    np.testing.assert_allclose(ours, expected, atol=2e-5)


def test_rotation_y_rotates_directions_within_grid():
    """A y-rotation by one column's angular step maps the direction grid onto
    itself shifted by one column (equirectangular periodicity)."""
    w = 32
    d = np.asarray(sphere.get_directions(w))[0].reshape(w // 2, w, 3)
    step = 2 * np.pi / w
    r = sphere.rotation_y(step)
    rotated = d @ r
    # d(theta) @ rotation_y(step) = d(theta - step): one column to the right
    shifted = np.roll(d, shift=1, axis=1)
    np.testing.assert_allclose(rotated, shifted, atol=1e-5)
