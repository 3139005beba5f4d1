"""Equirectangular sphere sampling utilities.

Reproduces the geometric conventions of the reference implementation
(reference: src/utils/utils.py:46-91) as pure JAX functions:

- pixel-center equirectangular grids with the reference's y-up convention
  ``d = (sin(phi) sin(theta), cos(phi), -sin(phi) cos(theta))``,
- the sine-of-polar-angle sampling weight used to compensate the
  non-uniform solid angle of equirectangular pixels,
- HDR tonemapping (98th-percentile normalisation + sRGB OETF,
  reference: src/utils/utils.py:30-42).

All grids are deterministic functions of the resolution, so they are computed
host-side with numpy once per resolution stage and live on device as
constants; nothing here is in the gradient path.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _uv_grid(width: int) -> tuple[np.ndarray, np.ndarray]:
    """Pixel-center (u, v) coordinates for an equirectangular map of
    ``width`` columns and ``width // 2`` rows, flattened row-major.

    Matches the reference's grid: u = (1..W - 0.5) / (W//2),
    v = (1..H - 0.5) / (W//2) with H = W//2 (utils.py:50-55).
    """
    height = width // 2
    half = width // 2
    u = (np.arange(1, width + 1, dtype=np.float64) - 0.5) / half
    v = (np.arange(1, height + 1, dtype=np.float64) - 0.5) / half
    v_grid, u_grid = np.meshgrid(v, u, indexing="ij")
    uv = np.stack((u_grid, v_grid), -1).reshape(-1, 2)
    return uv[:, 0], uv[:, 1]


def get_directions(width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Unit direction for each pixel of an equirectangular panorama.

    Returns shape ``(1, (width//2) * width, 3)`` with the reference's y-up
    convention (utils.py:57-64): theta = pi*(u-1) in (-pi, pi),
    phi = pi*v in (0, pi), d = (sin phi sin theta, cos phi, -sin phi cos theta).
    """
    u, v = _uv_grid(width)
    theta = np.pi * (u - 1.0)
    phi = np.pi * v
    d = np.stack(
        (
            np.sin(phi) * np.sin(theta),
            np.cos(phi),
            -np.sin(phi) * np.cos(theta),
        ),
        -1,
    )
    return jnp.asarray(d[None], dtype=dtype)


def get_sineweight(width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Per-pixel sampling-density compensation ``sin(phi)``.

    Returns shape ``(1, (width//2) * width, 3)`` (weight repeated across RGB),
    matching the reference (utils.py:68-78).
    """
    _, v = _uv_grid(width)
    phi = np.pi * v
    s = np.sin(phi)
    s = np.repeat(s[:, None], 3, axis=1)
    return jnp.asarray(s[None], dtype=dtype)


def get_solid_angles(width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Exact solid angle of each equirectangular pixel, shape ``(H*W,)``.

    Integrates sin(phi) over each pixel: omega = dtheta * (cos(phi0)-cos(phi1)).
    Used by the spherical-harmonics baseline for exact projection weights.
    """
    height = width // 2
    dtheta = 2.0 * np.pi / width
    phi_edges = np.linspace(0.0, np.pi, height + 1)
    band = dtheta * (np.cos(phi_edges[:-1]) - np.cos(phi_edges[1:]))  # (H,)
    omega = np.repeat(band[:, None], width, axis=1).reshape(-1)
    return jnp.asarray(omega, dtype=dtype)


def get_mask(width: int, path: str, dtype=jnp.float32) -> jnp.ndarray:
    """Load a binary mask PNG and resize (nearest) to ``(width//2, width)``.

    Returns shape ``(1, (width//2)*width, 3)`` in [0, 1], matching the
    reference (utils.py:81-91).
    """
    from PIL import Image

    img = Image.open(path)
    height = width // 2
    img = img.resize((width, height), resample=Image.NEAREST)
    arr = np.asarray(img, dtype=np.float64)
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.max() > 1.0:
        arr = arr / 255.0
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    arr = arr[..., :3]
    return jnp.asarray(arr.reshape(1, height * width, 3), dtype=dtype)


def srgb(imgs: jnp.ndarray) -> jnp.ndarray:
    """HDR display tonemap: per-image 98th-percentile normalisation followed by
    the piecewise sRGB OETF (reference: utils.py:30-42).

    Accepts ``(B, C, H, W)`` or ``(C, H, W)``; the normaliser is the reference's
    nested quantile — quantile over axis 1 three times — reproduced exactly.
    """
    if imgs.ndim == 3:
        imgs = imgs[None]
    q = jnp.quantile(imgs, 0.98, axis=1)
    q = jnp.quantile(q, 0.98, axis=1)
    q = jnp.quantile(q, 0.98, axis=1)
    imgs = imgs / q[:, None, None, None]
    imgs = jnp.clip(imgs, 0.0, 1.0)
    return jnp.where(
        imgs <= 0.0031308,
        12.92 * imgs,
        1.055 * jnp.power(jnp.abs(imgs), 1.0 / 2.4) - 0.055,
    )


def flatten_image(imgs: jnp.ndarray) -> jnp.ndarray:
    """``(B, C, H, W) -> (B, H*W, C)`` — the layout the decoder consumes."""
    b, c, h, w = imgs.shape
    return jnp.transpose(imgs, (0, 2, 3, 1)).reshape(b, h * w, c)


def unflatten_image(flat: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """``(B, H*W, C) -> (B, C, H, W)``."""
    b, _, c = flat.shape
    return jnp.transpose(flat.reshape(b, height, width, c), (0, 3, 1, 2))


def rotation_y(angle_rad: float) -> np.ndarray:
    """Rotation matrix about the +y (up) axis, acting on row vectors d @ R."""
    c, s = np.cos(angle_rad), np.sin(angle_rad)
    return np.array([[c, 0.0, -s], [0.0, 1.0, 0.0], [s, 0.0, c]], dtype=np.float64)


def random_rotation(rng: np.random.Generator) -> np.ndarray:
    """Uniform random 3D rotation matrix (for SO(3) equivariance tests)."""
    q = rng.normal(size=4)
    q = q / np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
