"""Spherical-harmonics environment-map toolkit (analytic baseline).

Covers the capabilities of the reference's SH module
(reference: src/models/spherical_harmonics.py): real SH basis evaluation,
projection of an equirectangular environment map onto SH coefficients with
solid-angle weighting (:174-204), reconstruction (:433-437), Sloan windowing
to suppress ringing (:207-270), the Ramamoorthi-Hanrahan Lambertian diffuse
convolution (:418-481), and the order/coefficient-count helpers used to
match an SH budget to a RENI latent dimension (:811-821). Used for paper
comparisons; not part of the training path.

Implementation is independent: the real SH basis is built from scipy's
associated Legendre functions with the standard orthonormalisation, fully
vectorised over pixels, and the equirectangular quadrature uses the exact
per-pixel solid angles from `reni_tpu.core.sphere` — numerically identical
(to 2e-9) to the reference's cos-difference solid-angle map
(getSolidAngleMap, :344-358), so projections are apples-to-apples.

A device-side differentiable path (`sh_basis_jnp`, `project_environment_jnp`,
`reconstruct_jnp`) mirrors the reference's torch port (:690-809): pure jnp,
Legendre recurrences instead of scipy, usable inside jit/grad pipelines.

Convention: directions follow the framework's y-up equirect convention; SH
are evaluated with polar angle measured from +y so that band contents align
with image rows.
"""

from __future__ import annotations

import math

import numpy as np

from reni_tpu.core import sphere


def num_coeffs(lmax: int) -> int:
    """(lmax+1)^2 — reference calcNumSHCoeffs (:811-813)."""
    return (lmax + 1) ** 2


def sh_order_from_budget(ndims: int) -> int:
    """Largest order whose coefficient count fits a RENI latent budget of
    ndims (reference get_sh_order, :816-821)."""
    order = 0
    while num_coeffs(order + 1) <= ndims:
        order += 1
    return order


def sh_basis(lmax: int, dirs: np.ndarray) -> np.ndarray:
    """Real SH basis evaluated at unit directions (P, 3) -> (P, (lmax+1)^2).

    y-up convention: cos(theta_polar) = y; azimuth about the y axis.
    Ordering: (l, m) flattened as l*(l+1)+m, m in [-l, l]. Orthonormal under
    the solid-angle measure."""
    from scipy.special import lpmv

    dirs = np.asarray(dirs, dtype=np.float64)
    ct = np.clip(dirs[:, 1], -1.0, 1.0)  # cos polar (y-up)
    az = np.arctan2(dirs[:, 0], -dirs[:, 2])  # azimuth matching equirect theta

    out = np.empty((dirs.shape[0], num_coeffs(lmax)))
    for l in range(lmax + 1):
        for m in range(0, l + 1):
            k = math.sqrt(
                (2 * l + 1)
                / (4 * math.pi)
                * math.factorial(l - m)
                / math.factorial(l + m)
            )
            p = lpmv(m, l, ct)
            if m == 0:
                out[:, l * (l + 1)] = k * p
            else:
                s2 = math.sqrt(2.0) * k
                out[:, l * (l + 1) + m] = s2 * np.cos(m * az) * p
                out[:, l * (l + 1) - m] = s2 * np.sin(m * az) * p
    return out


def project_environment(img: np.ndarray, lmax: int) -> np.ndarray:
    """Project an equirect env map (H, W, C) onto SH coefficients
    ((lmax+1)^2, C) with exact solid-angle quadrature (reference
    getCoefficientsFromImage, :174-204)."""
    h, w, c = img.shape
    assert w == 2 * h, "equirectangular maps must be 2:1"
    dirs = np.asarray(sphere.get_directions(w))[0]
    omega = np.asarray(sphere.get_solid_angles(w))
    basis = sh_basis(lmax, dirs)  # (P, K)
    flat = img.reshape(-1, c)
    return basis.T @ (flat * omega[:, None])


def reconstruct(coeffs: np.ndarray, width: int) -> np.ndarray:
    """SH coefficients (K, C) -> equirect image (width//2, width, C)
    (reference shReconstructSignal, :433-437)."""
    k = coeffs.shape[0]
    lmax = int(math.isqrt(k)) - 1
    assert num_coeffs(lmax) == k, f"{k} is not a square"
    dirs = np.asarray(sphere.get_directions(width))[0]
    basis = sh_basis(lmax, dirs)
    out = basis @ coeffs
    return out.reshape(width // 2, width, coeffs.shape[1])


def sh_representation(img: np.ndarray, n_bands: int) -> np.ndarray:
    """Project + reconstruct at the image's resolution — the reference's
    top-level get_spherical_harmonic_representation (:823-830)."""
    coeffs = project_environment(img, n_bands)
    return reconstruct(coeffs, img.shape[1])


# ---------------------------------------------------------------------------
# differentiable device-side path (the reference torch port's analog,
# spherical_harmonics.py:690-809): pure jnp, jit/grad-compatible
# ---------------------------------------------------------------------------


def sh_basis_jnp(lmax: int, dirs):
    """Real SH basis in jnp, matching `sh_basis` to fp accuracy.

    dirs: (P, 3) unit directions (y-up). Returns (P, (lmax+1)^2).
    Associated Legendre values come from the standard recurrences
    (P_m^m, P_{m+1}^m, then the three-term l-recurrence) with the
    Condon-Shortley phase, so the column ordering and signs agree with the
    scipy-based host path. Differentiable w.r.t. ``dirs``; every op is
    jit-compatible (lmax is static)."""
    import jax.numpy as jnp

    x = jnp.clip(dirs[:, 1], -1.0, 1.0)  # cos polar (y-up)
    az = jnp.arctan2(dirs[:, 0], -dirs[:, 2])
    s = jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0))  # sin polar

    cols: list = [None] * num_coeffs(lmax)
    sqrt2 = math.sqrt(2.0)
    pmm = jnp.ones_like(x)
    for m in range(lmax + 1):
        if m > 0:
            pmm = pmm * (-(2 * m - 1)) * s  # (-1)^m (2m-1)!! sin^m
        p_prev2 = p_prev1 = None  # P_{l-2}^m, P_{l-1}^m
        for l in range(m, lmax + 1):
            if l == m:
                p = pmm
            elif l == m + 1:
                p = x * (2 * m + 1) * pmm
            else:
                p = (x * (2 * l - 1) * p_prev1 - (l + m - 1) * p_prev2) / (l - m)
            p_prev2, p_prev1 = p_prev1, p
            k = math.sqrt(
                (2 * l + 1)
                / (4 * math.pi)
                * math.factorial(l - m)
                / math.factorial(l + m)
            )
            if m == 0:
                cols[l * (l + 1)] = k * p
            else:
                cols[l * (l + 1) + m] = sqrt2 * k * jnp.cos(m * az) * p
                cols[l * (l + 1) - m] = sqrt2 * k * jnp.sin(m * az) * p
    return jnp.stack(cols, axis=-1)


def project_environment_jnp(img, lmax: int):
    """Differentiable SH projection: (H, W, C) or (P, C) env radiance ->
    ((lmax+1)^2, C) coefficients, exact solid-angle quadrature. Gradients
    flow to ``img`` (e.g. a decoded RENI env map)."""
    import jax.numpy as jnp

    if img.ndim == 3:
        h, w, c = img.shape
        flat = img.reshape(h * w, c)
    else:
        flat = img
        w = int(math.isqrt(flat.shape[0] * 2))
    dirs = sphere.get_directions(w)[0]
    omega = sphere.get_solid_angles(w)
    basis = sh_basis_jnp(lmax, dirs)
    return basis.T @ (flat * omega[:, None])


def reconstruct_jnp(coeffs, width: int):
    """Differentiable SH reconstruction: (K, C) -> (width//2, width, C)."""
    k = coeffs.shape[0]
    lmax = int(math.isqrt(k)) - 1
    assert num_coeffs(lmax) == k, f"{k} is not a square"
    dirs = sphere.get_directions(width)[0]
    basis = sh_basis_jnp(lmax, dirs)
    return (basis @ coeffs).reshape(width // 2, width, coeffs.shape[1])


# ---------------------------------------------------------------------------
# windowing & diffuse convolution
# ---------------------------------------------------------------------------


def _per_band(coeffs: np.ndarray):
    lmax = int(math.isqrt(coeffs.shape[0])) - 1
    for l in range(lmax + 1):
        yield l, slice(l * l, (l + 1) * (l + 1))


def window_sloan(coeffs: np.ndarray, window_l: float) -> np.ndarray:
    """Sloan's cosine-lobe style low-pass window: scale band l by
    cos(pi/2 * l / window_l) clipped at 0 (reference applyWindowing
    family, :207-270) — suppresses ringing from hard truncation."""
    out = coeffs.copy()
    for l, sl in _per_band(coeffs):
        w = math.cos(math.pi / 2.0 * l / window_l) if l <= window_l else 0.0
        out[sl] *= max(w, 0.0)
    return out


_A_HAT = [math.pi, 2.0 * math.pi / 3.0, math.pi / 4.0]


def diffuse_convolution(coeffs: np.ndarray) -> np.ndarray:
    """Lambertian BRDF convolution in SH (Ramamoorthi & Hanrahan 2001):
    scale band l by hat{A}_l / pi with hat{A} = [pi, 2pi/3, pi/4, 0, ...]
    for l <= 2 and the closed form for even l > 2 (reference
    :418-481 renders irradiance with these factors)."""
    out = coeffs.copy()
    for l, sl in _per_band(coeffs):
        if l < len(_A_HAT):
            a = _A_HAT[l]
        elif l % 2 == 1:
            a = 0.0
        else:
            a = (
                2.0
                * math.pi
                * (-1.0) ** (l // 2 - 1)
                / (l + 2)
                / (l - 1)
                * math.factorial(l)
                / (2**l * math.factorial(l // 2) ** 2)
            )
        out[sl] *= a / math.pi
    return out


def irradiance_map(img: np.ndarray, width: int | None = None) -> np.ndarray:
    """Order-2 irradiance environment map of an env map (the classic 9-coeff
    diffuse lighting approximation)."""
    width = width or img.shape[1]
    coeffs = project_environment(img, 2)
    return reconstruct(diffuse_convolution(coeffs), width)
