"""Analytic baselines as their own oracles (SURVEY §4 oracle e):
SH orthonormality / exact band-limited round trip, SG fit convergence."""

import numpy as np
import pytest

from reni_tpu.baselines import spherical_gaussians as sg
from reni_tpu.baselines import spherical_harmonics as sh
from reni_tpu.core import sphere


def test_num_coeffs_and_order_budget():
    assert sh.num_coeffs(0) == 1
    assert sh.num_coeffs(2) == 9
    # matching a RENI latent budget (reference :811-821 semantics)
    assert sh.sh_order_from_budget(9) == 2
    assert sh.sh_order_from_budget(8) == 1
    assert sh.sh_order_from_budget(49) == 6


def test_sh_orthonormality():
    """int Y_i Y_j dOmega = delta_ij under exact solid-angle quadrature."""
    width = 128
    dirs = np.asarray(sphere.get_directions(width))[0]
    omega = np.asarray(sphere.get_solid_angles(width))
    basis = sh.sh_basis(3, dirs)  # (P, 16)
    gram = basis.T @ (basis * omega[:, None])
    np.testing.assert_allclose(gram, np.eye(16), atol=2e-3)


def test_sh_bandlimited_roundtrip_exact():
    """A signal synthesised from SH coefficients projects back to exactly
    those coefficients, and reconstructs exactly."""
    rng = np.random.default_rng(0)
    lmax = 3
    coeffs = rng.normal(size=(sh.num_coeffs(lmax), 3))
    width = 128
    img = sh.reconstruct(coeffs, width)
    back = sh.project_environment(img, lmax)
    np.testing.assert_allclose(back, coeffs, atol=5e-3)
    img2 = sh.sh_representation(img, lmax)
    np.testing.assert_allclose(img2, img, atol=5e-3)


def test_sh_basis_jnp_matches_host():
    """The differentiable jnp basis (torch-port analog) equals the scipy
    host basis across orders, including Condon-Shortley signs."""
    rng = np.random.default_rng(0)
    d = rng.normal(size=(64, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    for lmax in (0, 1, 3, 6):
        host = sh.sh_basis(lmax, d)
        dev = np.asarray(sh.sh_basis_jnp(lmax, np.asarray(d, np.float32)))
        np.testing.assert_allclose(dev, host, atol=2e-4)


def test_sh_jnp_projection_differentiable():
    """Gradients flow through project/reconstruct (device path): the SH-space
    MSE of a band-limited signal has zero gradient exactly at the signal."""
    import jax
    import jax.numpy as jnp

    width = 32
    rng = np.random.default_rng(1)
    coeffs_true = jnp.asarray(rng.normal(size=(9, 3)).astype(np.float32))
    img_true = sh.reconstruct_jnp(coeffs_true, width)

    def loss(img):
        c = sh.project_environment_jnp(img, 2)
        return jnp.sum((c - coeffs_true) ** 2)

    l0 = float(loss(img_true))
    g = jax.grad(loss)(img_true)
    # near-zero up to the 16x32 quadrature discretisation error (~1e-4)
    assert l0 < 1e-3
    assert float(jnp.abs(g).max()) < 1e-2  # ~at the optimum
    # and is genuinely nonzero away from it
    g2 = jax.grad(loss)(img_true + 0.5)
    assert float(jnp.abs(g2).max()) > 1e-4
    # round trip matches the host path
    host = sh.project_environment(np.asarray(img_true, np.float64), 2)
    dev = np.asarray(sh.project_environment_jnp(img_true, 2))
    np.testing.assert_allclose(dev, host, atol=1e-4)


def test_sh_projection_dc_term():
    """A constant map has only the l=0 coefficient: c00 = sqrt(4pi)*v."""
    width = 64
    img = np.ones((width // 2, width, 3), dtype=np.float64) * 2.5
    coeffs = sh.project_environment(img, 2)
    np.testing.assert_allclose(coeffs[0], 2.5 * np.sqrt(4 * np.pi), rtol=1e-4)
    # pixel-center quadrature leaves ~1e-2 residue in the (2, 0) band
    np.testing.assert_allclose(coeffs[1:], 0.0, atol=1e-2)


def test_diffuse_convolution_preserves_constant():
    """Lambertian convolution of uniform radiance L gives irradiance-style
    output equal to L (with the 1/pi albedo normalisation)."""
    width = 64
    img = np.ones((width // 2, width, 3)) * 3.0
    irr = sh.irradiance_map(img)
    np.testing.assert_allclose(irr, 3.0, rtol=1e-3)


def test_windowing_shrinks_high_bands_only():
    rng = np.random.default_rng(1)
    coeffs = rng.normal(size=(16, 3))
    w = sh.window_sloan(coeffs, window_l=3)
    np.testing.assert_array_equal(w[:1], coeffs[:1])  # l=0 untouched
    assert np.abs(w[9:]).sum() < np.abs(coeffs[9:]).sum()


def test_sg_render_single_lobe_peak():
    params = sg.SGParams(
        raw_axis=np.arctanh(np.array([[0.0, 0.99, 0.0]], dtype=np.float32)),
        log_sharpness=np.array([np.log(50.0)], dtype=np.float32),
        log_amplitude=np.zeros((1, 3), dtype=np.float32),
    )
    import jax.numpy as jnp

    d = jnp.asarray([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]])
    out = np.asarray(sg.render_sg(params, d))
    np.testing.assert_allclose(out[0], 1.0, rtol=1e-5)  # at the lobe axis
    assert out[1].max() < 1e-8  # opposite pole


def test_sg_fit_recovers_smooth_envmap():
    """Fitting 12 lobes to an SG-generated map must drive the log-MSE low."""
    width = 32
    dirs = np.asarray(sphere.get_directions(width))[0]
    gt = sg.init_lobes(4)
    gt = gt._replace(log_amplitude=gt.log_amplitude + np.log([2.0, 1.0, 0.5]))
    target = np.asarray(sg.render_sg(gt, dirs)).reshape(width // 2, width, 3)

    params, losses = sg.fit_environment(target, n_lobes=12, steps=800, lr=5e-2)
    assert losses[-1] < losses[0] / 20.0, (losses[0], losses[-1])
    recon = sg.sg_representation(target, n_lobes=12, steps=800)
    rel = np.abs(recon - target).mean() / target.mean()
    assert rel < 0.2, rel
