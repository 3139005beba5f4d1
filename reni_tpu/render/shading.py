"""Differentiable Blinn-Phong environment-map shading (JAX).

The reference treats every environment-map pixel as a directional light and
shades via dense (B, H, W, J, 3) half-vector einsums (reference:
src/utils/pytorch3d_envmap_shader.py:46-116) — ~0.5 GB of intermediates per
image at 128^2 x 8192 lights. Two TPU-first changes, identical math:

1. the half-vector tensor is never built: for unit V, L,
   ``N . normalize(V+L) = (N.V + N.L) / sqrt(2 + 2 V.L)`` — three
   (H, W, J) maps from plain matmuls;
2. the light axis runs through a remat'd ``lax.scan`` with a
   memory-budgeted chunk (a single chunk at the published scale — measured
   27x faster than small chunks on TPU), so gradients w.r.t. the light
   colors (the only trained input) recompute instead of storing.

Pipeline parity:
- pixel positions/normals from barycentric interpolation of face attributes
  (interpolate_face_attributes, shader.py:67-72), zeroed on background;
- diffuse  = clamp(N . L, 0, 1) einsum'd with light colors (shader.py:86-92);
- specular = clamp(N . H, 0, 1)^shininess with half-vectors against the
  camera eye (shader.py:94-111);
- Blinn-Phong normalisation (s+2)/(4(2-e^{-s/2})) (shader.py:112-114);
- output  = kd * diffuse + norm * ks * specular (shader.py:115);
- light colors are the env map **pre-scaled by sineweight**
  (EnvironmentMap, shader.py:33-43).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from reni_tpu.render.rasterizer import Fragments


def _pow(x: jnp.ndarray, exponent: float) -> jnp.ndarray:
    """x ** exponent with square-and-multiply for integer exponents.

    The Blinn-Phong exponent (shininess=500 in the published config) applied
    as a float power lowers to exp(e*log(x)) on the VPU — dozens of
    transcendental ops per pixel-light pair; an integer exponent needs ~12
    multiplies. Exact for x >= 0 (clamped inputs)."""
    e = int(exponent)
    if e != exponent or e < 1 or e > 1 << 16:
        return x**exponent
    result = None
    base = x
    while e:
        if e & 1:
            result = base if result is None else result * base
        base = base * base
        e >>= 1
    return result


def interpolate_face_attributes(
    pix_to_face: jnp.ndarray,  # (H, W) int32
    bary_coords: jnp.ndarray,  # (H, W, 3)
    face_attrs: jnp.ndarray,  # (F, 3, C)
) -> jnp.ndarray:
    """Barycentric interpolation of per-face-vertex attributes to pixels,
    zero where pix_to_face < 0 (PyTorch3D interpolate_face_attributes)."""
    safe = jnp.maximum(pix_to_face, 0)
    vals = jnp.einsum("hwk,hwkc->hwc", bary_coords, face_attrs[safe])
    return vals * (pix_to_face >= 0)[..., None]


def pixel_geometry(
    fragments: Fragments, face_verts: np.ndarray, face_normals: np.ndarray
):
    """Precompute per-pixel world positions and unit normals (both zero on
    background). face_verts/face_normals: (F, 3, 3) world-space."""
    p2f = jnp.asarray(fragments.pix_to_face)
    bary = jnp.asarray(fragments.bary_coords)
    positions = interpolate_face_attributes(p2f, bary, jnp.asarray(face_verts))
    normals = interpolate_face_attributes(p2f, bary, jnp.asarray(face_normals))
    norm = jnp.linalg.norm(normals, axis=-1, keepdims=True)
    normals = normals / jnp.maximum(norm, 1e-6)
    return positions, normals


def default_light_chunk(
    h: int, w: int, j_total: int, budget_bytes: int = 2 << 30
) -> int:
    """Largest light-chunk whose (H, W, chunk) f32 intermediates (~4 live
    maps) fit the budget. Single-shot (no scan) is ~15x faster than a
    chunked lax.scan on TPU (see PERF.md), so chunk only under memory
    pressure."""
    per_light = h * w * 4 * 4
    return max(128, min(j_total, budget_bytes // per_light))


@functools.partial(jax.jit, static_argnames=("shininess", "chunk"))
def blinn_phong_env_shading(
    normals: jnp.ndarray,  # (H, W, 3) unit, zero on background
    positions: jnp.ndarray,  # (H, W, 3) world
    camera_pos: jnp.ndarray,  # (3,)
    light_dirs: jnp.ndarray,  # (J, 3) unit (env-map pixel directions)
    light_colors: jnp.ndarray,  # (B, J, 3) radiance * sineweight
    *,
    kd: float,
    ks: float,
    shininess: float = 500.0,
    chunk: int | None = None,
) -> jnp.ndarray:
    """-> (B, H, W, 3) renders. chunk=None picks a memory-aware size."""
    view = camera_pos[None, None, :] - positions
    view = view / jnp.maximum(jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-6)

    j_total = light_dirs.shape[0]
    h, w = normals.shape[:2]
    if chunk is None:
        chunk = default_light_chunk(h, w, j_total)
    n_chunks = -(-j_total // chunk)
    pad = n_chunks * chunk - j_total
    ld = jnp.pad(light_dirs, ((0, pad), (0, 0)))
    lc = jnp.pad(light_colors, ((0, 0), (0, pad), (0, 0)))
    ld = ld.reshape(n_chunks, chunk, 3)
    lc = jnp.moveaxis(lc.reshape(light_colors.shape[0], n_chunks, chunk, 3), 1, 0)

    b = light_colors.shape[0]
    init = (jnp.zeros((b, h, w, 3)), jnp.zeros((b, h, w, 3)))

    ndotv = jnp.einsum("hwk,hwk->hw", normals, view)  # (H, W), chunk-invariant

    # The half-vector dot is computed without materialising the
    # (H, W, chunk, 3) half-vector tensor: for unit V and L,
    # N.normalize(V+L) = (N.V + N.L) / sqrt(2 + 2 V.L) — three (H, W, chunk)
    # maps from plain matmuls. ~3x less traffic than the reference's
    # explicit half-vector formulation and MXU-shaped.
    # remat: keeps the scan from saving per-chunk intermediates for backward.
    def body(acc, inputs):
        dirs, colors = inputs  # (chunk, 3), (B, chunk, 3)
        diff_acc, spec_acc = acc
        ndotl = jnp.einsum("hwk,jk->hwj", normals, dirs)  # (H, W, chunk)
        diff = jnp.einsum("hwj,bjk->bhwk", jnp.clip(ndotl, 0.0, 1.0), colors)
        vdotl = jnp.einsum("hwk,jk->hwj", view, dirs)  # (H, W, chunk)
        # fp rounding can push V.L slightly below -1; clamp inside the sqrt
        # (sqrt(negative) would poison the whole render with NaN)
        inv_norm = 1.0 / jnp.sqrt(jnp.maximum(2.0 + 2.0 * vdotl, 1e-12))
        ndoth = jnp.clip((ndotv[..., None] + ndotl) * inv_norm, 0.0, 1.0)
        spec = jnp.einsum("hwj,bjk->bhwk", _pow(ndoth, shininess), colors)
        return (diff_acc + diff, spec_acc + spec), None

    # Always scan with remat, even for a single chunk: on TPU the
    # scan-of-remat form compiles to a far better schedule than the inlined
    # body (measured 10.8 ms vs 84 ms at 128^2 x 8192 on the attached chip),
    # and recomputing the (H, W, chunk) maps in backward beats round-tripping
    # them through HBM.
    (diffuse, specular), _ = jax.lax.scan(jax.checkpoint(body), init, (ld, lc))
    norm_factor = (shininess + 2.0) / (4.0 * (2.0 - jnp.exp(-shininess / 2.0)))
    return kd * diffuse + norm_factor * ks * specular


def make_render_fn(
    fragments: Fragments,
    face_verts: np.ndarray,
    face_normals: np.ndarray,
    camera_pos: np.ndarray,
    *,
    kd: float,
    shininess: float = 500.0,
    chunk: int | None = None,
):
    """Bind the static scene; return render(envmaps (B, P, 3) *unnormalised*,
    sineweight (B, P, 3)) -> (B, H, W, 3), with light directions given
    separately at call time via closure rebinding per resolution."""
    positions, normals = pixel_geometry(fragments, face_verts, face_normals)
    cam = jnp.asarray(camera_pos)
    ks = 1.0 - kd

    def render(envmaps: jnp.ndarray, sineweight: jnp.ndarray, light_dirs: jnp.ndarray):
        colors = envmaps * sineweight  # EnvironmentMap pre-scaling
        return blinn_phong_env_shading(
            normals,
            positions,
            cam,
            light_dirs,
            colors,
            kd=kd,
            ks=ks,
            shininess=shininess,
            chunk=chunk,
        )

    return render
