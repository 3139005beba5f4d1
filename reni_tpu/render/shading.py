"""Differentiable Blinn-Phong environment-map shading (JAX).

The reference treats every environment-map pixel as a directional light and
shades via dense (B, H, W, J) einsums (reference:
src/utils/pytorch3d_envmap_shader.py:46-116) — ~0.5 GB of intermediates per
image at 128^2 x 8192 lights. Here the light axis is processed in chunks
inside a ``lax.scan`` accumulating the (B, H, W, 3) diffuse/specular sums,
so peak memory is O(chunk) while the math (and its gradients w.r.t. the
light colors, the only trained input) is identical.

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
    chunk: int = 512,
) -> jnp.ndarray:
    """-> (B, H, W, 3) renders."""
    view = camera_pos[None, None, :] - positions
    view = view / jnp.maximum(jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-6)

    j_total = light_dirs.shape[0]
    n_chunks = -(-j_total // chunk)
    pad = n_chunks * chunk - j_total
    ld = jnp.pad(light_dirs, ((0, pad), (0, 0)))
    lc = jnp.pad(light_colors, ((0, 0), (0, pad), (0, 0)))
    ld = ld.reshape(n_chunks, chunk, 3)
    lc = jnp.moveaxis(lc.reshape(light_colors.shape[0], n_chunks, chunk, 3), 1, 0)

    b = light_colors.shape[0]
    h, w = normals.shape[:2]
    init = (jnp.zeros((b, h, w, 3)), jnp.zeros((b, h, w, 3)))

    def body(acc, inputs):
        dirs, colors = inputs  # (chunk, 3), (B, chunk, 3)
        diff_acc, spec_acc = acc
        ndotl = jnp.clip(jnp.einsum("hwk,jk->hwj", normals, dirs), 0.0, 1.0)
        diff = jnp.einsum("hwj,bjk->bhwk", ndotl, colors)
        half = view[:, :, None, :] + dirs[None, None, :, :]  # (H, W, chunk, 3)
        half = half / jnp.maximum(
            jnp.linalg.norm(half, axis=-1, keepdims=True), 1e-6
        )
        ndoth = jnp.clip(jnp.einsum("hwk,hwjk->hwj", normals, half), 0.0, 1.0)
        spec = jnp.einsum("hwj,bjk->bhwk", ndoth**shininess, colors)
        return (diff_acc + diff, spec_acc + spec), None

    (diffuse, specular), _ = jax.lax.scan(body, init, (ld, lc))
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
    chunk: int = 512,
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
