"""Rasterization front-end: native C++ fast path, numpy fallback.

Produces PyTorch3D-style fragments (pix_to_face, barycentrics, zbuf) for the
reference's exact rasterizer settings — 1 face/pixel, no blur, screen-space
barycentrics (reference: src/utils/pytorch3d_envmap_shader.py:197-208).

The native library (native/rasterizer.cpp) is compiled on first use with the
system toolchain and cached; the numpy implementation is a bit-compatible
fallback used when no compiler is available and as a test oracle.
"""

from __future__ import annotations

import ctypes
import dataclasses
import os

import numpy as np

from reni_tpu.render.mesh import Mesh, fov_project, look_at

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "librasterizer.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "rasterizer.cpp")

_lib = None
_lib_failed = False


@dataclasses.dataclass
class Fragments:
    pix_to_face: np.ndarray  # (H, W) int32, -1 = background
    bary_coords: np.ndarray  # (H, W, 3) float32
    zbuf: np.ndarray  # (H, W) float32 (inf = background)


def _load_native():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        from reni_tpu.utils.native_build import load_native

        lib = load_native(_SRC_PATH, _SO_PATH)
        lib.rasterize_mesh.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.rasterize_mesh.restype = None
        _lib = lib
    except Exception:
        _lib_failed = True
        _lib = None
    return _lib


def rasterize_ndc(
    verts_ndc: np.ndarray,
    faces: np.ndarray,
    height: int,
    width: int,
    znear: float = 1e-8,
    backend: str = "auto",
) -> Fragments:
    """Rasterize NDC-space verts (x_ndc, y_ndc, z_view) to fragments."""
    verts_ndc = np.ascontiguousarray(verts_ndc, dtype=np.float32)
    faces = np.ascontiguousarray(faces, dtype=np.int32)
    lib = _load_native() if backend in ("auto", "native") else None
    if backend == "native" and lib is None:
        raise RuntimeError("native rasterizer unavailable (no C++ toolchain?)")
    if lib is not None:
        pix = np.empty((height, width), dtype=np.int32)
        bary = np.empty((height, width, 3), dtype=np.float32)
        zbuf = np.empty((height, width), dtype=np.float32)
        lib.rasterize_mesh(
            verts_ndc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            np.int32(verts_ndc.shape[0]),
            np.int32(faces.shape[0]),
            np.int32(height),
            np.int32(width),
            np.float32(znear),
            pix.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            bary.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            zbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return Fragments(pix, bary, zbuf)
    return _rasterize_numpy(verts_ndc, faces, height, width, znear)


def _rasterize_numpy(
    verts_ndc, faces, height: int, width: int, znear: float, chunk: int = 512
) -> Fragments:
    """Vectorised numpy z-buffer rasterizer (fallback / oracle)."""
    px = 1.0 - (2.0 * np.arange(width) + 1.0) / width  # x_ndc per column
    py = 1.0 - (2.0 * np.arange(height) + 1.0) / height  # y_ndc per row
    pxg, pyg = np.meshgrid(px, py)  # (H, W)
    p = np.stack((pxg, pyg), -1).reshape(-1, 2)  # (P, 2)

    n_pix = height * width
    zbuf = np.full((n_pix,), np.inf, dtype=np.float32)
    pix_to_face = np.full((n_pix,), -1, dtype=np.int32)
    bary = np.zeros((n_pix, 3), dtype=np.float32)

    tv = verts_ndc[faces]  # (F, 3, 3)
    for f0 in range(0, faces.shape[0], chunk):
        t = tv[f0 : f0 + chunk]  # (c, 3, 3)
        a, b, c = t[:, 0, :2], t[:, 1, :2], t[:, 2, :2]
        zs = t[:, :, 2]  # (c, 3)
        # signed area with the same orientation as the edge() helper:
        # area = edge(a, b, c) = cross(c - a, b - a)
        area = (c[:, 0] - a[:, 0]) * (b[:, 1] - a[:, 1]) - (
            c[:, 1] - a[:, 1]
        ) * (b[:, 0] - a[:, 0])
        ok = np.abs(area) > 1e-12
        inv_area = np.where(ok, 1.0 / np.where(ok, area, 1.0), 0.0)

        def edge(u, v):
            d = v - u  # (c, 2)
            return (
                (p[None, :, 0] - u[:, None, 0]) * d[:, None, 1]
                - (p[None, :, 1] - u[:, None, 1]) * d[:, None, 0]
            )  # (c, P)

        w0 = edge(b, c) * inv_area[:, None]
        w1 = edge(c, a) * inv_area[:, None]
        w2 = edge(a, b) * inv_area[:, None]
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & ok[:, None]
        z = w0 * zs[:, 0:1] + w1 * zs[:, 1:2] + w2 * zs[:, 2:3]  # (c, P)
        z = np.where(inside & (z > znear), z, np.inf)
        best = np.argmin(z, axis=0)  # (P,)
        best_z = z[best, np.arange(n_pix)]
        upd = best_z < zbuf
        zbuf[upd] = best_z[upd].astype(np.float32)
        pix_to_face[upd] = (f0 + best[upd]).astype(np.int32)
        bary[upd] = np.stack(
            (
                w0[best[upd], np.where(upd)[0]],
                w1[best[upd], np.where(upd)[0]],
                w2[best[upd], np.where(upd)[0]],
            ),
            -1,
        ).astype(np.float32)

    return Fragments(
        pix_to_face.reshape(height, width),
        bary.reshape(height, width, 3),
        zbuf.reshape(height, width),
    )


def rasterize_world(
    mesh: Mesh,
    image_size: int,
    *,
    dist: float = 2.0,
    elev: float = 0.0,
    azim: float = 0.0,
    fov_deg: float = 60.0,
    backend: str = "auto",
) -> tuple[Fragments, np.ndarray]:
    """World mesh + look_at camera -> (fragments, camera eye position).

    Matches the reference's build_renderer setup: look_at_view_transform
    (dist, elev, azim) and a default FoVPerspectiveCameras
    (pytorch3d_envmap_shader.py:195-217)."""
    r, t, eye = look_at(dist, elev, azim)
    verts_view = mesh.verts @ r + t
    verts_ndc = fov_project(verts_view, fov_deg)
    frags = rasterize_ndc(verts_ndc, mesh.faces, image_size, image_size, backend=backend)
    return frags, eye
