"""FIT_INVERSE task wiring: scene setup, GT render cache, step builder.

Mirrors the reference's inverse-rendering flow (src/lightning/RENI_module.py:
64-73 on_fit_start, 363-384 generate_gt_renders, 107-112 training_step):
the mesh + camera are static, so rasterization happens exactly once on the
host (native C++ path); ground-truth renders of every test environment map
are precomputed on device; each training step decodes env maps from the
latents, unnormalises, renders with the differentiable Blinn-Phong shader
and descends the pixel loss into the latent codes.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from reni_tpu.core import sphere
from reni_tpu.models.reni import RENIModel
from reni_tpu.render import mesh as mesh_lib
from reni_tpu.render import shading
from reni_tpu.render.rasterizer import rasterize_world
from reni_tpu.train import tasks


class InverseRenderSetup:
    """Static scene for the inverse task; builds per-resolution pieces.

    ``azimuths``/``elevations`` add extra static camera views: the GT and
    predicted renders of all views are CONCATENATED along the image-height
    axis, so every loss (including the reference's cosine-over-pixel-axis
    quirk) applies unchanged — one view at azim=elev=0 is bit-identical to
    the reference's single look_at_view_transform(dist, 0, 0) camera
    (pytorch3d_envmap_shader.py:195-217). Multiple views widen the band of
    visible surface normals, conditioning the inverse problem: narrow-normal
    geometry (the bundled teapot seen side-on) leaves most of the
    environment in the shading operator's null space under a single view
    (PERF.md, FIT_INVERSE with the bundled teapot)."""

    def __init__(
        self,
        obj_path_or_mesh,
        *,
        render_resolution: int = 128,
        kd: float = 0.5,
        obj_rotation: float = 0.0,
        camera_distance: float = 2.0,
        shininess: float = 500.0,
        backend: str = "auto",
        light_chunk: int | None = None,
        azimuths: tuple[float, ...] = (0.0,),
        elevations: tuple[float, ...] | None = None,
    ):
        if isinstance(obj_path_or_mesh, mesh_lib.Mesh):
            m = obj_path_or_mesh
        else:
            m = mesh_lib.load_obj(obj_path_or_mesh)
        if obj_rotation:
            m = mesh_lib.Mesh(mesh_lib.rotate_y(m.verts, obj_rotation), m.faces)
        self.mesh = m
        self.render_resolution = render_resolution
        self.kd = kd
        azimuths = tuple(azimuths)
        if elevations is None:
            elevations = (0.0,) * len(azimuths)
        elevations = tuple(elevations)
        if len(elevations) == 1 and len(azimuths) > 1:
            elevations = elevations * len(azimuths)
        if len(elevations) != len(azimuths):
            raise ValueError(
                f"AZIMUTHS ({len(azimuths)}) and ELEVATIONS "
                f"({len(elevations)}) must pair up"
            )
        self.azimuths, self.elevations = azimuths, elevations

        vn = mesh_lib.vertex_normals(m)
        self._renders = []
        self.fragments = None
        for azim, elev in zip(azimuths, elevations):
            fragments, eye = rasterize_world(
                m, render_resolution, dist=camera_distance,
                elev=elev, azim=azim, backend=backend,
            )
            if self.fragments is None:
                self.fragments = fragments  # first view (back-compat)
            self._renders.append(
                shading.make_render_fn(
                    fragments,
                    m.face_verts,
                    vn[m.faces],
                    eye,
                    kd=kd,
                    shininess=shininess,
                    chunk=light_chunk,
                )
            )

    def render_fn(self, width: int) -> Callable:
        """render(envmaps (B, P, 3) unnormalised, sineweight (B, P, 3)) ->
        (B, V*H, W, 3) for env maps of equirect width ``width`` — the V
        static views stacked along the height axis (V=1: plain (B, H, W, 3))."""
        light_dirs = sphere.get_directions(width)[0]

        def render(envmaps, sineweight):
            views = [r(envmaps, sineweight, light_dirs) for r in self._renders]
            return views[0] if len(views) == 1 else jnp.concatenate(views, axis=1)

        return render

    def generate_gt_renders(
        self, images: jnp.ndarray, unnormalise: Callable, width: int, batch: int = 4
    ) -> jnp.ndarray:
        """GT renders for (S, P, 3) normalised env maps (RENI_module.py:363-384)."""
        render = self.render_fn(width)
        sw = sphere.get_sineweight(width)
        outs = []
        for i in range(0, images.shape[0], batch):
            chunk = unnormalise(images[i : i + batch])
            outs.append(render(chunk, jnp.broadcast_to(sw, chunk.shape)))
        return jnp.concatenate(outs, axis=0)


def fit_inverse(
    model: RENIModel,
    params,
    task_cfg: tasks.TaskConfig,
    dataset_images_at: Callable,
    unnormalise: Callable,
    key,
    *,
    setup: InverseRenderSetup | None = None,
    mesh=None,
    shard_latents: bool = False,
    callback_every: int | None = None,
    callback: Callable | None = None,
):
    """Full FIT_INVERSE task (analog of fit_task for the render loss)."""
    if setup is None:
        setup = InverseRenderSetup(
            task_cfg.object_path,
            render_resolution=task_cfg.render_resolution,
            kd=task_cfg.kd_value,
            azimuths=task_cfg.azimuths,
            elevations=task_cfg.elevations,
        )

    gt_cache: dict[tuple[int, int], jnp.ndarray] = {}

    def gt_at(res):
        res = tuple(res)
        if res not in gt_cache:
            gt_cache[res] = setup.generate_gt_renders(
                dataset_images_at(res), unnormalise, res[1]
            )
        return gt_cache[res]

    def step_builder(model_, optimizer, directions, sineweight, res):
        render = setup.render_fn(res[1])
        return tasks.make_fit_inverse_step(
            model_,
            optimizer,
            directions,
            sineweight,
            render,
            unnormalise,
            alpha=task_cfg.prior_loss_weight,
            beta=task_cfg.cosine_similarity_weight,
        )

    return tasks.fit_task(
        model,
        params,
        task_cfg,
        gt_at,
        key,
        step_builder=step_builder,
        mesh=mesh,
        shard_latents=shard_latents,
        callback_every=callback_every,
        callback=callback,
    )
