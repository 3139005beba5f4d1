"""Device mesh and sharding layout.

The reference's only distribution strategy is DDP data parallelism over
4 GPUs via NCCL (reference: run.py:94-97); there is no tensor/pipeline/
expert parallelism to mirror (SURVEY §2c). The TPU-native equivalent is a
2-D ``jax.sharding.Mesh``:

- ``data`` axis: batch dimension of images/indices — classic DP. Gradients
  for the replicated parameters (decoder weights *and* the latent table,
  whose per-row grads are nonzero only for local batch rows) are combined by
  the psum XLA inserts — exactly DDP's all-reduce, riding ICI.
- ``pixel`` axis: the H*W direction dimension — the natural "sequence
  parallel" analog for a spherical field (SURVEY §2c): every direction is
  independent, so sharding it is communication-free until the loss
  reduction's psum. Used for large-resolution decodes/renders.

Everything goes through ``jax.jit`` with NamedShardings (GSPMD); no manual
collectives are needed for the training path.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int = -1, n_pixel: int = 1, devices=None
) -> Mesh:
    """Build a ('data', 'pixel') mesh. n_data=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data == -1:
        assert n % n_pixel == 0, (n, n_pixel)
        n_data = n // n_pixel
    assert n_data * n_pixel <= n, (n_data, n_pixel, n)
    grid = np.array(devices[: n_data * n_pixel]).reshape(n_data, n_pixel)
    return Mesh(grid, axis_names=("data", "pixel"))


def batch_sharding(mesh: Mesh) -> tuple[NamedSharding, NamedSharding, NamedSharding]:
    """(imgs (B, P, 3), idx (B,), bmask (B,)) shardings for one batch."""
    return (
        NamedSharding(mesh, P("data", "pixel", None)),
        NamedSharding(mesh, P("data")),
        NamedSharding(mesh, P("data")),
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_stage_data(mesh: Mesh, imgs_b, idx_b, bmask_b):
    """Place stacked per-stage batches on the mesh: batch on 'data', the
    axis after it on 'pixel' when divisible (the H*W direction axis for env
    maps (nb, B, P, 3); render targets (nb, B, H, W, 3) shard H)."""
    spec = [None, "data"] + [None] * (imgs_b.ndim - 2)
    if imgs_b.ndim >= 3 and imgs_b.shape[2] % mesh.shape["pixel"] == 0:
        spec[2] = "pixel"
    s_imgs = NamedSharding(mesh, P(*spec))
    s_idx = NamedSharding(mesh, P(None, "data"))
    return (
        jax.device_put(imgs_b, s_imgs),
        jax.device_put(idx_b, s_idx),
        jax.device_put(bmask_b, s_idx),
    )


def _is_latent_table(path, leaf) -> bool:
    return (
        hasattr(leaf, "ndim")
        and leaf.ndim == 3
        and leaf.shape[-1] == 3
        and any(getattr(p, "key", None) == "latents" for p in path)
    )


def state_sharding(mesh: Mesh, state, shard_latents: bool = False):
    """Sharding tree for a TrainState: everything replicated, except —
    with ``shard_latents`` — latent-table leaves (and their optimizer
    moments) row-sharded over the 'data' axis. That is the SURVEY §2c
    "embedding-style sharded latent table": per-image rows are model state,
    so for huge datasets the (S, N, 3) tables shard by row and XLA gathers
    the batch rows (disjoint per shard under sequential batching).

    Tables whose row count does not divide the data axis cannot be
    row-sharded by GSPMD — pad them first (``pad_latent_rows``, which
    ``sharded_stage_runner`` applies automatically); reaching this function
    unpadded raises rather than silently replicating (an OOM surprise at the
    huge-dataset scale this feature exists for)."""
    rep = NamedSharding(mesh, P())
    if not shard_latents:
        return jax.tree.map(lambda _: rep, state)
    row = NamedSharding(mesh, P("data", None, None))
    n_data = mesh.shape["data"]

    def pick(path, leaf):
        if _is_latent_table(path, leaf):
            if leaf.shape[0] % n_data != 0:
                raise ValueError(
                    f"latent table {jax.tree_util.keystr(path)} has "
                    f"{leaf.shape[0]} rows, not divisible by the data axis "
                    f"({n_data}); pad with pad_latent_rows() first"
                )
            return row
        return rep

    return jax.tree_util.tree_map_with_path(pick, state)


def pad_latent_rows(state, multiple: int):
    """Pad every latent-table leaf (and its optimizer moments, which share
    the 'latents' key path) with zero rows up to a multiple of ``multiple``.

    Exactness: batches index only real rows (make_batches pads index
    vectors with 0), so padded rows receive zero gradient and a zero adam
    update — slicing them off afterwards (``unpad_latent_rows``) recovers
    the unpadded computation bit-for-bit.

    Returns (padded_state, sizes) where sizes maps key paths to original
    row counts (empty if nothing was padded)."""
    import jax.numpy as jnp

    sizes: dict[str, int] = {}

    def pad(path, leaf):
        if _is_latent_table(path, leaf):
            s = leaf.shape[0]
            target = -(-s // multiple) * multiple
            if target != s:
                sizes[jax.tree_util.keystr(path)] = s
                pad_rows = jnp.zeros((target - s,) + leaf.shape[1:], leaf.dtype)
                return jnp.concatenate([jnp.asarray(leaf), pad_rows])
        return leaf

    return jax.tree_util.tree_map_with_path(pad, state), sizes


def unpad_latent_rows(state, sizes: dict[str, int]):
    """Inverse of ``pad_latent_rows``."""
    if not sizes:
        return state

    def unpad(path, leaf):
        s = sizes.get(jax.tree_util.keystr(path))
        return leaf[:s] if s is not None else leaf

    return jax.tree_util.tree_map_with_path(unpad, state)


def sharded_stage_runner(mesh: Mesh, shard_latents: bool = False):
    """A drop-in for `tasks.run_stage` that pins the state replicated (or
    latent-row-sharded) and the scanned data sharded, letting GSPMD insert
    the DP psum."""
    import jax.numpy as jnp

    from reni_tpu.train import tasks as _tasks

    def run_stage(step_fn, state, images, n_epochs, batch_size):
        dataset_size = images.shape[0]
        # batch must split evenly over the data axis; extra rows are
        # zero-masked, which the tasks layer treats exactly
        batch_size = pad_batch_to(batch_size, mesh.shape["data"])
        idx, bmask = _tasks.make_batches(dataset_size, batch_size)
        imgs_b = jnp.asarray(images)[jnp.asarray(idx)]
        imgs_b, idx_b, bmask_b = shard_stage_data(
            mesh, imgs_b, jnp.asarray(idx), jnp.asarray(bmask)
        )
        pad_sizes = {}
        if shard_latents:
            state, pad_sizes = pad_latent_rows(state, mesh.shape["data"])
        state = jax.device_put(state, state_sharding(mesh, state, shard_latents))

        # same memoized whole-stage program as the single-device runner —
        # GSPMD partitioning follows the input shardings placed above
        run = _tasks._scan_runner(step_fn)

        cap = _tasks._max_steps_per_program()
        nb = idx_b.shape[0]
        epochs_per_program = max(1, cap // nb) if cap else n_epochs
        chunks = []
        done = 0
        while done < n_epochs:
            seg = min(epochs_per_program, n_epochs - done)
            state, metrics = run(state, imgs_b, idx_b, bmask_b, seg)
            chunks.append(metrics)
            done += seg
        state = unpad_latent_rows(state, pad_sizes)
        if len(chunks) == 1:
            return state, chunks[0]
        merged = jax.tree.map(lambda *xs: jnp.concatenate(xs), *chunks)
        return state, merged

    return run_stage


def pad_batch_to(batch_size: int, multiple: int) -> int:
    """Batch sizes must divide evenly across the data axis; padded rows are
    zero-masked by the tasks layer, so rounding up is exact."""
    return -(-batch_size // multiple) * multiple


def decode_sharded(model, params, Z, directions, mesh: Mesh | None = None):
    """Large-resolution decode with the H*W direction axis sharded over the
    whole mesh (batch replicated) — the communication-free "sequence
    parallel" path for e.g. 512x1024 env-map synthesis. directions:
    (1, P, 3); returns (B, P, 3) fully addressable on the host."""
    if mesh is None:
        mesh = make_mesh()
    flat = Mesh(mesh.devices.reshape(-1), axis_names=("pixel",))
    d_sharded = jax.device_put(
        directions, NamedSharding(flat, P(None, "pixel", None))
    )
    rep = NamedSharding(flat, P())
    params = jax.device_put(params, rep)
    Z = jax.device_put(Z, rep)

    @jax.jit
    def run(params, Z, d):
        return model.apply(params, Z, d)

    return run(params, Z, d_sharded)


Params = dict[str, Any]
