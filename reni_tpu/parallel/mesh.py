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
- ``model`` axis: tensor parallelism over the SIREN trunk's hidden-feature
  dimension. Alternating column/row-parallel weight shardings (Megatron
  layout) so each layer *pair* costs one all-reduce; GSPMD inserts the
  collectives from the parameter shardings alone. The reference has no TP
  (SURVEY §2c: "not required for parity; net is a 256-wide MLP") — this
  axis exists for decoders too wide for one chip (the SO2 first-layer width
  grows as N^2, and the activation working set grows with batch x npix x
  hidden). The fused Pallas trunk assumes chip-resident weights, so TP
  training runs the XLA path (the dispatch in models/reni.py declines the
  kernel, with a printed reason, when the mesh carries a model axis > 1).

Everything goes through ``jax.jit`` with NamedShardings (GSPMD); no manual
collectives are needed for the XLA training path. The fused Pallas trunk is
the one opaque custom call GSPMD cannot partition — for it, the stage
runners enter ``kernel_mesh`` so the dispatch layer wraps the kernel in a
``shard_map`` over the data/pixel axes (kernels/siren_pallas.py): each
device runs the kernel on its local batch/pixel shard, and the backward
psums the weight gradients — the same collective GSPMD inserts for the XLA
path, so the shipped default (TPU.USE_PALLAS) keeps full per-chip
throughput under data parallelism instead of all-gathering the batch.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int = -1, n_pixel: int = 1, n_model: int = 1, devices=None
) -> Mesh:
    """Build a ('data', 'pixel', 'model') mesh. n_data=-1 uses all remaining
    devices. Axis sizes of 1 are kept (a size-1 axis in a PartitionSpec is a
    no-op), so every mesh carries all three names."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data == -1:
        assert n % (n_pixel * n_model) == 0, (n, n_pixel, n_model)
        n_data = n // (n_pixel * n_model)
    used = n_data * n_pixel * n_model
    assert used <= n, (n_data, n_pixel, n_model, n)
    grid = np.array(devices[:used]).reshape(n_data, n_pixel, n_model)
    return Mesh(grid, axis_names=("data", "pixel", "model"))


def model_axis_size(mesh: Mesh) -> int:
    return mesh.shape.get("model", 1)


# ---------------------------------------------------------------------------
# kernel-mesh context: makes the active mesh visible to the Pallas dispatch
# ---------------------------------------------------------------------------

_KERNEL_MESH: list[Mesh | None] = []


@contextlib.contextmanager
def kernel_mesh(mesh: Mesh | None):
    """Make ``mesh`` visible to the fused-kernel dispatch layer for the
    duration of the block (trace time is what matters: programs traced
    inside see it and embed a ``shard_map``-wrapped kernel partitioned over
    the data/pixel axes instead of an opaque ``pallas_call`` GSPMD would
    have to all-gather around). The stage runners below enter this context
    around every compiled-program call; entering with ``None`` is a no-op
    shadowing any outer mesh."""
    _KERNEL_MESH.append(mesh)
    try:
        yield
    finally:
        _KERNEL_MESH.pop()


def active_kernel_mesh() -> Mesh | None:
    return _KERNEL_MESH[-1] if _KERNEL_MESH else None


def put_sharded(x, sharding: NamedSharding):
    """Place ``x`` on the mesh with ``sharding``.

    Single-process: plain ``jax.device_put``. Multi-process (a real
    jax.distributed job, e.g. a TPU pod or the 2-process CPU cluster in
    tests/test_multihost.py): host data — the same full array on every
    process, DDP semantics — contributes only its addressable shards via
    ``make_array_from_callback``; an already-global jax.Array (e.g. the
    state coming out of a previous stage) reshards SPMD-side instead (its
    remote shards cannot be read on this host)."""
    if jax.process_count() > 1:
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            # SPMD reshard; jit-identity rather than device_put — the input
            # may carry a compiler-chosen sharding (out of a jitted pad/
            # unpad), which device_put's reshard path rejects
            return jax.jit(lambda a: a, out_shardings=sharding)(x)
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )
    return jax.device_put(x, sharding)


def pixel_axis_or_none(mesh: Mesh, npix: int) -> str | None:
    """The single policy for sharding a pixel-sized axis: 'pixel' when the
    extent divides the axis, else None (replicate). Shared by the resident
    stage data placement and the streaming per-batch placement so the two
    paths cannot diverge."""
    return "pixel" if npix % mesh.shape["pixel"] == 0 else None


def batch_sharding(
    mesh: Mesh, npix: int | None = None
) -> tuple[NamedSharding, NamedSharding, NamedSharding]:
    """(imgs (B, P, 3), idx (B,), bmask (B,)) shardings for one batch.
    With ``npix`` given, a non-divisible pixel axis replicates."""
    pix = "pixel" if npix is None else pixel_axis_or_none(mesh, npix)
    return (
        NamedSharding(mesh, P("data", pix, None)),
        NamedSharding(mesh, P("data")),
        NamedSharding(mesh, P("data")),
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def stream_chunk_shardings(
    mesh: Mesh, npix: int
) -> tuple[NamedSharding, NamedSharding]:
    """Shardings for the chunked streaming path (TPU.STREAM_CHUNK > 1):
    the flat (K·B, P, 3) super-slice shards its row axis over 'data' (each
    device resident for K LOCAL batches — B/n_data rows per step, the same
    per-device footprint scaling as the unchunked per-batch transfer) and
    its pixel axis by the shared :func:`pixel_axis_or_none` policy; (K, B)
    per-step index/mask matrices shard their batch axis."""
    pix = pixel_axis_or_none(mesh, npix)
    return (
        NamedSharding(mesh, P("data", pix, None)),
        NamedSharding(mesh, P(None, "data")),
    )


def stream_chunk_layout(
    mesh: Mesh, idx_chunk: "np.ndarray"
) -> tuple["np.ndarray", "np.ndarray"]:
    """Host-side row order + shard-local gather indices for one streaming
    super-slice.

    ``idx_chunk`` is (K, B) dataset indices (B divisible by the data axis).
    Returns ``(perm, rows)``: staging ``images[perm]`` lays the flat
    (K·B, P, 3) slice out data-shard-major — shard d's contiguous block is
    exactly its own (K, B/n_data) rows — and ``rows`` is the (K, B) matrix
    of shard-LOCAL row indices ``chunk_gather`` consumes (every shard's
    segment of row k holds the same values ``k·Bd + arange(Bd)``, split
    over 'data' by the P(None, 'data') sharding)."""
    K, B = idx_chunk.shape
    nd = mesh.shape["data"]
    bd = B // nd
    perm = idx_chunk.reshape(K, nd, bd).transpose(1, 0, 2).reshape(-1)
    rows = np.tile(bd * np.arange(K)[:, None] + np.arange(bd), (1, nd))
    return perm, rows


def put_rows(source, rows: "np.ndarray", sharding: NamedSharding):
    """Stage ``source[rows]`` (a batch or streaming super-slice) with
    ``sharding``, materialising only this process's rows.

    Single-process: a plain gather + device_put. Multi-process: the
    per-shard callback gathers ``rows[shard-slice]`` only — with an
    out-of-core source (``data.datasets.DiskRowSource``) each host decodes
    exactly its own addressable rows of every batch, the per-host data
    economy a pod loader needs (the source's LRU absorbs the repeated
    callbacks of pixel-axis-sharded meshes)."""
    if jax.process_count() == 1:
        return jax.device_put(source[rows], sharding)
    shape = (len(rows),) + tuple(source.shape[1:])
    blocks: dict = {}  # row-slice -> gathered block (pixel/model shards reuse)

    def cb(idx):
        key = (idx[0].start, idx[0].stop, idx[0].step)
        block = blocks.get(key)
        if block is None:
            block = blocks[key] = source[np.asarray(rows[idx[0]])]
        return block[(slice(None),) + tuple(idx[1:])]

    return jax.make_array_from_callback(shape, sharding, cb)


def batch_local_positions(
    sharding: NamedSharding, shape: tuple
) -> "np.ndarray | None":
    """Positions (into the leading/batch axis) of this process's
    addressable rows under ``sharding``, or None when that is all of them
    (single-process). Lets the streaming runner prefetch only the rows
    this host will actually stage."""
    if jax.process_count() == 1:
        return None
    pos = set()
    for idx in sharding.addressable_devices_indices_map(tuple(shape)).values():
        pos.update(range(*idx[0].indices(shape[0])))
    return np.asarray(sorted(pos))


@functools.lru_cache(maxsize=32)
def chunk_gather(mesh: Mesh, pix: str | None):
    """Collective-free per-step batch gather out of a data-sharded
    streaming super-slice: under ``shard_map`` each data shard indexes its
    own contiguous (K·Bd, P_local, 3) block with the shard-local ``rows``
    from :func:`stream_chunk_layout` — no all-gather of image bytes, unlike
    a GSPMD gather over a sharded operand with runtime indices. Memoized so
    the chunk runner's jit cache (keyed on the gather fn) holds across
    callback segments."""
    spec = P("data", pix, None)

    def local(imgs, rows):
        return imgs[rows]

    return jax.shard_map(
        local, mesh=mesh, in_specs=(spec, P("data")), out_specs=spec,
        check_vma=False,
    )


def shard_stage_data(mesh: Mesh, images, idx_b, bmask_b):
    """Place the stage's data on the mesh: the image/target source array
    (S, P, 3) (or render targets (S, H, W, 3)) shards its pixel/row axis on
    'pixel' when divisible and replicates over 'data' — batches are
    gathered inside the compiled scan by index, and GSPMD shards the
    gathered batch rows over 'data' from the index sharding."""
    spec = [None] * images.ndim
    if images.ndim >= 2:
        spec[1] = pixel_axis_or_none(mesh, images.shape[1])
    s_imgs = NamedSharding(mesh, P(*spec))
    s_idx = NamedSharding(mesh, P(None, "data"))
    return (
        put_sharded(images, s_imgs),
        put_sharded(idx_b, s_idx),
        put_sharded(bmask_b, s_idx),
    )


def _path_keys(path) -> list:
    """Flatten a tree_util key path to plain dict keys / list indices /
    attribute names (DictKey, SequenceKey, GetAttrKey all appear: params are
    dicts+lists, optax states are NamedTuples)."""
    keys = []
    for p in path:
        for attr in ("key", "idx", "name"):
            k = getattr(p, attr, None)
            if k is not None:
                keys.append(k)
                break
    return keys


def _decoder_leaf_role(path):
    """Identify a decoder weight leaf anywhere in a TrainState (params or
    the matching adam-moment leaves): ('layers', i, 'w'|'b'),
    ('final', 'w'|'b'), ('mapping',) or None."""
    keys = _path_keys(path)
    if "decoder" not in keys:
        return None
    tail = keys[keys.index("decoder") + 1 :]
    if len(tail) == 3 and tail[0] == "layers" and isinstance(tail[1], int):
        return ("layers", tail[1], tail[2])
    if len(tail) == 2 and tail[0] == "final":
        return ("final", tail[1])
    if tail and tail[0] == "mapping":
        return ("mapping",)
    return None


def _n_trunk_layers(state) -> int:
    """Number of entries in the decoder's ``layers`` list, discovered from
    leaf paths (the decoder may live in the trainable or the frozen tree)."""
    n = 0
    for path, _ in jax.tree_util.tree_leaves_with_path(state):
        role = _decoder_leaf_role(path)
        if role is not None and role[0] == "layers":
            n = max(n, role[1] + 1)
    return n


def _tp_spec(path, leaf, n_model: int, n_trunk: int):
    """Megatron-style alternating partition spec for one decoder leaf.

    Even trunk layers are column-parallel (output features sharded), odd
    layers row-parallel (input features sharded, psum'd output); the final
    linear is row-parallel iff the last trunk layer left its activations
    feature-sharded. The mapping network (FiLM) stays replicated — its
    modulations are per-image (B, h), negligible next to the per-pixel
    trunk. Non-divisible feature dims raise rather than silently replicate.
    """
    role = _decoder_leaf_role(path)
    if role is None:
        return None

    def check(dim: int):
        if dim % n_model != 0:
            raise ValueError(
                f"decoder leaf {jax.tree_util.keystr(path)} has feature dim "
                f"{dim}, not divisible by the model axis ({n_model}); pick "
                "a model-axis size dividing HIDDEN_FEATURES"
            )

    if role[0] == "layers":
        _, i, wb = role
        col = i % 2 == 0
        if wb == "w":
            check(leaf.shape[1] if col else leaf.shape[0])
            return P(None, "model") if col else P("model", None)
        if col:
            check(leaf.shape[0])
            return P("model")
        return P()
    if role[0] == "final" and role[1] == "w" and (n_trunk - 1) % 2 == 0:
        check(leaf.shape[0])
        return P("model", None)
    return P()


def _is_latent_table(path, leaf) -> bool:
    return (
        hasattr(leaf, "ndim")
        and leaf.ndim == 3
        and leaf.shape[-1] == 3
        and any(getattr(p, "key", None) == "latents" for p in path)
    )


def state_sharding(
    mesh: Mesh, state, shard_latents: bool = False, shard_model: bool | None = None
):
    """Sharding tree for a TrainState: everything replicated, except —

    - with ``shard_latents``: latent-table leaves (and their optimizer
      moments) row-sharded over the 'data' axis. That is the SURVEY §2c
      "embedding-style sharded latent table": per-image rows are model
      state, so for huge datasets the (S, N, 3) tables shard by row and XLA
      gathers the batch rows (disjoint per shard under sequential batching).
    - with ``shard_model`` (default: on iff the mesh's 'model' axis is >1):
      decoder trunk weights (and their adam moments) tensor-parallel over
      the 'model' axis in the alternating column/row layout of ``_tp_spec``.

    Tables whose row count does not divide the data axis cannot be
    row-sharded by GSPMD — pad them first (``pad_latent_rows``, which
    ``sharded_stage_runner`` applies automatically); reaching this function
    unpadded raises rather than silently replicating (an OOM surprise at the
    huge-dataset scale this feature exists for)."""
    rep = NamedSharding(mesh, P())
    n_model = model_axis_size(mesh)
    if shard_model is None:
        shard_model = n_model > 1
    shard_model = shard_model and n_model > 1
    if not shard_latents and not shard_model:
        return jax.tree.map(lambda _: rep, state)
    row = NamedSharding(mesh, P("data", None, None))
    n_data = mesh.shape["data"]
    n_trunk = _n_trunk_layers(state) if shard_model else 0

    def pick(path, leaf):
        if shard_model:
            spec = _tp_spec(path, leaf, n_model, n_trunk)
            if spec is not None:
                return NamedSharding(mesh, spec)
        if shard_latents and _is_latent_table(path, leaf):
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
                n_pad = target - s
                if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
                    # cross-process leaf: eager ops are forbidden; run the
                    # pad as a (consistently-executed) SPMD program
                    return jax.jit(
                        lambda l: jnp.concatenate(
                            [l, jnp.zeros((n_pad,) + l.shape[1:], l.dtype)]
                        )
                    )(leaf)
                pad_rows = jnp.zeros((n_pad,) + leaf.shape[1:], leaf.dtype)
                return jnp.concatenate([jnp.asarray(leaf), pad_rows])
        return leaf

    return jax.tree_util.tree_map_with_path(pad, state), sizes


def unpad_latent_rows(state, sizes: dict[str, int]):
    """Inverse of ``pad_latent_rows``."""
    if not sizes:
        return state

    def unpad(path, leaf):
        s = sizes.get(jax.tree_util.keystr(path))
        if s is None:
            return leaf
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            return jax.jit(lambda l: l[:s])(leaf)
        return leaf[:s]

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
        imgs_s, idx_b, bmask_b = shard_stage_data(
            mesh, jnp.asarray(images), jnp.asarray(idx), jnp.asarray(bmask)
        )
        pad_sizes = {}
        if shard_latents:
            state, pad_sizes = pad_latent_rows(state, mesh.shape["data"])
        state = jax.tree.map(
            put_sharded, state, state_sharding(mesh, state, shard_latents)
        )

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
            # kernel_mesh: programs traced here dispatch the fused Pallas
            # trunk through a shard_map partitioned over data/pixel
            with kernel_mesh(mesh):
                state, metrics = run(state, imgs_s, idx_b, bmask_b, length=seg)
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

    with kernel_mesh(flat):
        return run(params, Z, d_sharded)


Params = dict[str, Any]
