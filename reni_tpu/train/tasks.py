"""Training tasks as jit-scanned update loops.

The reference drives three tasks through a PyTorch-Lightning trainer
(src/lightning/RENI_module.py, run.py); here each task is a pure function:
whole-dataset device residency, sequential fixed batches (the reference's
DataLoader does not shuffle), and a **single compiled program per resolution
stage** — ``lax.scan`` over epochs of ``lax.scan`` over batches. Multi-res
curriculum = one such program per stage (3 compiles for the published
config), exactly the static-shape plan from SURVEY §7.

Ragged final batches are handled inside the scan by zero-masking: padded
rows contribute exactly zero to every loss term (sineweight rows, mu/log_var
rows, Z rows and the per-sample cosine term are all multiplied by the batch
mask), which reproduces the reference's drop_last=False sum-over-batch
semantics bit-for-bit while keeping one static shape.

Tasks:
- fit_decoder  (RENI_module.py training_step FIT_DECODER branch :80-146)
- fit_latent   (FIT_LATENT branch; optional mask -> in-painting :92-94)
- fit_inverse  (FIT_INVERSE branch; differentiable render loop :107-112)
  — wired in reni_tpu.render, see `make_fit_inverse_step`.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from reni_tpu.core import sphere
from reni_tpu.models.reni import RENIModel
from reni_tpu.train import losses
from reni_tpu.train.optim import (
    OptimConfig,
    build_optimizer,
    merge_params,
    partition_params,
)

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TaskConfig:
    """Per-task training hyperparameters (configs/default.py:24-83)."""

    task: str = "FIT_DECODER"  # FIT_DECODER | FIT_LATENT | FIT_INVERSE
    optim: OptimConfig = OptimConfig()
    batch_size: int = 1
    epochs: int = 2400
    multi_res_training: bool = True
    initial_resolution: tuple[int, int] = (16, 32)
    final_resolution: tuple[int, int] = (64, 128)
    curriculum: tuple[int, ...] = (800, 1600)
    # FIT_DECODER
    kld_weighting: float = 1e-4
    # FIT_LATENT / FIT_INVERSE
    cosine_similarity_weight: float = 1e-4
    prior_loss_weight: float = 1e-7
    apply_mask: bool = False
    mask_path: str | None = None
    # FIT_INVERSE
    render_resolution: int = 128
    object_path: str | None = None
    kd_value: float = 0.5
    azimuths: tuple[float, ...] = (0.0,)
    elevations: tuple[float, ...] = (0.0,)

    @classmethod
    def from_config(cls, config, task: str) -> "TaskConfig":
        """Build from a reference-format config tree: config.RENI[task]
        (configs/default.py:24-83; key spellings preserved, including
        INITAL_RESOLUTION)."""
        t = config.RENI[task]
        optim = OptimConfig(
            lr_start=float(t.LR_START),
            lr_end=float(t.LR_END),
            optimizer=t.OPTIMIZER,
            beta1=float(t.OPTIMIZER_BETA_1),
            beta2=float(t.OPTIMIZER_BETA_2),
            scheduler_type=t.SCHEDULER_TYPE,
            scheduler_step_size=int(t.SCHEDULER_STEP_SIZE),
            scheduler_gamma=float(t.SCHEDULER_GAMMA),
            epochs=int(t.EPOCHS),
        )
        kwargs = dict(
            task=task,
            optim=optim,
            batch_size=int(t.BATCH_SIZE),
            epochs=int(t.EPOCHS),
            multi_res_training=bool(t.MULTI_RES_TRAINING),
            initial_resolution=tuple(t.INITAL_RESOLUTION),
            final_resolution=tuple(t.FINAL_RESOLUTION),
            curriculum=tuple(t.CURRICULUM or ()),
        )
        if task == "FIT_DECODER":
            kwargs["kld_weighting"] = float(t.KLD_WEIGHTING)
        else:
            kwargs["cosine_similarity_weight"] = float(t.COSINE_SIMILARITY_WEIGHT)
            kwargs["prior_loss_weight"] = float(t.PRIOR_LOSS_WEIGHT)
        if task == "FIT_LATENT":
            kwargs["apply_mask"] = bool(t.APPLY_MASK)
            kwargs["mask_path"] = t.MASK_PATH
        if task == "FIT_INVERSE":
            kwargs["render_resolution"] = int(t.RENDER_RESOLUTION)
            kwargs["object_path"] = t.OBJECT_PATH
            kwargs["kd_value"] = float(t.KD_VALUE)
            kwargs["azimuths"] = tuple(float(a) for a in t.AZIMUTHS)
            kwargs["elevations"] = tuple(float(e) for e in t.ELEVATIONS)
        return cls(**kwargs)

    def effective_curriculum(self) -> tuple[int, ...]:
        """Curriculum epochs; when None/empty, resolution doublings are
        evenly spaced across the epochs (configs/default.py:37 documents
        this fallback; the reference never implemented it)."""
        if self.curriculum:
            return tuple(self.curriculum)
        h0, h1 = self.initial_resolution[0], self.final_resolution[0]
        n = int(round(math.log2(h1 / h0)))
        if n <= 0:
            return ()
        return tuple(self.epochs * (i + 1) // (n + 1) for i in range(n))

    def validate(self):
        """The reference's config asserts (RENI_module.py:360-361)."""
        if self.multi_res_training:
            cur = self.effective_curriculum()
            h0, h1 = self.initial_resolution[0], self.final_resolution[0]
            if cur:
                assert max(cur) < self.epochs
            assert len(cur) >= math.log2(h1 / h0)

    def resolution_stages(self) -> list[tuple[tuple[int, int], int]]:
        """[(resolution, n_epochs)] — doubling at each curriculum epoch
        (callbacks.py:12-29)."""
        if not self.multi_res_training:
            return [(tuple(self.final_resolution), self.epochs)]
        stages = []
        res = tuple(self.initial_resolution)
        prev = 0
        for c in self.effective_curriculum():
            if c > self.epochs:
                break
            stages.append((res, c - prev))
            res = (res[0] * 2, res[1] * 2)
            prev = c
        stages.append((res, self.epochs - prev))
        return [(r, n) for r, n in stages if n > 0]


class TrainState(NamedTuple):
    trainable: Params
    frozen: Params
    opt_state: Any
    key: jax.Array

    @property
    def params(self) -> Params:
        return merge_params(self.trainable, self.frozen)


def init_train_state(model: RENIModel, params: Params, optimizer, key) -> TrainState:
    trainable, frozen = partition_params(params, model.trainable_mask(params))
    return TrainState(trainable, frozen, optimizer.init(trainable), key)


# ---------------------------------------------------------------------------
# batching
# ---------------------------------------------------------------------------


def make_batches(dataset_size: int, batch_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Sequential fixed batches with a zero-masked ragged tail.

    Returns (idx (nb, B) int32, mask (nb, B) f32)."""
    nb = -(-dataset_size // batch_size)
    idx = np.zeros((nb * batch_size,), dtype=np.int32)
    idx[:dataset_size] = np.arange(dataset_size, dtype=np.int32)
    mask = np.zeros((nb * batch_size,), dtype=np.float32)
    mask[:dataset_size] = 1.0
    return idx.reshape(nb, batch_size), mask.reshape(nb, batch_size)


# ---------------------------------------------------------------------------
# step builders
# ---------------------------------------------------------------------------


def make_fit_decoder_step(
    model: RENIModel,
    optimizer,
    directions: jnp.ndarray,
    sineweight: jnp.ndarray,
    *,
    kld_weighting: float,
) -> Callable:
    """One FIT_DECODER update. Batch = (imgs (B, P, 3), idx (B,), bmask (B,)).

    On the Pallas path (TPU.USE_PALLAS, Cond-by-Concat) the whole
    objective's MSE term runs through the single-launch train-step kernel
    (model.fused_train_mse: forward + loss + backward in ONE dispatch —
    the r4 anatomy measured the two-kernel step as purely additive fwd +
    recompute-bwd cost, so fusing removes the standalone forward and half
    the transcendental work); the KLD term stays in XLA (tiny, per-image).
    Loss semantics are identical to the XLA path (same weighted_mse
    reduction, pinned by tests)."""
    cfg = model.config
    z_dims = 3 * cfg.latent_dim

    def step(state: TrainState, batch):
        imgs, idx, bmask = batch
        key, sample_key = jax.random.split(state.key)
        # static-shape trace-time dispatch (shapes fix the path per program)
        reason = model.fused_step_reason(imgs.shape[0], directions.shape[1])
        if reason is None:
            from reni_tpu.models.reni import _mesh_suffix, _note_trunk_path

            _note_trunk_path(
                f"fused Pallas train step{_mesh_suffix()} for "
                f"B={imgs.shape[0]}, npix={directions.shape[1]}"
            )
        sw = sineweight * bmask[:, None, None]

        def loss_fn(trainable):
            params = merge_params(trainable, state.frozen)
            if cfg.is_variational:
                Z, mu, log_var = model.sample_latent(params, idx, sample_key)
                mu = mu * bmask[:, None, None]
                log_var = log_var * bmask[:, None, None]
                if reason is None:
                    mse = model.fused_train_mse(
                        params, Z, directions, imgs, sineweight, bmask
                    )
                    kl = kld_weighting * losses.kld(mu, log_var, z_dims)
                    loss = mse + kl
                else:
                    out = model.apply(params, Z, directions)
                    loss, mse, kl = losses.reni_vad_train_loss(
                        out, imgs, sw, mu, log_var,
                        beta=kld_weighting, z_dims=z_dims,
                    )
                return loss, {"loss": loss, "mse_loss": mse, "kld_loss": kl}
            Z = params["latents"]["Z"][idx]
            if reason is None:
                loss = model.fused_train_mse(
                    params, Z, directions, imgs, sineweight, bmask
                )
            else:
                out = model.apply(params, Z, directions)
                loss = losses.reni_train_loss(out, imgs, sw)
            return loss, {"loss": loss}

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.trainable)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.trainable)
        trainable = jax.tree.map(lambda p, u: p + u, state.trainable, updates)
        return TrainState(trainable, state.frozen, opt_state, key), metrics

    return step


def make_fit_latent_step(
    model: RENIModel,
    optimizer,
    directions: jnp.ndarray,
    sineweight: jnp.ndarray,
    *,
    alpha: float,
    beta: float,
) -> Callable:
    """One FIT_LATENT update (frozen decoder; deterministic mu/Z latents).

    ``sineweight`` should already include the in-painting mask if any
    (RENI_module.py:92-94)."""

    def step(state: TrainState, batch):
        imgs, idx, bmask = batch
        key, _ = jax.random.split(state.key)
        sw = sineweight * bmask[:, None, None]

        def loss_fn(trainable):
            params = merge_params(trainable, state.frozen)
            Z = model.latents(params, idx) * bmask[:, None, None]
            out = model.apply(params, Z, directions)
            loss, mse, prior, cos = losses.reni_test_loss_masked(
                out, imgs, sw, Z, bmask, alpha=alpha, beta=beta
            )
            return loss, {
                "loss": loss,
                "mse_loss": mse,
                "prior_loss": prior,
                "cosine_loss": cos,
            }

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.trainable)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.trainable)
        trainable = jax.tree.map(lambda p, u: p + u, state.trainable, updates)
        return TrainState(trainable, state.frozen, opt_state, key), metrics

    return step


def make_fit_inverse_step(
    model: RENIModel,
    optimizer,
    directions: jnp.ndarray,
    sineweight: jnp.ndarray,
    render_fn: Callable,
    unnormalise: Callable,
    *,
    alpha: float,
    beta: float,
) -> Callable:
    """One FIT_INVERSE update: decode -> unnormalise -> differentiable render
    -> loss vs ground-truth renders (RENI_module.py:107-112, 386-396).

    render_fn: (envmaps (B, P, 3), sineweight (B, P, 3)) -> (B, H, W, 3).
    Batch = (gt_renders (B, H, W, 3), idx (B,), bmask (B,))."""

    def step(state: TrainState, batch):
        gt_renders, idx, bmask = batch
        key, _ = jax.random.split(state.key)
        sw = sineweight * bmask[:, None, None]

        def loss_fn(trainable):
            params = merge_params(trainable, state.frozen)
            Z = model.latents(params, idx) * bmask[:, None, None]
            out = model.apply(params, Z, directions)
            render = render_fn(unnormalise(out), sw)
            loss, mse, prior, cos = losses.reni_test_loss_inverse_masked(
                render, gt_renders, Z, bmask, alpha=alpha, beta=beta
            )
            return loss, {
                "loss": loss,
                "mse_loss": mse,
                "prior_loss": prior,
                "cosine_loss": cos,
            }

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.trainable)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.trainable)
        trainable = jax.tree.map(lambda p, u: p + u, state.trainable, updates)
        return TrainState(trainable, state.frozen, opt_state, key), metrics

    return step


# ---------------------------------------------------------------------------
# stage runner: one compiled program per resolution stage
# ---------------------------------------------------------------------------


def _max_steps_per_program() -> int:
    """Upper bound on optimizer steps executed by a single XLA program.

    A whole-stage scan can run for minutes in one dispatch; some runtimes
    (notably tunneled/preemptible TPU workers) kill very long dispatches.
    Override via RENI_TPU_MAX_SCAN_STEPS; 0 disables the cap."""
    import os

    return int(os.environ.get("RENI_TPU_MAX_SCAN_STEPS", "4096"))


@functools.lru_cache(maxsize=64)
def _jit_step(step_fn: Callable):
    """Memoized single-step jit (the streaming runner's analog of
    _scan_runner): one compile per (step_fn, shapes), not per segment."""
    return jax.jit(step_fn)


_PRINTED: set = set()


def _print_once(msg: str) -> None:
    """Stage runners re-enter once per callback segment; notices about the
    chosen chunking print once per distinct message, not per segment."""
    if msg not in _PRINTED:
        _PRINTED.add(msg)
        print(msg)


def _largest_divisor_leq(n: int, k: int) -> int:
    """Largest divisor of ``n`` that is <= ``k`` (>= 1)."""
    for d in range(min(n, max(1, k)), 0, -1):
        if n % d == 0:
            return d
    return 1


@functools.lru_cache(maxsize=64)
def _chunk_runner(step_fn: Callable, gather: Callable | None = None):
    """Memoized jitted K-step scan for the chunked streaming runner
    (``TPU.STREAM_CHUNK``): one dispatch executes K optimizer steps against
    a staged (K·B, P, 3) super-slice. The slice stays rank-3 with the batch
    rows gathered inside the scan — a rank-4 (K, B, P, 3) transfer would
    hit the (8, 128)-tiled layout that pads the channel axis 3 -> 128, the
    42x HBM blowup documented at :func:`_scan_runner`. On a mesh the slice
    is data-sharded and ``gather`` (``parallel.mesh.chunk_gather``) indexes
    each shard's own block collective-free with shard-local rows."""

    @jax.jit
    def run(state, chunk_imgs, rows, idxs, bms):
        def body(s, xs):
            r, ix, bm = xs
            batch = chunk_imgs[r] if gather is None else gather(chunk_imgs, r)
            return step_fn(s, (batch, ix, bm))

        return jax.lax.scan(body, state, (rows, idxs, bms))

    return run


@functools.lru_cache(maxsize=64)
def _scan_runner(step_fn: Callable):
    """The compiled whole-stage program for a step function: scan(epochs) of
    scan(batches) of step_fn.

    Memoized on the step_fn object — run_stage is re-entered at every
    callback segment (checkpoints/images every N epochs), and a fresh jit
    closure per call meant a full recompile per segment (~20 s per segment
    for the Pallas backward through a tunneled chip; the wall-clock was
    dominated by compiles, not steps). One compile per (step_fn, shapes,
    length) is the intended cost: one per resolution stage.

    Batches are gathered INSIDE the scan (``images[idx]``) rather than
    staged as a pre-gathered (nb, B, P, 3) stack: XLA lays that rank-4
    stack out with (8, 128) tiling over the trailing (P, 3) dims, padding
    the channel axis 3 -> 128 — a 42x HBM blowup that turned 375 MB of
    images into 15.6 GB and OOM'd a 4,000-map dataset on a 16 GB chip.
    The (S, P, 3) source array gets a sane layout, and the per-batch
    gather is free next to the decoder FLOPs."""

    @functools.partial(jax.jit, static_argnames=("length",))
    def run(state, images, idx_b, bmask_b, length):
        def epoch_body(state, _):
            def batch_body(s, b):
                idx, bmask = b
                return step_fn(s, (images[idx], idx, bmask))

            state, ms = jax.lax.scan(batch_body, state, (idx_b, bmask_b))
            return state, jax.tree.map(lambda x: x.mean(), ms)

        return jax.lax.scan(epoch_body, state, None, length=length)

    return run


def run_stage(
    step_fn: Callable,
    state: TrainState,
    images: jnp.ndarray,
    n_epochs: int,
    batch_size: int,
) -> tuple[TrainState, dict]:
    """scan(epochs) of scan(batches) of step_fn — one XLA program (chunked
    so no single dispatch exceeds RENI_TPU_MAX_SCAN_STEPS steps).

    images: (S, P, 3) device array (already normalised, flattened).
    Returns (state, metrics) with metrics values of shape (n_epochs,),
    epoch values being the mean over batches (RENI_module.py:148-163).

    Every input is committed to the default device: jit keys its executable
    cache on per-argument shardings, and a mix of committed/uncommitted
    inputs (staged datasets are device_put, fresh index arrays are not)
    would give each segment call an unpredictable signature — the
    background stage precompiler (train/precompile.py) lowers against this
    deterministic all-committed signature. device_put is a no-copy no-op
    for data already on the device (every re-entry after the first)."""
    dataset_size = images.shape[0]
    idx, bmask = make_batches(dataset_size, batch_size)
    dev = jax.local_devices()[0]
    images = jax.device_put(jnp.asarray(images), dev)
    idx_b = jax.device_put(jnp.asarray(idx), dev)
    bmask_b = jax.device_put(jnp.asarray(bmask), dev)
    state = jax.tree.map(lambda x: jax.device_put(x, dev), state)
    nb = idx_b.shape[0]

    run = _scan_runner(step_fn)

    cap = _max_steps_per_program()
    epochs_per_program = max(1, cap // nb) if cap else n_epochs
    chunks: list[dict] = []
    done = 0
    while done < n_epochs:
        seg = min(epochs_per_program, n_epochs - done)
        # length by KEYWORD: jit keys static args by how they were passed,
        # and the background precompiler lowers with length=<kw> — a
        # positional call here would miss its pre-populated cache entry
        state, metrics = run(state, images, idx_b, bmask_b, length=seg)
        chunks.append(metrics)
        done += seg
    if len(chunks) == 1:
        return state, chunks[0]
    merged = jax.tree.map(lambda *xs: jnp.concatenate(xs), *chunks)
    return state, merged


class _CastRows:
    """ndarray-like view casting rows to a narrower dtype at fetch time
    (``TPU.STREAM_DTYPE: bfloat16``). Streaming through the tunneled chip
    is TRANSFER-bound: host->device bytes stall the dispatch pipeline at
    ~40 ms/MB regardless of overlap (PERF.md r5 stall profile), so halving
    the bytes per sample doubles the streaming throughput ceiling. Wraps
    either a host ndarray or a DiskRowSource (prefetch passes through)."""

    def __init__(self, source, dtype):
        self._src = source
        self.shape = source.shape
        self.dtype = dtype
        pre = getattr(source, "prefetch", None)
        if pre is not None:
            self.prefetch = pre

    def __len__(self):
        return self.shape[0]

    def __getitem__(self, rows):
        return np.asarray(self._src[rows]).astype(self.dtype)


def streaming_stage_runner(
    mesh=None, chunk: int = 1, shard_latents: bool = False,
    stream_dtype=None,
):
    """A drop-in for ``run_stage`` that keeps the dataset on the HOST and
    transfers one batch per optimizer step — for datasets larger than
    device HBM (``TPU.STREAM_DATA``). Double-buffered: the step dispatch
    is asynchronous, so the next batch's host gather + device_put overlap
    the current step's device compute.

    Trades the whole-stage ``lax.scan`` program for one jitted-step
    dispatch per batch (host->device traffic = batch bytes/step; at the
    published workload ~10 MB/step against a ~26 ms step, well under PCIe
    or tunnel bandwidth). Semantics are identical to ``run_stage``: same
    batches, same zero-masked ragged tail, same step_fn — only the
    residency of the image source differs.

    ``chunk`` (``TPU.STREAM_CHUNK``) > 1 amortises per-dispatch latency —
    the dominant cost on tunneled/remote chips, where each dispatch pays an
    RTT: each transfer stages a K-batch (K·B, P, 3) super-slice and ONE
    compiled ``lax.scan`` runs K optimizer steps against it, at the cost of
    K batches of HBM instead of 1 (per device: K LOCAL batches — on a mesh
    the slice is data-sharded and each shard gathers its own block
    collective-free, ``parallel.mesh.chunk_gather``). K is rounded down to
    the largest divisor of the per-epoch batch count (and clamped by
    RENI_TPU_MAX_SCAN_STEPS, the per-dispatch step cap crash-resume relies
    on) so chunks stay epoch-aligned and a single compiled program serves
    every dispatch. Step order, masking and metrics are identical to the
    unchunked path.

    With ``mesh``, state and batches are placed with the same
    NamedShardings the resident sharded runner uses, and the fused kernel
    dispatches through its shard_map. Multi-process (a jax.distributed
    pod): every process holds the same host dataset (DDP semantics, like
    the resident staging) and contributes only its addressable shard of
    each batch/super-slice via ``put_sharded`` — per-host transfer is the
    host's own rows, exactly how a pod feeds data in production."""
    if mesh is None and jax.process_count() > 1:
        raise NotImplementedError(
            "multi-process TPU.STREAM_DATA needs the global mesh (the CLI "
            "always passes one on a jax.distributed cluster)"
        )

    def run(step_fn, state, images, n_epochs, batch_size):
        # host-resident source of truth: an ndarray, or an out-of-core
        # row source (data.datasets.DiskRowSource — decodes rows from disk
        # on demand; `prefetch` marks it and pipelines the decode)
        if getattr(images, "prefetch", None) is None:
            images = np.asarray(images)
        if stream_dtype is not None and images.dtype != stream_dtype:
            # narrow the TRANSFER dtype only (targets quantize; the step's
            # loss math stays f32 after promotion) — the tunnel ingest is
            # the streaming bottleneck and scales with bytes
            images = _CastRows(images, stream_dtype)
        pre = getattr(images, "prefetch", None)
        if pre is None:
            pre = lambda rows: None
        dataset_size = images.shape[0]
        if mesh is not None:
            from reni_tpu.parallel.mesh import (
                batch_local_positions,
                batch_sharding,
                chunk_gather,
                kernel_mesh,
                pad_batch_to,
                pixel_axis_or_none,
                put_rows,
                put_sharded,
                state_sharding,
                stream_chunk_layout,
                stream_chunk_shardings,
            )

            batch_size = pad_batch_to(batch_size, mesh.shape["data"])
            # npix routes the non-divisible-pixel-axis fallback through the
            # same policy the resident shard_stage_data uses
            batch_sh, vec_sh, _ = batch_sharding(mesh, npix=images.shape[1])
            chunk_sh, mat_sh = stream_chunk_shardings(mesh, images.shape[1])
            # row-sharded latent tables (TPU.SHARD_LATENTS): the identical
            # pad -> shard -> (train) -> unpad protocol the resident
            # sharded_stage_runner applies — only image residency differs
            pad_sizes = {}
            if shard_latents:
                from reni_tpu.parallel.mesh import pad_latent_rows

                state, pad_sizes = pad_latent_rows(state, mesh.shape["data"])
            state = jax.tree.map(
                put_sharded, state, state_sharding(mesh, state, shard_latents)
            )
            if shard_latents:
                from reni_tpu.parallel.mesh import unpad_latent_rows

                unpad = lambda st: unpad_latent_rows(st, pad_sizes)
            else:
                unpad = lambda st: st
            # put_rows stages source[rows] per addressable shard: on a
            # jax.distributed cluster each process gathers (and, for an
            # out-of-core source, DECODES) only its own rows of each batch
            put_vec = lambda v: put_sharded(v, vec_sh)
            put_mat = lambda x: put_sharded(x, mat_sh)
            fetch_batch = lambda rows: put_rows(images, rows, batch_sh)
            fetch_chunk = lambda rows: put_rows(images, rows, chunk_sh)
            local_of = lambda sh, n: batch_local_positions(
                sh, (n,) + tuple(images.shape[1:])
            )
            # built lazily: only the chunked (K > 1) path uses the gather
            make_gather = lambda: chunk_gather(
                mesh, pixel_axis_or_none(mesh, images.shape[1])
            )
            layout = lambda idx_chunk: stream_chunk_layout(mesh, idx_chunk)
            kmesh = lambda: kernel_mesh(mesh)
        else:
            import contextlib

            put_vec = jax.device_put
            put_mat = jax.device_put
            fetch_batch = lambda rows: jax.device_put(images[rows])
            fetch_chunk = fetch_batch
            local_of = lambda sh, n: None
            batch_sh = chunk_sh = None
            make_gather = lambda: None
            layout = lambda idx_chunk: (
                idx_chunk.reshape(-1),
                np.arange(idx_chunk.size).reshape(idx_chunk.shape),
            )
            kmesh = contextlib.nullcontext
            unpad = lambda st: st

        idx, bmask = make_batches(dataset_size, batch_size)
        idx = np.asarray(idx)
        bmask = np.asarray(bmask)
        nb = idx.shape[0]

        # clamp by the per-dispatch step cap the crash-resume strategy
        # relies on (RENI_TPU_MAX_SCAN_STEPS; run_stage honours the same)
        cap = _max_steps_per_program()
        eff_chunk = min(chunk, cap) if cap else chunk
        K = _largest_divisor_leq(nb, eff_chunk) if nb > 1 else 1
        if chunk > 1 and K == 1 and nb > 1:
            _print_once(
                f"[reni_tpu] TPU.STREAM_CHUNK={chunk}: no divisor of the "
                f"{nb} batches/epoch in range — unchunked streaming "
                "(one dispatch per optimizer step)"
            )
        if K > 1:
            if K != chunk:
                why = f"largest divisor of the {nb} batches/epoch"
                if cap and eff_chunk < chunk:
                    why += f" within RENI_TPU_MAX_SCAN_STEPS={cap}"
                _print_once(
                    f"[reni_tpu] TPU.STREAM_CHUNK={chunk}: using {K} "
                    f"({why} — epoch-aligned chunks, one compiled program)"
                )
            n_chunks = nb // K
            # per-chunk constants: scan xs (shard-local rows into the
            # staged slice, global dataset idx for the latent rows,
            # ragged-tail masks); perms order each staged slice so a data
            # shard's block holds exactly its own rows (collective-free).
            # `rows` depends only on (K, B, n_data) — identical for every
            # chunk — so it is computed once from the first chunk's layout
            perms = [
                layout(idx[c * K : (c + 1) * K])[0] for c in range(n_chunks)
            ]
            rows_d = put_mat(layout(idx[:K])[1])
            idx_ch = [put_mat(idx[c * K : (c + 1) * K]) for c in range(n_chunks)]
            bm_ch = [put_mat(bmask[c * K : (c + 1) * K]) for c in range(n_chunks)]
            jrun = _chunk_runner(step_fn, make_gather())
            epoch_metrics = []
            # prefetch only this host's rows of each super-slice
            loc_c = local_of(chunk_sh, K * batch_size)
            pre_c = pre if loc_c is None else (
                lambda rows: pre(np.asarray(rows)[loc_c])
            )
            pre_c(perms[0])
            buf = fetch_chunk(perms[0])
            if n_chunks > 1:
                pre_c(perms[1])
            with kmesh():
                for e in range(n_epochs):
                    ms = []
                    for c in range(n_chunks):
                        state, m = jrun(state, buf, rows_d, idx_ch[c], bm_ch[c])
                        if n_chunks > 1 and not (
                            e == n_epochs - 1 and c == n_chunks - 1
                        ):
                            # the scan dispatch above is in flight; this
                            # host gather + transfer overlaps it (and the
                            # decode of the chunk after next starts in the
                            # background on an out-of-core source). A single
                            # chunk (K == nb) stays staged across epochs.
                            pre_c(perms[(c + 2) % n_chunks])
                            buf = fetch_chunk(perms[(c + 1) % n_chunks])
                        ms.append(m)  # leaves: (K,) per-step metrics
                    epoch_metrics.append(
                        jax.tree.map(lambda *xs: jnp.concatenate(xs).mean(), *ms)
                    )
            metrics = jax.tree.map(lambda *xs: jnp.stack(xs), *epoch_metrics)
            return unpad(state), metrics
        # per-batch index/mask vectors are tiny: stage them all once
        idx_d = [put_vec(idx[i]) for i in range(nb)]
        bmask_d = [put_vec(np.asarray(bmask[i])) for i in range(nb)]

        # memoized like _scan_runner: run() re-enters every callback
        # segment, and a fresh jit wrapper per segment would recompile
        jstep = _jit_step(step_fn)
        epoch_metrics = []
        # prefetch only this host's rows of each batch
        loc_b = local_of(batch_sh, batch_size)
        pre_b = pre if loc_b is None else (
            lambda rows: pre(np.asarray(rows)[loc_b])
        )
        pre_b(idx[0])
        buf = fetch_batch(idx[0])
        if nb > 1:
            pre_b(idx[1])
        with kmesh():
            for e in range(n_epochs):
                ms = []
                for b in range(nb):
                    state, m = jstep(state, (buf, idx_d[b], bmask_d[b]))
                    if nb > 1 and not (e == n_epochs - 1 and b == nb - 1):
                        # async dispatch above is already in flight; this
                        # gather+transfer overlaps the device step (an
                        # out-of-core source also starts decoding batch
                        # b+2 in the background). nb == 1 reuses the
                        # single (unchanging) staged batch.
                        pre_b(idx[(b + 2) % nb])
                        buf = fetch_batch(idx[(b + 1) % nb])
                    ms.append(m)
                epoch_metrics.append(
                    jax.tree.map(lambda *xs: jnp.stack(xs).mean(), *ms)
                )
        metrics = jax.tree.map(lambda *xs: jnp.stack(xs), *epoch_metrics)
        return unpad(state), metrics

    return run


def fit_task(
    model: RENIModel,
    params: Params,
    task_cfg: TaskConfig,
    images_at: Callable[[tuple[int, int]], jnp.ndarray],
    key,
    *,
    mask_path: str | None = None,
    step_builder: Callable | None = None,
    on_stage_end: Callable | None = None,
    mesh=None,
    callback_every: int | None = None,
    callback: Callable | None = None,
    start_epoch: int = 0,
    initial_opt_state=None,
    reaugment: bool = False,
    shard_latents: bool = False,
    stream: bool = False,
    stream_chunk: int = 1,
    stream_dtype=None,
    precompile: bool = False,
) -> tuple[Params, dict]:
    """Run a full task with its multi-resolution curriculum.

    images_at(res) -> (S, H*W, 3) normalised images at that resolution.
    With ``reaugment``, images are re-staged every epoch via
    images_at(res, epoch) — the reference's per-__getitem__ random
    augmentation semantics (datasets.py:67-74), at the cost of one dispatch
    per epoch instead of one whole-stage scan.
    With ``mesh`` (a ('data', 'pixel') jax.sharding.Mesh) the stage runs
    data/pixel-sharded via GSPMD; batch size is rounded up to the data-axis
    size (padded rows are zero-masked, so this is exact).

    ``callback(state, epoch, metrics_chunk, res)`` fires every
    ``callback_every`` epochs (and at stage ends) — the hook for periodic
    checkpointing / example-image logging; the scan is segmented at callback
    boundaries (same compiled program re-executed).

    Mid-task resume: pass ``start_epoch`` (a completed epoch count) and the
    ``initial_opt_state`` saved with it — epochs before start_epoch are
    skipped and the restored adam step count keeps the LR schedule exact.

    ``precompile`` compiles LATER stages' whole-stage programs in
    background threads while the current stage trains (train/precompile.py)
    — chains on tunneled chips are compile-dominated (PERF.md). Resident
    (non-mesh, non-stream, non-reaugment) path only; a background failure
    falls back to the ordinary inline compile.

    Returns (params, metrics dict with (epochs,) arrays, reference-style
    keys ``{task}_{name}``)."""
    task_cfg.validate()
    batch_size = task_cfg.batch_size
    stage_runner = run_stage
    if stream:
        # host-resident dataset, one (double-buffered) batch transfer per
        # step — for datasets larger than HBM. Pass images_at returning
        # host arrays (dataset.images_host_at) to avoid a device staging.
        # stream_chunk > 1 scans K batches per dispatch (TPU.STREAM_CHUNK);
        # shard_latents row-shards the latent tables like the resident path.
        stage_runner = streaming_stage_runner(
            mesh, chunk=stream_chunk, shard_latents=shard_latents,
            stream_dtype=stream_dtype,
        )
        if mesh is not None:
            from reni_tpu.parallel.mesh import pad_batch_to

            batch_size = pad_batch_to(batch_size, mesh.shape["data"])
    elif mesh is not None:
        from reni_tpu.parallel.mesh import pad_batch_to, sharded_stage_runner

        batch_size = pad_batch_to(batch_size, mesh.shape["data"])
        # shard_latents: embedding-style row-sharded latent tables over the
        # data axis (huge-dataset memory; see parallel/mesh.py)
        stage_runner = sharded_stage_runner(mesh, shard_latents=shard_latents)

    optim_cfg = task_cfg.optim
    n_images = images_at(tuple(task_cfg.resolution_stages()[0][0])).shape[0]
    steps_per_epoch = -(-n_images // batch_size)
    optim_cfg = dataclasses.replace(
        optim_cfg, epochs=task_cfg.epochs, steps_per_epoch=steps_per_epoch
    )
    optimizer = build_optimizer(optim_cfg)
    state = init_train_state(model, params, optimizer, key)
    if initial_opt_state is not None:
        # either a ready pytree, or a loader called with the fresh state as
        # the structure template (optax states are NamedTuples)
        restored = (
            initial_opt_state(state.opt_state)
            if callable(initial_opt_state)
            else initial_opt_state
        )
        if restored is not None:
            state = state._replace(opt_state=restored)

    def _make_step(res: tuple[int, int]):
        width = res[1]
        directions = sphere.get_directions(width)
        sineweight = sphere.get_sineweight(width)
        if task_cfg.apply_mask and mask_path:
            sineweight = sineweight * sphere.get_mask(width, mask_path)
        if step_builder is not None:
            return step_builder(model, optimizer, directions, sineweight, res)
        if task_cfg.task == "FIT_DECODER":
            return make_fit_decoder_step(
                model,
                optimizer,
                directions,
                sineweight,
                kld_weighting=task_cfg.kld_weighting,
            )
        if task_cfg.task == "FIT_LATENT":
            return make_fit_latent_step(
                model,
                optimizer,
                directions,
                sineweight,
                alpha=task_cfg.prior_loss_weight,
                beta=task_cfg.cosine_similarity_weight,
            )
        raise ValueError(
            f"task {task_cfg.task}: provide step_builder (FIT_INVERSE is "
            "built by reni_tpu.render.inverse)"
        )

    # one step fn per resolution, shared between the training loop and the
    # background precompiler — _scan_runner keys the compiled whole-stage
    # program on the step-fn object
    _step_fns: dict = {}

    def stage_step_fn(res):
        res = tuple(res)
        if res not in _step_fns:
            _step_fns[res] = _make_step(res)
        return _step_fns[res]

    # (res, epochs to run, completed epochs before the stage) after the
    # resume skip — the precompiler needs the remaining stages up front
    plan: list[tuple[tuple[int, int], int, int]] = []
    off = 0
    for res, n in task_cfg.resolution_stages():
        skip = min(max(0, start_epoch - off), n)
        plan.append((tuple(res), n - skip, off + skip))
        off += n

    precompiler = None
    if precompile and stage_runner is run_stage and not reaugment:
        from reni_tpu.train.precompile import Precompiler

        precompiler = Precompiler()

    all_metrics: list[dict] = []
    for stage_i, (res, n_epochs, epoch_offset) in enumerate(plan):
        if n_epochs <= 0:  # stage fully done before start_epoch
            continue
        step_fn = stage_step_fn(res)

        stop = False
        if reaugment:
            done = 0
            while done < n_epochs:
                images = images_at(res, epoch_offset + done)
                state, metrics = stage_runner(step_fn, state, images, 1, batch_size)
                done += 1
                all_metrics.append(metrics)
                at_boundary = callback_every and (
                    done % callback_every == 0 or done == n_epochs
                )
                if callback is not None and at_boundary:
                    stop = bool(callback(state, epoch_offset + done, metrics, res))
                    if stop:
                        break
            if on_stage_end is not None:
                on_stage_end(state, res)
            if stop:
                break
            continue
        images = images_at(res)
        if precompiler is not None:
            from reni_tpu.train.precompile import launch_stage_precompiles

            later = [(r, n) for r, n, _ in plan[stage_i + 1 :] if n > 0]
            if later:
                launch_stage_precompiles(
                    precompiler,
                    state=state,
                    dataset_size=images.shape[0],
                    img_dtype=images.dtype,
                    stages=later,
                    step_fn_of=stage_step_fn,
                    batch_size=batch_size,
                    callback_every=callback_every if callback is not None else None,
                )
            precompiler = None
        if callback is None or not callback_every:
            state, metrics = stage_runner(
                step_fn, state, images, n_epochs, batch_size
            )
            all_metrics.append(metrics)
        else:
            # wall-adaptive segmentation (RENI_TPU_CKPT_WALL_S, 0 = off):
            # cap each segment so callbacks (checkpoints, yield checks)
            # fire at least every ~target seconds of wall clock, however
            # slow the epochs are — a wedged worker then re-loses bounded
            # wall time, not EVERY_N_EPOCHS of arbitrarily long epochs
            # (VERDICT r4 #7). Segment lengths quantize to powers of two
            # so the resident whole-stage scan compiles a bounded set of
            # static lengths; multi-host runs adopt host 0's choice (every
            # process must dispatch identical programs).
            import os as _os
            import time as _time

            wall_target = float(
                _os.environ.get("RENI_TPU_CKPT_WALL_S", "0") or 0
            )
            done = 0
            # with a wall target, the FIRST segment of a stage is the
            # vulnerable window (epoch speed unknown yet — a 64x128 ->
            # 256x512 curriculum jump can be 16x slower): start at 1
            # epoch to measure, then adapt up
            seg = 1 if wall_target else min(callback_every, n_epochs)
            while done < n_epochs:
                seg = min(seg, n_epochs - done)
                t0 = _time.monotonic()
                state, metrics = stage_runner(
                    step_fn, state, images, seg, batch_size
                )
                done += seg
                all_metrics.append(metrics)
                # a truthy return requests early stop (e.g. MAX_RUNTIME);
                # the callback also forces device sync (reads metrics), so
                # the wall measurement below covers the segment's compute
                stop = bool(callback(state, epoch_offset + done, metrics, res))
                if wall_target and done < n_epochs:
                    dt = _time.monotonic() - t0
                    ideal = max(1, int(wall_target / max(dt / seg, 1e-9)))
                    q = 1
                    while q * 2 <= ideal:
                        q *= 2
                    seg = min(callback_every, q)
                    if jax.process_count() > 1:
                        from reni_tpu.parallel import multihost

                        seg = int(multihost.agree_on_str(str(seg)))
                if stop:
                    break
        if on_stage_end is not None:
            on_stage_end(state, res)
        if stop:
            break

    if not all_metrics:
        raise ValueError(
            f"nothing to train: start_epoch={start_epoch} >= "
            f"epochs={task_cfg.epochs} (the resume checkpoint already "
            "completed this task — raise EPOCHS to continue it)"
        )
    merged = {
        f"{task_cfg.task.lower()}_{k}": np.concatenate(
            [np.asarray(m[k]) for m in all_metrics]
        )
        for k in all_metrics[0]
    }
    return state.params, merged
