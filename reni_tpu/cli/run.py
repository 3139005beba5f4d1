"""Config-driven multi-task trainer — the reference's run.py as a CLI.

Usage:
    python -m reni_tpu.cli.run --cfg_path configs/experiment.yaml
    python -m reni_tpu.cli.run --cfg_path ... --mesh 4x2    # data x pixel
    python -m reni_tpu.cli.run --cfg_path ... --mesh 2x2x2  # + model (TP)

Behavioural parity with reference run.py:29-138:
- auto experiment naming from hyperparameters (run.py:43-49);
- seeding (run.py:61);
- task-order assert: FIT_DECODER must come first unless a checkpoint is
  given (run.py:65-67);
- per-task checkpoints every N epochs, keeping the best 2 by
  ``{task}_loss`` (run.py:79-84);
- the best FIT_DECODER checkpoint chains into the following tasks
  (run.py:112-113);
- FIT_DECODER trains on the Train/ split, other tasks on Test/
  (RENI_module.py:278-280).

TPU differences: the trainer is jit-scanned (no Lightning), distribution is
a --mesh flag (data x pixel x model axes) instead of DDP process spawning, and
metrics stream to JSONL + TensorBoard.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from reni_tpu.data.datasets import get_dataset
from reni_tpu.models.reni import RENIConfig, RENIModel
from reni_tpu.train import checkpoint as ckpt
from reni_tpu.train import tasks
from reni_tpu.train.logging_utils import MetricLogger
from reni_tpu.train.visualize import example_images
from reni_tpu.utils.config import experiment_name, get_cfg_defaults


# -- hang watchdog -----------------------------------------------------------
#
# The tunneled TPU worker can wedge SILENTLY (a dispatch RPC that never
# returns), which --retries cannot catch: the blocked PJRT call never
# raises, signals are not delivered to a thread stuck in C, and a client
# whose RPC thread is wedged cannot be trusted to retry in-process. The
# honest recovery is process-level: a daemon thread watches the trainer's
# per-segment progress and, when RENI_TPU_HANG_EXIT_S seconds pass with
# none, prints a diagnostic and hard-exits with code 114 — an external
# loop (``until python -m reni_tpu.cli.run ... --retries N; do :; done``
# or any supervisor) reruns, and the run resumes from the newest periodic
# checkpoint exactly like a crash would. Disabled unless the env var is
# set. (Observed round 3: a run stalled 28+ minutes mid-epoch with the
# process asleep in a poll loop and zero CPU accumulation.)

_PROGRESS = {"ts": time.time(), "what": "startup"}

# fault-history events appended to the run's metrics.jsonl (host 0 only):
# retries, relaunch adoptions, hang exits, chip yields — so a chain's own
# log reports how many faults it survived and where (VERDICT r4 #7). The
# path is registered once main() knows the run dir; events before that
# (or on non-primary hosts) are dropped.
_EVENT_LOG = {"path": None}


def _log_event(event: str, **fields) -> None:
    path = _EVENT_LOG["path"]
    if not path:
        return
    import json as _json
    from datetime import datetime, timezone

    rec = {"event": event,
           "time": datetime.now(timezone.utc).isoformat(timespec="seconds")}
    rec.update(fields)
    try:
        with open(path, "a") as f:
            f.write(_json.dumps(rec) + "\n")
    except OSError:
        pass  # fault logging must never take the trainer down


def _note_progress(what: str) -> None:
    _PROGRESS["ts"] = time.time()
    _PROGRESS["what"] = what


def _arm_hang_watchdog() -> None:
    hang_s = float(os.environ.get("RENI_TPU_HANG_EXIT_S", "0") or 0)
    if hang_s <= 0:
        return
    import sys
    import threading

    def watch():
        while True:
            time.sleep(min(hang_s / 4, 60.0))
            idle = time.time() - _PROGRESS["ts"]
            if idle > hang_s:
                _log_event(
                    "hang_exit", idle_s=round(idle), last=_PROGRESS["what"]
                )
                print(
                    f"[reni_tpu] HANG: no trainer progress for {idle:.0f}s "
                    f"(> RENI_TPU_HANG_EXIT_S={hang_s:.0f}); last progress: "
                    f"{_PROGRESS['what']!r}. The TPU dispatch is presumed "
                    "wedged — exiting 114; rerun (or let a supervisor rerun) "
                    "with --retries/--resume to continue from the newest "
                    "checkpoint.",
                    file=sys.stderr,
                    flush=True,
                )
                os._exit(114)

    threading.Thread(target=watch, daemon=True, name="hang-watchdog").start()


def _deadline_reached(deadline: float | None) -> bool:
    """TRAINER.MAX_RUNTIME check, COLLECTIVE across processes: host 0's
    clock decides, so either every host stops after this segment or none
    does — a host breaking out alone leaves the rest blocked in training
    psums / fetch_tree allgathers (advisor round 2). Every process calls
    this at the same loop points (the per-segment callbacks and the task
    loop), so the broadcast is matched."""
    if deadline is None:
        return False
    from reni_tpu.parallel import multihost

    return multihost.agree_on_flag(time.time() > deadline)


def _yield_requested(stop_file: str | None) -> bool:
    """Chip-preemption check (`utils/chiplock.py`): a preemptor (bench.py)
    asked the trainer to release the shared chip. COLLECTIVE like
    `_deadline_reached` — and called UNCONDITIONALLY so every host joins
    the broadcast even when its own env leaves stop_file unset (a per-host
    RENI_TPU_STOP_FILE asymmetry must not mispair collectives); host 0's
    verdict decides for everyone."""
    from reni_tpu.parallel import multihost

    return multihost.agree_on_flag(
        bool(stop_file) and os.path.exists(stop_file)
    )


class _BestTracker:
    """save_top_k=2 checkpointing by monitored loss (run.py:79-84), plus a
    ``{task}_latest`` checkpoint overwritten every periodic save — the
    analog of Lightning's ``last.ckpt``, kept independently of best-K so
    crash-resume never loses more than EVERY_N_EPOCHS epochs on a
    non-monotonic loss curve."""

    def __init__(self, save_dir: str, task: str, model_config, keep: int = 2,
                 write: bool = True):
        """write=False keeps the (deterministic) best-K bookkeeping but
        performs no file I/O — non-primary processes of a multi-host job
        track the same paths so task chaining agrees, while only host 0
        writes (metrics are replicated, so the loss sequence is identical
        on every process)."""
        self.save_dir = save_dir
        self.task = task
        self.model_config = model_config
        self.keep = keep
        self.write = write
        self.saved: list[tuple[float, str]] = []

    def maybe_save(self, params, epoch: int, loss: float, opt_state=None,
                   rng_key=None):
        path = os.path.join(
            self.save_dir, f"{self.task.lower()}_epoch={epoch:04d}"
        )
        # the fetch is SYMMETRIC: with cross-process-sharded state
        # (TPU.SHARD_LATENTS / model-axis TP on a pod) it is an allgather
        # collective every process must join; only the file write below is
        # host-0-only
        params = ckpt.fetch_tree(params)
        if opt_state is not None:
            opt_state = ckpt.fetch_tree(opt_state)
        if self.write:
            ckpt.save_checkpoint(
                path,
                params,
                model_config=self.model_config,
                metadata={"task": self.task, "epoch": epoch, "loss": float(loss)},
                opt_state=opt_state,
                rng_key=rng_key,
            )
            import shutil

            latest = os.path.join(self.save_dir, f"{self.task.lower()}_latest")
            shutil.copyfile(path + ".npz", latest + ".npz")
            shutil.copyfile(path + ".json", latest + ".json")
        self.saved.append((float(loss), path))
        self.saved.sort(key=lambda t: t[0])
        while len(self.saved) > self.keep:
            _, worst = self.saved.pop()
            if self.write:
                for ext in (".npz", ".json"):
                    try:
                        os.remove(worst + ext)
                    except OSError:
                        pass

    @property
    def best_path(self) -> str | None:
        return self.saved[0][1] if self.saved else None


def run_task(
    config,
    task: str,
    dataset,
    logger: MetricLogger,
    chkpt_path: str | None,
    mesh=None,
    deadline: float | None = None,
    resume_path: str | None = None,
    primary: bool = True,
):
    _note_progress(f"{task} setup")
    model_cfg = RENIConfig.from_reni_cfg(
        config.RENI, task, tpu_cfg=config.get("TPU")
    )
    if mesh is not None and mesh.shape.get("model", 1) > 1 and model_cfg.use_pallas:
        # tensor parallelism shards the trunk weights GSPMD cannot push
        # through an opaque pallas_call — TP training takes the XLA path
        model_cfg = dataclasses.replace(model_cfg, use_pallas=False)
    model = RENIModel(model_cfg)
    key = jax.random.PRNGKey(int(config.TRAINER.SEED))
    k_init, k_fit, k_img = jax.random.split(key, 3)

    start_epoch, initial_opt_state = 0, None
    if resume_path is not None:
        # mid-task resume: full params + optimizer state + completed epochs
        params, meta = ckpt.load_checkpoint(resume_path)
        start_epoch = int(meta.get("epoch", 0))
        restored_key = ckpt.load_rng_key(resume_path)
        if restored_key is not None:
            k_fit = restored_key
    elif chkpt_path is not None:
        params = ckpt.load_decoder_only(chkpt_path, model, len(dataset), k_init)
    else:
        params = model.init(k_init, len(dataset))

    task_cfg = tasks.TaskConfig.from_config(config, task)

    # learning-rate logging (reference run.py:86 LearningRateMonitor): the
    # schedule is a pure function of the epoch — decay is per-epoch
    # (staircase over steps_per_epoch). optax counts from 0, and the
    # callback's `epoch` is the 1-based completed count, so epoch e
    # trained at schedule(e - 1)
    from reni_tpu.train.optim import build_schedule

    lr_schedule = build_schedule(
        dataclasses.replace(
            task_cfg.optim, epochs=task_cfg.epochs, steps_per_epoch=1
        )
    )

    if primary and bool(config.TRAINER.LOGGER.TB.get("LOG_GRAPH", False)):
        _dump_model_graph(model, params, logger.log_dir, task)

    # chip preemption: honored at segment boundaries via the callbacks
    # below (force-checkpoint, then exit 115 so a supervisor loop resumes
    # once the preemptor releases the chip lock)
    from reni_tpu.utils import chiplock

    stop_file = chiplock.trainer_stop_path()

    save_dir = os.path.join(logger.log_dir, config.TRAINER.CHKPTS.SAVE_DIR)
    tracker = _BestTracker(save_dir, task, model_cfg, write=primary)
    every = int(config.TRAINER.CHKPTS.EVERY_N_EPOCHS)
    # image logging under multi-process: every process joins a symmetric
    # fetch_tree (a collective when the state is cross-process sharded),
    # then host 0 alone renders and logs the grid from the fetched
    # host-local params (reference callbacks.py:128-139 logs from rank 0).
    # The gate is config-derived — identical on every process — because
    # cb_every controls the jit-scan segmentation and all processes must
    # dispatch identical programs.
    log_images = bool(config.TRAINER.LOGGER.LOG_IMAGES)
    img_every = int(config.TRAINER.LOGGER.EPOCHS_BETWEEN_EXAMPLES)
    cb_every = min(every, img_every) if log_images else every

    is_hdr = bool(config.DATASET[config.DATASET.NAME].IS_HDR)
    shard_latents = mesh is not None and bool(
        config.TPU.get("SHARD_LATENTS", False)
    )
    # TPU.STREAM_DATA: host-resident dataset, one double-buffered batch
    # transfer per step (datasets larger than HBM). Multi-host: every
    # process loads the same dataset (DDP semantics) and transfers only its
    # addressable shard of each batch; FIT_INVERSE ignores the flag below.
    # TPU.STREAM_FROM_DISK additionally keeps the dataset on DISK (lazy
    # decode + prefetch, datasets larger than host RAM) and implies
    # STREAM_DATA.
    stream_disk = bool(config.TPU.get("STREAM_FROM_DISK", False))
    stream = bool(config.TPU.get("STREAM_DATA", False)) or stream_disk
    # TPU.STREAM_CHUNK: K optimizer steps per dispatch against a K-batch
    # staged super-slice (amortises per-dispatch latency on tunneled chips)
    stream_chunk = int(config.TPU.get("STREAM_CHUNK", 1))
    if stream_chunk < 1:
        raise SystemExit(f"TPU.STREAM_CHUNK must be >= 1, got {stream_chunk}")
    # TPU.STREAM_DTYPE: bfloat16 halves the transfer bytes of the
    # streaming tiers (the tunnel-ingest bottleneck; PERF.md r5)
    _sd = str(config.TPU.get("STREAM_DTYPE", "float32")).lower()
    if _sd not in ("float32", "bfloat16"):
        raise SystemExit(
            f"TPU.STREAM_DTYPE must be float32 or bfloat16, got {_sd!r}"
        )
    stream_dtype = jnp.bfloat16 if _sd == "bfloat16" else None
    if stream_dtype is not None and not stream and primary:
        print("[reni_tpu] TPU.STREAM_DTYPE ignored without TPU.STREAM_DATA")
    if stream_chunk > 1 and not stream and primary:
        print("[reni_tpu] TPU.STREAM_CHUNK ignored without TPU.STREAM_DATA")
    # TPU.PRECOMPILE: compile later curriculum stages in the background
    # while the current stage trains (tunneled-chip chains are
    # compile-dominated, PERF.md); resident single-program path only
    precompile = bool(config.TPU.get("PRECOMPILE", False))
    if precompile and (mesh is not None or stream) and primary:
        print(
            "[reni_tpu] TPU.PRECOMPILE ignored (mesh/STREAM_DATA run — "
            "background precompile covers the resident path only)"
        )
    if precompile and mesh is None and not stream and primary:
        print("[reni_tpu] TPU.PRECOMPILE: later stages compile in background")
    # streaming keeps even the staging source on the host; image grids index
    # a handful of rows out of it, so host arrays serve them fine too.
    # STREAM_FROM_DISK goes further: the ndarray-like row source decodes
    # exactly the rows asked for (grids decode a handful of files; training
    # decodes per batch, prefetched)
    if stream_disk:
        stage_images_at = lambda res, epoch=None: dataset.row_source_at(res)
    elif stream:
        stage_images_at = dataset.images_host_at
    else:
        stage_images_at = dataset.images_at

    # wedge-survival checkpoint cadence (VERDICT r4 #7): beyond the
    # every-N-epochs schedule, force a save (a) at each curriculum stage
    # end — a wedge during the next stage's long Mosaic compile must not
    # re-lose the finished stage — and (b) whenever RENI_TPU_CKPT_WALL_S
    # seconds of wall clock passed since the last save (0/unset = off; the
    # chip queues set it). The wall decision is host-0's (collective), so
    # multi-host fetch_tree collectives stay paired.
    wall_save_s = float(os.environ.get("RENI_TPU_CKPT_WALL_S", "0") or 0)
    last_save_t = [time.monotonic()]
    stage_ends, _off = set(), 0
    for _r, _n in task_cfg.resolution_stages():
        _off += _n
        stage_ends.add(_off)

    def _save_due(epoch: int) -> bool:
        from reni_tpu.parallel import multihost

        due = (
            epoch % every == 0
            or epoch in stage_ends
            or (
                wall_save_s > 0
                and time.monotonic() - last_save_t[0] > wall_save_s
            )
        )
        # epoch-based terms are config-deterministic; the wall term is not
        return multihost.agree_on_flag(due)

    # RENI_TPU_RSS_EXIT_GB: the tunneled transport client retains the host
    # bytes of EVERY host->device transfer (measured r5: RSS grows at
    # exactly the streamed-bytes rate; the r4 beyond-HBM run reached
    # 115 GB this way). The data layer is bounded (DiskRowSource LRU,
    # pinned by test), so the honest mitigation for the client leak is a
    # planned restart: checkpoint, exit 114, let the relaunch loop resume
    # with a fresh process. 0/unset = off.
    rss_exit_gb = float(os.environ.get("RENI_TPU_RSS_EXIT_GB", "0") or 0)

    def _rss_gb() -> float:
        try:
            pages = int(open("/proc/self/statm").read().split()[1])
            return pages * os.sysconf("SC_PAGE_SIZE") / 1e9
        except OSError:
            return 0.0

    def _rss_restart_due() -> bool:
        from reni_tpu.parallel import multihost

        return multihost.agree_on_flag(
            rss_exit_gb > 0 and _rss_gb() > rss_exit_gb
        )

    def callback(state_now, epoch, metrics_chunk, res):
        params_now = state_now.params
        loss = float(np.asarray(metrics_chunk["loss"])[-1])
        _note_progress(f"{task} epoch {epoch} @ {res}")
        logged = {
            f"{task.lower()}_{k}": float(np.asarray(v)[-1])
            for k, v in metrics_chunk.items()
        }
        logged[f"{task.lower()}_lr"] = float(lr_schedule(epoch - 1))
        logger.log_scalars(epoch, logged)
        saved_here = False
        if config.TRAINER.CHKPTS.SAVE and _save_due(epoch):
            tracker.maybe_save(
                params_now, epoch, loss,
                opt_state=state_now.opt_state, rng_key=state_now.key,
            )
            last_save_t[0] = time.monotonic()
            saved_here = True
        if _deadline_reached(deadline):
            # TRAINER.MAX_RUNTIME exceeded: stop cleanly after this segment
            # (the reference declares this knob but never reads it)
            return True
        if _rss_restart_due():
            # transport-client leak mitigation: planned restart (see
            # rss_exit_gb above) — save, exit 114, relaunch loop resumes
            if config.TRAINER.CHKPTS.SAVE and not saved_here:
                tracker.maybe_save(
                    params_now, epoch, loss,
                    opt_state=state_now.opt_state, rng_key=state_now.key,
                )
            rss = _rss_gb()
            _log_event("rss_exit", rss_gb=round(rss, 1), epoch=epoch)
            if primary:
                print(
                    f"[reni_tpu] RSS {rss:.1f} GB exceeds "
                    f"RENI_TPU_RSS_EXIT_GB={rss_exit_gb:g} — the tunnel "
                    "client retains transferred host bytes; checkpointed, "
                    "exiting 114 for a fresh-process resume.",
                    flush=True,
                )
            os._exit(114)
        if _yield_requested(stop_file):
            if config.TRAINER.CHKPTS.SAVE and not saved_here:
                # off-schedule force-save so the yield loses zero epochs
                tracker.maybe_save(
                    params_now, epoch, loss,
                    opt_state=state_now.opt_state, rng_key=state_now.key,
                )
            _log_event("chip_yield", task=task, epoch=epoch)
            chiplock.honor_yield(
                stop_file, primary=primary, what=f"{task} trainer"
            )
        if log_images and epoch % img_every == 0:
            # symmetric: collective allgather when params are sharded
            # across processes; every process joins, host 0 renders
            params_host = ckpt.fetch_tree(params_now)
            if primary:
                mode = config.TRAINER.LOGGER.IMAGES_TO_SHOW
                grid = example_images(
                    model,
                    params_host,
                    res,
                    mode=mode,
                    n_images=int(config.TRAINER.LOGGER.NUMBER_OF_IMAGES),
                    key=k_img,
                    dataset_images=stage_images_at(res),
                    unnormalise=dataset.unnormalise,
                    is_hdr=is_hdr,
                )
                logger.log_image(f"{task.lower()}_images", grid, epoch)

    if task == "FIT_INVERSE":
        if stream and primary:
            # inverse fits run on small test splits; their memory is the
            # render targets, not the env maps — streaming buys nothing
            print("[reni_tpu] TPU.STREAM_DATA ignored for FIT_INVERSE")
        from reni_tpu.render.inverse import fit_inverse

        def inverse_callback(state_now, epoch, metrics_chunk, res):
            # images are skipped here (renders logged at task end); scalars
            # and resumable checkpoints flow like the other tasks
            loss = float(np.asarray(metrics_chunk["loss"])[-1])
            _note_progress(f"{task} epoch {epoch}")
            logged = {
                f"{task.lower()}_{k}": float(np.asarray(v)[-1])
                for k, v in metrics_chunk.items()
            }
            logged[f"{task.lower()}_lr"] = float(lr_schedule(epoch - 1))
            logger.log_scalars(epoch, logged)
            if config.TRAINER.CHKPTS.SAVE and epoch % every == 0:
                tracker.maybe_save(
                    state_now.params, epoch, loss,
                    opt_state=state_now.opt_state, rng_key=state_now.key,
                )
            if _deadline_reached(deadline):
                return True
            if _yield_requested(stop_file):
                if config.TRAINER.CHKPTS.SAVE and epoch % every != 0:
                    tracker.maybe_save(
                        state_now.params, epoch, loss,
                        opt_state=state_now.opt_state, rng_key=state_now.key,
                    )
                chiplock.honor_yield(
                    stop_file, primary=primary, what=f"{task} trainer"
                )

        from reni_tpu.render.inverse import InverseRenderSetup

        inv_setup = InverseRenderSetup(
            task_cfg.object_path,
            render_resolution=task_cfg.render_resolution,
            kd=task_cfg.kd_value,
            azimuths=task_cfg.azimuths,
            elevations=task_cfg.elevations,
        )
        params, metrics = fit_inverse(
            model,
            params,
            task_cfg,
            dataset.images_at,
            dataset.unnormalise,
            k_fit,
            mesh=mesh,
            shard_latents=shard_latents,
            setup=inv_setup,
            callback_every=every,
            callback=inverse_callback,
        )
        if log_images:
            # final GT-vs-recovered render grid (callbacks.py:102-109
            # analog); symmetric fetch, host-0 render (as above)
            params_host = ckpt.fetch_tree(params)
            if primary:
                res = task_cfg.resolution_stages()[-1][0]
                gt = inv_setup.generate_gt_renders(
                    dataset.images_at(res), dataset.unnormalise, res[1]
                )
                grid = example_images(
                    model,
                    params_host,
                    res,
                    mode="random",
                    n_images=int(config.TRAINER.LOGGER.NUMBER_OF_IMAGES),
                    key=k_img,
                    dataset_images=dataset.images_at(res),
                    unnormalise=dataset.unnormalise,
                    is_hdr=is_hdr,
                    render_fn=inv_setup.render_fn(res[1]),
                    gt_renders=gt,
                )
                logger.log_image(
                    f"{task.lower()}_images", grid, task_cfg.epochs
                )
    else:
        opt_loader = None
        if resume_path is not None:
            opt_loader = lambda tmpl: ckpt.load_opt_state(resume_path, tmpl)
        dcfg = config.DATASET[config.DATASET.NAME]
        reaugment = bool(
            dcfg.get("REAUGMENT_PER_EPOCH", False)
        ) and dataset.has_random_transforms
        params, metrics = tasks.fit_task(
            model,
            params,
            task_cfg,
            stage_images_at,
            k_fit,
            mask_path=task_cfg.mask_path if task_cfg.apply_mask else None,
            mesh=mesh,
            shard_latents=shard_latents,
            callback_every=cb_every,
            callback=callback,
            start_epoch=start_epoch,
            initial_opt_state=opt_loader,
            reaugment=reaugment,
            stream=stream,
            stream_chunk=stream_chunk,
            stream_dtype=stream_dtype,
            precompile=precompile,
        )

    final = os.path.join(logger.log_dir, config.TRAINER.CHKPTS.SAVE_DIR,
                         f"{task.lower()}_final")
    params = ckpt.fetch_tree(params)  # symmetric (collective when sharded)
    if primary:
        ckpt.save_checkpoint(
            final,
            params,
            model_config=model_cfg,
            metadata={"task": task, "epoch": task_cfg.epochs,
                      "loss": float(metrics[f"{task.lower()}_loss"][-1])},
        )
    best = tracker.best_path or final
    return params, metrics, best


def _apply_precision(config) -> None:
    """TPU.PRECISION / TRAINER.MIXED_PRECISION -> XLA matmul precision.

    bfloat16 (default) keeps the platform's native matmul (bf16 inputs on
    TPU); float32/tensorfloat32 force full/TF32 precision globally.
    TRAINER.MIXED_PRECISION (the reference's AMP-16 flag, run.py:63,107)
    selects bfloat16 — on TPU, bf16 matmul inputs with f32 accumulation are
    the AMP analog."""
    precision = str(config.TPU.PRECISION).lower()
    if bool(config.TRAINER.MIXED_PRECISION):
        precision = "bfloat16"
    if precision in ("float32", "tensorfloat32"):
        jax.config.update("jax_default_matmul_precision", precision)


def _mesh_from_config(tpu_cfg):
    """TPU.MESH -> default ('data', 'pixel', 'model') mesh when --mesh is
    absent. DATA -1 spreads all remaining devices on the data axis; a
    resulting 1-device mesh means the single-program path (returns None)."""
    nd, np_ = int(tpu_cfg.MESH.DATA), int(tpu_cfg.MESH.PIXEL)
    nm = int(tpu_cfg.MESH.get("MODEL", 1))
    if nd == -1:
        nd = max(1, len(jax.devices()) // max(np_ * nm, 1))
    if nd * np_ * nm <= 1:
        return None
    from reni_tpu.parallel.mesh import make_mesh

    return make_mesh(n_data=nd, n_pixel=np_, n_model=nm)


def _dump_model_graph(model, params, log_dir: str, task: str) -> None:
    """TB.LOG_GRAPH analog: the reference logs the model graph to
    TensorBoard via example_input_array (run.py:55, RENI_module.py:28-32);
    the XLA-native equivalent is the lowered StableHLO of the decoder
    forward, dumped alongside the run's other artifacts."""
    from reni_tpu.core import sphere

    Z = model.latents(params, np.arange(1))
    D = sphere.get_directions(32)
    txt = jax.jit(model.apply).lower(params, Z, D).as_text()
    with open(os.path.join(log_dir, f"{task.lower()}_graph.stablehlo.txt"), "w") as f:
        f.write(txt)


def _experiment_runs(config) -> tuple[str | None, str]:
    """(newest existing version dir or None, next free version dir) of
    this config's experiment — the one version_N scan, shared by fresh-dir
    selection and relaunch adoption so the two can never diverge."""
    save_dir = config.TRAINER.LOGGER.TB.SAVE_DIR
    name = (
        experiment_name(config)
        if config.TRAINER.LOGGER.TB.NAME == "auto"
        else config.TRAINER.LOGGER.TB.NAME
    )
    version, last = 0, None
    while os.path.exists(os.path.join(save_dir, name, f"version_{version}")):
        last = os.path.join(save_dir, name, f"version_{version}")
        version += 1
    return last, os.path.join(save_dir, name, f"version_{version}")


def _config_fingerprint(config) -> str:
    import json as _json

    return _json.dumps(config.to_dict(), sort_keys=True, default=str)


def _new_log_dir(config) -> str:
    return _experiment_runs(config)[1]


def main(config, mesh=None, resume=None, log_dir=None, profile_dir=None):
    from reni_tpu.parallel import multihost

    # multi-host: no-op without a coordinator; with one (env or TPU pod),
    # joins the cluster — run one CLI process per host, same config
    distributed = multihost.initialize()
    primary = multihost.is_primary()
    _apply_precision(config)
    if isinstance(mesh, str):
        # mesh specs parse only after multihost.initialize: the flag counts
        # against the GLOBAL device set in a multi-process job
        mesh = _parse_mesh(mesh)
    if mesh is None:
        mesh = _mesh_from_config(config.TPU)
    if distributed and mesh is None:
        mesh = multihost.global_mesh()  # multi-process requires a global mesh
    if log_dir is None:
        log_dir = multihost.agree_on_path(_new_log_dir(config))
    wandb_cfg = None
    if config.TRAINER.LOGGER_TYPE == "wandb":
        wandb_cfg = dict(config.TRAINER.LOGGER.WANDB)
        wandb_cfg["run_config"] = config.to_dict()
    logger = MetricLogger(log_dir, wandb_config=wandb_cfg, enabled=primary)
    if primary:
        # fault-history events (retries/hangs/yields) land in the same
        # metrics.jsonl so a chain's log reports what it survived
        _EVENT_LOG["path"] = os.path.join(log_dir, "metrics.jsonl")
    if primary:
        # resolved-config record (the reference keeps hyper_parameters in
        # every Lightning ckpt); also the identity check gating relaunch
        # adoption (_find_resumable_run). First writer wins: retries
        # re-enter with a trimmed TASKS list that must not overwrite it.
        fingerprint = os.path.join(log_dir, "config.json")
        if not os.path.exists(fingerprint):
            os.makedirs(log_dir, exist_ok=True)
            with open(fingerprint, "w") as f:
                f.write(_config_fingerprint(config))

    tasks_list = list(config.RENI.TASKS)
    load_path = config.TRAINER.CHKPTS.LOAD_PATH

    if resume is not None:
        resume = ckpt.find_latest(resume)  # dirs resolve to the newest ckpt
        _, rmeta = ckpt._meta_only(resume)
        rtask = rmeta.get("task")
        assert tasks_list and tasks_list[0] == rtask, (
            f"--resume checkpoint is for task {rtask!r}; put that task first "
            f"in RENI.TASKS (got {tasks_list})"
        )
        if load_path is None:
            # the resume checkpoint carries full params (decoder included),
            # so it also serves as the decoder source for follow-on tasks
            load_path = resume
    if len(tasks_list) > 1 and load_path is None:
        assert tasks_list[0] == "FIT_DECODER", (
            "FIT_DECODER must run first unless TRAINER.CHKPTS.LOAD_PATH is set"
        )
    if tasks_list and tasks_list[0] != "FIT_DECODER":
        assert load_path is not None, (
            "non-FIT_DECODER first task requires TRAINER.CHKPTS.LOAD_PATH "
            "or --resume"
        )

    deadline = None
    max_hours = float(config.TRAINER.MAX_RUNTIME or 0)
    if max_hours > 0:
        deadline = time.time() + max_hours * 3600.0

    # --profile: capture a jax.profiler device trace of the whole chain
    # (point it at a short run; view in TensorBoard's profile plugin or
    # Perfetto). SURVEY §5: the reference ships torch-tb-profiler but never
    # invokes it — here tracing is a first-class CLI switch.
    import contextlib

    from reni_tpu.utils import profiling

    trace_stack = contextlib.ExitStack()
    if profile_dir:
        trace_stack.enter_context(profiling.trace(profile_dir))

    chkpt_path = load_path
    results = {}
    try:
        for i, task in enumerate(tasks_list):
            if _deadline_reached(deadline):
                break
            dataset_name = config.DATASET.NAME
            dcfg = config.DATASET[dataset_name]
            split = "Train" if task == "FIT_DECODER" else "Test"
            split_path = os.path.join(dcfg.PATH, split)
            if not os.path.isdir(split_path):
                split_path = dcfg.PATH  # flat dataset layout
            dataset = get_dataset(
                dataset_name, split_path, dcfg.TRANSFORMS, dcfg.IS_HDR,
                # out-of-core: only the file list in host RAM; rows decode
                # on demand (prefetched) through the native codec
                lazy=bool(config.TPU.get("STREAM_FROM_DISK", False)),
            )

            params, metrics, best = run_task(
                config, task, dataset, logger, chkpt_path, mesh=mesh,
                deadline=deadline, resume_path=resume if i == 0 else None,
                primary=primary,
            )
            # non-primary processes must not read the chained checkpoint
            # before host 0 finishes writing it
            multihost.barrier(f"task_end_{i}_{task}")
            results[task] = (params, metrics)
            if task == "FIT_DECODER":
                chkpt_path = best
                if i + 1 < len(tasks_list):
                    # pods without a shared run directory: non-primary hosts
                    # receive the chained checkpoint bytes from host 0
                    # (advisor round 2; only host 0 writes files)
                    multihost.ensure_checkpoint(best)
    finally:
        # must run on the exception path too: a dangling jax.profiler
        # session would make every --retries attempt die on start_trace
        # and lose the crashed run's trace
        trace_stack.close()
    logger.close()
    return results, log_dir


def _auto_resume_plan(config, log_dir: str):
    """(tasks_list, resume, load_path) to continue a crashed run from its
    newest checkpoint — the crash-retry policy behind ``--retries``.

    A task whose newest checkpoint has reached its EPOCHS (or is the
    ``_final`` file) is treated as complete: the chain restarts at the NEXT
    task with that checkpoint as the decoder source. Otherwise the task
    itself resumes mid-way (params + optimizer state + RNG)."""
    ckdir = os.path.join(log_dir, config.TRAINER.CHKPTS.SAVE_DIR)
    try:
        latest = ckpt.find_latest(ckdir)
    except (FileNotFoundError, OSError):
        return list(config.RENI.TASKS), None, config.TRAINER.CHKPTS.LOAD_PATH
    _, meta = ckpt._meta_only(latest)
    rtask = meta.get("task")
    tasks_list = list(config.RENI.TASKS)
    task_epochs = int(config.RENI[rtask].EPOCHS) if rtask in config.RENI else 0
    complete = latest.endswith("_final") or (
        int(meta.get("epoch", 0)) >= task_epochs > 0
    )
    if rtask not in tasks_list:
        # the newest checkpoint belongs to a task outside the (possibly
        # already-trimmed) list — e.g. make_zoo resuming ['FIT_LATENT']
        # while the newest save is still fit_decoder_final. Nothing in the
        # list is complete; a COMPLETE foreign checkpoint serves as the
        # decoder source, a partial one must not be loaded at all.
        return tasks_list, None, (
            latest if complete else config.TRAINER.CHKPTS.LOAD_PATH
        )
    i = tasks_list.index(rtask)
    if complete:
        return tasks_list[i + 1 :], None, latest
    return tasks_list[i:], latest, None


def _find_resumable_run(config):
    """(log_dir, plan) of the newest existing run of this experiment whose
    task chain is incomplete, or (None, None) to start fresh.

    This is the PROCESS-RELAUNCH half of crash recovery: the in-process
    ``--retries`` loop cannot survive a hard exit (the hang watchdog's 114,
    a chip-preemption yield's 115, an OOM-killed worker), so an external
    ``until python -m reni_tpu.cli.run ... --retries N; do :; done`` loop
    reruns the command — and the fresh process must adopt the previous
    attempt's run directory and newest checkpoint instead of starting a new
    ``version_N`` from scratch. Engaged only in unattended mode
    (``--retries > 0``) and without an explicit ``--resume``.

    Adoption requires config identity: every run stores its resolved
    config (``config.json`` in the run dir, written by ``main``) and a
    candidate whose stored config differs from the current one is never
    adopted — with an explicit ``TB.NAME`` the directory name encodes no
    hyperparameters, and resuming yesterday's aborted run under today's
    edited YAML would silently train the wrong thing."""
    last, _ = _experiment_runs(config)
    if last is None:
        return None, None
    stored = os.path.join(last, "config.json")
    if os.path.exists(stored):
        with open(stored) as f:
            if f.read() != _config_fingerprint(config):
                print(
                    f"[relaunch] {last} was trained with a different "
                    "config — starting fresh instead of adopting it",
                    flush=True,
                )
                return None, None
    plan = _auto_resume_plan(config, last)
    tasks_list, resume, load_path = plan
    if not tasks_list:
        return None, None  # previous run completed the whole chain
    untouched = (
        list(tasks_list) == list(config.RENI.TASKS)
        and resume is None
        and load_path == config.TRAINER.CHKPTS.LOAD_PATH
    )
    if untouched:
        return None, None  # no checkpoints there — nothing to adopt
    return last, plan


def run_with_retries(config, mesh=None, resume=None, retries: int = 0, profile_dir=None):
    """Drive ``main`` with crash-retries: on an unexpected exception, resume
    from the newest checkpoint in the same run directory (the tunneled-TPU
    worker crashes sporadically under sustained load; see CLAUDE.md). A
    retry loses at most TRAINER.CHKPTS.EVERY_N_EPOCHS epochs.

    With ``retries > 0`` a FRESH process also adopts the newest existing
    incomplete run of the same experiment (``_find_resumable_run``), so an
    external relaunch loop recovers hard exits (hang-watchdog 114,
    chip-yield 115, killed workers) exactly like an in-process retry."""
    from reni_tpu.parallel import multihost

    # join the cluster BEFORE scanning for a free version_N: the scan races
    # against host 0 creating the directory, and agree_on_path needs
    # jax.distributed up (main()'s initialize is idempotent after this)
    multihost.initialize()
    # serialize against other chip jobs on this host (utils/chiplock.py):
    # held across ALL retries — a preemptor (bench.py) that we yielded to
    # blocks our supervisor-relaunched successor until it's done, and
    # in-process retries must not release the chip either
    from reni_tpu.utils import chiplock

    lock_path = chiplock.trainer_lock_path()
    with chiplock.hold_chip_lock(
        lock_path, what="cli.run", progress_cb=_note_progress,
    ) as got_lock:
        return _run_with_retries_locked(
            config, mesh=mesh, resume=resume, retries=retries,
            profile_dir=profile_dir,
            # failing open on the LOCK must not extend to ADOPTION: the
            # holder that never yielded may be live-training the very run
            # we would adopt — two writers in one run dir clobber each
            # other's checkpoints. Locking disabled (path None) adopts
            # normally; engaged-but-unacquired does not.
            allow_adopt=lock_path is None or got_lock,
        )


def _run_with_retries_locked(config, mesh=None, resume=None, retries: int = 0,
                             profile_dir=None, allow_adopt: bool = True):
    import json as _json
    import traceback

    from reni_tpu.parallel import multihost

    log_dir = None
    if retries > 0 and resume is None and not allow_adopt:
        print(
            "[relaunch] chip lock is held by another live job — NOT "
            "adopting its run directory; starting fresh",
            flush=True,
        )
    if retries > 0 and resume is None and allow_adopt:
        # process-relaunch recovery: adopt the newest incomplete run of
        # this experiment (host 0 decides — other hosts may not see its
        # files) instead of restarting the chain in a fresh version_N
        found = _find_resumable_run(config) if multihost.is_primary() else None
        blob = multihost.agree_on_str(
            _json.dumps(found) if found and found[0] else ""
        )
        if blob:
            log_dir, (tasks_list, resume, load_path) = _json.loads(blob)
            if resume:
                multihost.ensure_checkpoint(resume)
            if load_path:
                multihost.ensure_checkpoint(load_path)
            config = config.clone()
            config.RENI.TASKS = tasks_list
            config.TRAINER.CHKPTS.LOAD_PATH = load_path
            print(
                f"[relaunch] adopting {log_dir}: tasks={tasks_list} "
                f"resume={resume} load_path={load_path}",
                flush=True,
            )
            if multihost.is_primary():
                # a fresh process adopting an incomplete run means the
                # previous attempt hard-exited (wedge 114 / yield 115 /
                # kill) — record the restart in the run's own log
                _EVENT_LOG["path"] = os.path.join(log_dir, "metrics.jsonl")
                _log_event(
                    "relaunch_adopt", tasks=tasks_list, resume=resume
                )
    if log_dir is None:
        log_dir = multihost.agree_on_path(_new_log_dir(config))
    attempt = 0
    while True:
        try:
            return main(config, mesh=mesh, resume=resume, log_dir=log_dir,
                        profile_dir=profile_dir)
        except KeyboardInterrupt:
            raise
        except Exception:
            if attempt >= retries:
                raise
            attempt += 1
            traceback.print_exc()
            plan = _auto_resume_plan(config, log_dir)
            if jax.process_count() > 1:
                # a failure local to a subset of hosts means the others are
                # still inside main() and will never join the retry
                # rendezvous — fail fast instead of hanging in the
                # broadcast until the distributed runtime times out
                if not multihost.barrier_timeout("retry_rendezvous", 300.0):
                    print(
                        "[retry] cluster split: not all hosts reached the "
                        "retry point within 300 s — aborting",
                        flush=True,
                    )
                    raise
                # adopt host 0's plan: other hosts may not see its
                # checkpoint files and would otherwise restart from scratch,
                # dispatching divergent SPMD programs
                import json as _json

                plan = tuple(
                    _json.loads(multihost.agree_on_str(_json.dumps(list(plan))))
                )
            tasks_list, resume, load_path = plan
            if jax.process_count() > 1 and resume:
                # the resume checkpoint may exist only on host 0's disk
                multihost.ensure_checkpoint(resume)
            if jax.process_count() > 1 and load_path:
                multihost.ensure_checkpoint(load_path)
            if not tasks_list:
                raise  # everything already completed; surface the error
            config = config.clone()
            config.RENI.TASKS = tasks_list
            config.TRAINER.CHKPTS.LOAD_PATH = load_path
            print(
                f"[retry {attempt}/{retries}] resuming tasks={tasks_list} "
                f"resume={resume} load_path={load_path}",
                flush=True,
            )
            _log_event(
                "retry", attempt=attempt, tasks=tasks_list, resume=resume
            )


def _parse_mesh(spec: str | None):
    if not spec:
        return None
    from reni_tpu.parallel.mesh import make_mesh

    dims = [int(x) for x in spec.lower().split("x")]
    nd, np_ = dims[0], dims[1] if len(dims) > 1 else 1
    nm = dims[2] if len(dims) > 2 else 1
    return make_mesh(n_data=nd, n_pixel=np_, n_model=nm)


def cli(argv=None) -> int:
    """Console entry point (`reni-tpu` / `python -m reni_tpu.cli.run`)."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_path", type=str, default="configs/experiment.yaml")
    parser.add_argument(
        "--mesh", type=str, default=None, help="device mesh as DATAxPIXEL[xMODEL], e.g. 4x2 or 2x2x2"
    )
    parser.add_argument(
        "--profile", type=str, default=None,
        help="capture a jax.profiler device trace of the run into this dir "
             "(TensorBoard profile plugin / Perfetto); point it at a short run",
    )
    parser.add_argument(
        "--resume",
        type=str,
        default=None,
        help="mid-task resume from a periodic checkpoint (params + optimizer "
        "state + epoch) or a run directory (resolves to its newest "
        "checkpoint); the checkpoint's task must be first in RENI.TASKS",
    )
    parser.add_argument(
        "--retries",
        type=int,
        default=0,
        help="crash-retries: on failure, resume from the run's newest "
        "checkpoint (at most EVERY_N_EPOCHS epochs are repeated)",
    )
    args = parser.parse_args(argv)
    cfg = get_cfg_defaults()
    cfg.merge_from_file(args.cfg_path)
    _arm_hang_watchdog()
    run_with_retries(
        cfg, mesh=args.mesh, resume=args.resume, retries=args.retries,
        profile_dir=args.profile
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(cli())
