"""Background precompilation of later curriculum stages.

The published chains are compile-dominated on tunneled chips (PERF.md: ~55 s
of Mosaic compiles per task against seconds of actual step execution per
stage), and the reference's Lightning loop has no analog — each resolution
stage here is ONE whole-stage XLA program whose signature is known before
the previous stage finishes. This module lowers-and-compiles those later
programs in daemon worker threads while the current stage trains, hiding
compile latency behind device execution (and behind other compiles — the
compiler serves concurrent requests).

Correctness never depends on it: jit's executable cache is populated by AOT
``fn.lower(...).compile()`` (pinned by tests/test_precompile.py), so the
real call is a cache hit when the precompile won the race and an ordinary
inline compile when it didn't or when a background thunk failed (failures
are logged, never raised).

Two facts this design is built on (both pinned by the tests):

- AOT ``lower().compile()`` shares jit's executable cache ONLY when the
  lowering signature matches the eventual call, and a committed input
  (``device_put`` with an explicit device) changes that signature
  (``SingleDeviceSharding`` vs ``UnspecifiedValue``). ``tasks.run_stage``
  therefore commits every input to the default device, making the runtime
  signature deterministic, and :func:`launch_stage_precompiles` lowers with
  the same ``SingleDeviceSharding`` on every leaf.
- ``tasks._scan_runner`` memoizes the jitted program on the step-fn OBJECT,
  so the precompiler must receive the very step functions the training loop
  will run (``fit_task`` builds them once per stage and shares them).
"""

from __future__ import annotations

import logging
import os
import queue
import threading
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

_LOG = logging.getLogger("reni_tpu.precompile")


def workers_default() -> int:
    """Background compile threads (RENI_TPU_PRECOMPILE_WORKERS, default 2).

    Two in flight keeps the compiler busy without starving the main
    thread's own inline compile or hammering a tunneled compile server."""
    return max(1, int(os.environ.get("RENI_TPU_PRECOMPILE_WORKERS", "2")))


class Precompiler:
    """A tiny daemon-thread pool for fire-and-forget compile thunks.

    Daemon threads (not ``ThreadPoolExecutor``) on purpose: the executor
    joins its workers at interpreter exit, so a compile wedged inside a hung
    device tunnel would block process shutdown — the exact failure mode the
    CLI's hang watchdog (``RENI_TPU_HANG_EXIT_S``) exists to escape."""

    def __init__(self, workers: int | None = None):
        self._q: queue.Queue = queue.Queue()
        self._lock = threading.Condition()
        self._outstanding = 0
        self._failures = 0
        n = workers if workers is not None else workers_default()
        self._threads = [
            threading.Thread(
                target=self._work, daemon=True, name=f"reni-precompile-{i}"
            )
            for i in range(n)
        ]
        for t in self._threads:
            t.start()

    def submit(self, desc: str, thunk: Callable[[], None]) -> None:
        with self._lock:
            self._outstanding += 1
        self._q.put((desc, thunk))

    def _work(self) -> None:
        while True:
            desc, thunk = self._q.get()
            try:
                thunk()
                _LOG.debug("precompiled %s", desc)
            except Exception as e:  # noqa: BLE001 — never fail training
                with self._lock:
                    self._failures += 1
                _LOG.warning("background precompile of %s failed: %s", desc, e)
            finally:
                with self._lock:
                    self._outstanding -= 1
                    self._lock.notify_all()

    def drain(self, timeout: float | None = None) -> bool:
        """Wait for all submitted thunks (tests; training never waits)."""
        with self._lock:
            return self._lock.wait_for(
                lambda: self._outstanding == 0, timeout=timeout
            )

    @property
    def failures(self) -> int:
        with self._lock:
            return self._failures


def program_lengths(
    n_epochs: int, nb: int, callback_every: int | None = None
) -> list[int]:
    """Distinct static scan ``length`` values a stage will dispatch.

    Mirrors the two chunkings the training loop applies: ``fit_task``
    segments a stage at callback boundaries (``min(callback_every,
    remaining)``), and ``run_stage`` splits each segment by the
    RENI_TPU_MAX_SCAN_STEPS per-dispatch cap. One compile per distinct
    length (usually one, plus a remainder). Pinned against the actual
    runner's dispatches in tests/test_precompile.py."""
    from reni_tpu.train.tasks import _max_steps_per_program

    cap = _max_steps_per_program()
    lengths: set[int] = set()
    done = 0
    while done < n_epochs:
        seg = (
            min(callback_every, n_epochs - done)
            if callback_every
            else n_epochs - done
        )
        epp = max(1, cap // nb) if cap else seg
        d = 0
        while d < seg:
            step = min(epp, seg - d)
            lengths.add(step)
            d += step
        done += seg
    return sorted(lengths)


def launch_stage_precompiles(
    pool: Precompiler,
    *,
    state,
    dataset_size: int,
    img_dtype,
    stages: Sequence[tuple[tuple[int, int], int]],
    step_fn_of: Callable[[tuple[int, int]], Callable],
    batch_size: int,
    callback_every: int | None,
) -> int:
    """Queue background compiles for every later (res, n_epochs) stage.

    ``step_fn_of`` must return the SAME step-fn object the training loop
    will use for that resolution (``fit_task`` memoizes per res) — the
    whole-stage program cache is keyed on it. Step fns are built here, in
    the caller's thread, so worker threads only lower/compile. Returns the
    number of programs queued."""
    from reni_tpu.train import tasks

    dev = jax.local_devices()[0]
    sharding = jax.sharding.SingleDeviceSharding(dev)
    sds = lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
    state_sds = jax.tree.map(sds, state)
    idx, bmask = tasks.make_batches(dataset_size, batch_size)
    idx_sds = sds(jnp.asarray(idx))
    bmask_sds = sds(jnp.asarray(bmask))
    nb = idx.shape[0]

    n_programs = 0
    for res, n_epochs in stages:
        res = tuple(res)
        step_fn = step_fn_of(res)
        img_sds = jax.ShapeDtypeStruct(
            (dataset_size, res[0] * res[1], 3), img_dtype, sharding=sharding
        )
        lengths = program_lengths(n_epochs, nb, callback_every)
        n_programs += len(lengths)

        def thunk(step_fn=step_fn, img_sds=img_sds, lengths=lengths):
            run = tasks._scan_runner(step_fn)
            for L in lengths:
                run.lower(state_sds, img_sds, idx_sds, bmask_sds, length=L).compile()

        pool.submit(f"stage {res} lengths={lengths}", thunk)
    return n_programs
