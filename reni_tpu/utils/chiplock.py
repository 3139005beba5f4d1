"""Advisory chip arbitration for the shared (tunneled) TPU worker.

The attached TPU is ONE remote chip shared by every process on this host.
Two concurrent dispatch streams timeshare it, which wrecks dependent-chain
timings (bench.py's headline would read contended, not real, numbers) and
can OOM the worker. The concrete hazard: a long unattended chip queue
(training chains, benchmark sweeps) is running when the round driver
launches ``bench.py``. Two cooperating pieces fix that without a daemon:

- the **chip lock** — an ``fcntl.flock`` on a well-known file. Long-running
  chip entrypoints (``cli.run``, the benchmark scripts, ``bench.py``) hold
  it for their lifetime, so concurrent launches serialize. Advisory and
  fail-open: a holder that never yields is eventually bypassed with a
  warning rather than deadlocking the caller; a dead holder's lock is
  released by the kernel automatically.
- the **stop file** — a preemptor (``bench.py``, which must measure an
  idle chip) creates it to ask the current holder to yield. The trainer
  checks it at segment boundaries (collectively across hosts, at the same
  loop points as ``TRAINER.MAX_RUNTIME``), force-saves a resumable
  checkpoint, consumes the file and exits with code **115**; an outer
  retry loop (``until python -m reni_tpu.cli.run ... --retries N; do :;
  done`` or any supervisor) relaunches the run, which blocks on the lock
  until the preemptor finishes and then auto-resumes from the newest
  checkpoint. Benchmark scripts yield between timed items (they are
  cheap to rerun; no checkpoint needed).

Exit-code convention: **114** = wedged dispatch (the hang watchdogs),
**115** = yielded the chip to a preemptor. Both mean "rerun me".

Gating: the lock/stop machinery engages only for single-process jobs on a
real TPU backend (CPU test runs — including the in-repo 2-process cluster
tests, which must never serialize across a collective — stay untouched),
or when ``RENI_TPU_CHIP_LOCK`` / ``RENI_TPU_STOP_FILE`` name a path
explicitly. Setting either to the empty string disables that half.

The reference has no analog (single-tenant GPUs via
``CUDA_VISIBLE_DEVICES``, run.py:134); this is operational machinery the
shared-worker TPU deployment needs.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

DEFAULT_LOCK = "/tmp/reni_tpu_chip.lock"
DEFAULT_STOP = "/tmp/reni_tpu_stop"
YIELD_EXIT_CODE = 115


def _log(msg: str) -> None:
    # stderr: several callers (bench.py, bwd_anatomy) reserve stdout for
    # machine-readable JSON
    print(f"[chiplock] {msg}", file=sys.stderr, flush=True)


def _auto_engaged() -> bool:
    """Default gate for jax-initialising entrypoints: single-process on a
    real TPU backend. NOT safe to call when the pool may be wedged (backend
    init can hang) — preemptors use ``preempt_and_hold``, which never
    touches jax."""
    import jax

    if jax.process_count() > 1:
        # one process per host: flock is per-host, so the lock cannot
        # arbitrate a pod job — and same-host multi-process jobs would
        # deadlock across collectives if serialized
        return False
    return jax.default_backend() == "tpu"


def trainer_lock_path() -> str | None:
    """Lock path for jax-initialising entrypoints (None = locking off)."""
    p = os.environ.get("RENI_TPU_CHIP_LOCK")
    if p is not None:
        return p or None
    return DEFAULT_LOCK if _auto_engaged() else None


def trainer_stop_path() -> str | None:
    """Stop-file path the trainer should honor (None = never yield)."""
    p = os.environ.get("RENI_TPU_STOP_FILE")
    if p is not None:
        return p or None
    return DEFAULT_STOP if _auto_engaged() else None


@contextlib.contextmanager
def hold_chip_lock(
    path: str | None,
    *,
    wait_s: float | None = None,
    what: str = "chip job",
    progress_cb=None,
):
    """Hold the advisory chip lock for the context; yields whether it was
    actually acquired. ``path=None`` is a no-op (yields False). Blocks up
    to ``wait_s`` (default ``RENI_TPU_CHIP_LOCK_WAIT_S`` or 3600 s); on
    timeout proceeds WITHOUT the lock — advisory, never a deadlock.
    ``progress_cb(msg)`` is invoked each poll so callers' hang watchdogs
    (cli.run's RENI_TPU_HANG_EXIT_S) don't count lock waiting as a wedge."""
    if path is None:
        yield False
        return
    import fcntl

    if wait_s is None:
        wait_s = float(os.environ.get("RENI_TPU_CHIP_LOCK_WAIT_S", "3600"))
    f = open(path, "a")
    got = False
    deadline = time.monotonic() + wait_s
    try:
        first = True
        while True:
            try:
                fcntl.flock(f.fileno(), fcntl.LOCK_EX | fcntl.LOCK_NB)
                got = True
                break
            except OSError:
                if time.monotonic() > deadline:
                    _log(
                        f"{what}: chip lock {path} still held after "
                        f"{wait_s:.0f}s — proceeding WITHOUT it (advisory)"
                    )
                    break
                if first:
                    _log(
                        f"{what}: waiting for chip lock {path} "
                        "(another chip job is running)"
                    )
                    first = False
                if progress_cb is not None:
                    progress_cb(f"{what}: waiting for chip lock")
                time.sleep(2.0)
        yield got
    finally:
        if got:
            with contextlib.suppress(OSError):
                fcntl.flock(f.fileno(), fcntl.LOCK_UN)
        f.close()


def yield_requested(stop: str | None) -> bool:
    """Has a preemptor asked for the chip? (Local check — the trainer
    wraps it in a cross-host ``agree_on_flag``.)"""
    return bool(stop) and os.path.exists(stop)


def honor_yield(stop: str | None, *, primary: bool = True, what: str = "trainer"):
    """Consume the stop file and exit ``YIELD_EXIT_CODE``. The caller has
    already saved any state worth keeping (the trainer force-saves a
    checkpoint first; benchmark items just rerun)."""
    if primary and stop:
        with contextlib.suppress(FileNotFoundError, OSError):
            os.remove(stop)
    _log(
        f"{what}: stop file {stop} present — yielding the chip "
        f"(exit {YIELD_EXIT_CODE}); rerun (or --retries / a supervisor "
        "loop) resumes from the newest checkpoint"
    )
    raise SystemExit(YIELD_EXIT_CODE)


def maybe_yield(stop: str | None, *, what: str) -> None:
    """For benchmark scripts, between timed items: exit 115 if a
    preemptor asked for the chip."""
    if yield_requested(stop):
        honor_yield(stop, what=what)


@contextlib.contextmanager
def preempt_and_hold(*, wait_s: float, what: str = "bench"):
    """For preemptors (bench.py): ask any current holder to yield, then
    take the chip lock. Touches NO jax state, so it is safe to call while
    the pool is wedged (a hung backend init here would starve the caller's
    own watchdog). Yields True when the chip is exclusively ours (or
    arbitration is explicitly disabled), False when the wait timed out and
    the measurement may be contended."""
    lp = os.environ.get("RENI_TPU_CHIP_LOCK")
    if lp is not None and not lp:
        yield True  # explicitly disabled: caller opted out of arbitration
        return
    lp = lp or DEFAULT_LOCK
    stop = os.environ.get("RENI_TPU_STOP_FILE")
    if stop is None:
        stop = DEFAULT_STOP
    stop = stop or None  # empty env disables the preemption half too
    import fcntl

    f = open(lp, "a")
    got = False
    deadline = time.monotonic() + wait_s
    try:
        try:
            fcntl.flock(f.fileno(), fcntl.LOCK_EX | fcntl.LOCK_NB)
            got = True
        except OSError:
            if stop:
                _log(f"{what}: chip busy — requesting yield via {stop}")
            else:
                _log(f"{what}: chip busy — waiting (preemption disabled)")
            while not got and time.monotonic() <= deadline:
                if stop:
                    # re-assert each poll: a relaunched holder consumes
                    # the file on its way out, and a fresh holder that won
                    # the flock race must see a new request
                    with open(stop, "a"):
                        pass
                try:
                    fcntl.flock(f.fileno(), fcntl.LOCK_EX | fcntl.LOCK_NB)
                    got = True
                except OSError:
                    time.sleep(2.0)
            if not got:
                _log(
                    f"{what}: chip lock still held after {wait_s:.0f}s — "
                    "proceeding anyway (numbers may be contended)"
                )
        if got and stop:
            # stale or our own request: nobody should yield to us now
            with contextlib.suppress(FileNotFoundError, OSError):
                os.remove(stop)
        yield got
    finally:
        if got:
            with contextlib.suppress(OSError):
                fcntl.flock(f.fileno(), fcntl.LOCK_UN)
        elif stop:
            # timed-out (contended) path: the request stayed active during
            # the measurement — the holder yielding mid-run still helps —
            # but must not linger to spuriously stop the NEXT holder
            with contextlib.suppress(FileNotFoundError, OSError):
                os.remove(stop)
        f.close()
