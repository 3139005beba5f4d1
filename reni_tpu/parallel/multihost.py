"""Multi-host / multi-slice setup.

The reference scales by spawning one process per GPU under PL DDP
(reference: run.py:94-97). On TPU pods the analog is one process per host,
each seeing its local chips, with `jax.distributed` wiring the global mesh;
the training code in this repo is already written against global meshes and
NamedShardings, so nothing else changes — GSPMD routes DP gradient psums
over ICI within a slice and DCN across slices.

Usage on each host (or let the TPU runtime env vars do it automatically):

    from reni_tpu.parallel import multihost
    multihost.initialize()                  # jax.distributed.initialize()
    mesh = multihost.global_mesh(n_pixel=1)

Single-host runs are unaffected: `initialize` is a no-op when no
coordinator is configured.
"""

from __future__ import annotations

import os

import jax

from reni_tpu.parallel.mesh import make_mesh


def initialize(coordinator_address: str | None = None, **kwargs) -> bool:
    """Initialise jax.distributed when running multi-process.

    Returns True if distributed mode is active. Safe to call unconditionally:
    without a coordinator (env or argument) it is a no-op.

    NB: the coordinator check runs BEFORE any jax API touch — even
    ``jax.process_count()`` initializes the backend, after which
    ``jax.distributed.initialize`` is rejected."""
    coordinator = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    in_tpu_pod = "TPU_WORKER_HOSTNAMES" in os.environ and (
        len(os.environ["TPU_WORKER_HOSTNAMES"].split(",")) > 1
    )
    if coordinator is None and not in_tpu_pod:
        # no coordinator configured: either a plain single-process run, or
        # jax.distributed was already initialized manually
        return jax.process_count() > 1
    # manual clusters (e.g. one CLI process per host pointing at the same
    # coordinator) can specify the topology via env instead of kwargs
    if "num_processes" not in kwargs and "JAX_NUM_PROCESSES" in os.environ:
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if "process_id" not in kwargs and "JAX_PROCESS_ID" in os.environ:
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    try:
        jax.distributed.initialize(coordinator_address=coordinator, **kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized (idempotent use)
    return jax.process_count() > 1


def global_mesh(n_pixel: int = 1):
    """('data', 'pixel') mesh over *all* devices in the job (local or pod).

    Data parallelism maps to the full device set; keep the pixel axis within
    a slice (ICI) — its resharding collectives are latency-sensitive."""
    return make_mesh(n_pixel=n_pixel, devices=jax.devices())


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs (host 0)."""
    return jax.process_index() == 0


def barrier(name: str = "barrier") -> None:
    """Cross-process sync point (no-op single-process). Used between CLI
    tasks so non-primary processes do not read a chained checkpoint before
    host 0 finishes writing it."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def agree_on_str(value: str, max_len: int = 4096) -> str:
    """All processes adopt process 0's string (e.g. a crash-retry resume
    plan — non-primary hosts cannot see host 0's checkpoint files on a
    pod, so they must not compute their own)."""
    if jax.process_count() <= 1:
        return value
    import numpy as np
    from jax.experimental import multihost_utils

    data = value.encode()
    if len(data) > max_len:
        raise ValueError(f"agree_on_str payload exceeds {max_len} bytes")
    buf = np.zeros(max_len + 8, np.uint8)
    buf[:8] = np.frombuffer(np.int64(len(data)).tobytes(), np.uint8)
    buf[8 : 8 + len(data)] = np.frombuffer(data, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    n = int(np.frombuffer(out[:8].tobytes(), np.int64)[0])
    return out[8 : 8 + n].tobytes().decode()


def agree_on_flag(value: bool) -> bool:
    """All processes adopt process 0's boolean.

    Used for the MAX_RUNTIME deadline verdict: per-host wall clocks cross
    the deadline at different instants, and a host that stops dispatching
    alone leaves the rest of the cluster blocked in collectives (training
    psums, fetch_tree allgathers) — a hang. Host 0's clock decides for
    everyone. Collective: every process must call it at the same point."""
    if jax.process_count() <= 1:
        return bool(value)
    import numpy as np
    from jax.experimental import multihost_utils

    return bool(
        int(multihost_utils.broadcast_one_to_all(np.int32(1 if value else 0)))
    )


def ensure_file(path: str) -> None:
    """Make host 0's file available at ``path`` on every process.

    On a TPU pod without a shared run directory, only host 0 writes
    checkpoints; the chained FIT_DECODER -> FIT_LATENT load (and --resume)
    would fail on the other hosts. The bytes broadcast from host 0 over the
    coordinator; non-primary hosts (re)write the file locally. Collective —
    call from every process at the same point. No-op single-process."""
    if jax.process_count() <= 1:
        return
    import numpy as np
    from jax.experimental import multihost_utils

    primary = is_primary()
    data = b""
    if primary:
        with open(path, "rb") as f:
            data = f.read()
    n = int(multihost_utils.broadcast_one_to_all(np.int64(len(data))))
    buf = np.zeros(max(n, 1), np.uint8)
    if primary and n:
        buf[:n] = np.frombuffer(data, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    if not primary:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "wb") as f:
            f.write(out[:n].tobytes())
        os.replace(tmp, path)


def ensure_checkpoint(path_base: str) -> None:
    """``ensure_file`` for a checkpoint's .npz + .json pair."""
    for ext in (".npz", ".json"):
        ensure_file(path_base + ext)


def barrier_timeout(name: str, seconds: float) -> bool:
    """A barrier that gives up after ``seconds``; returns False on timeout.

    For the crash-retry path: only hosts whose main() raised reach the
    retry rendezvous, so if the failure was local to a subset, the others
    never join and a plain barrier would hang until the distributed runtime
    times out. A False result means the cluster is split — fail fast. The
    abandoned barrier thread is left behind; callers are expected to raise
    (terminating the process) on timeout."""
    if jax.process_count() <= 1:
        return True
    import threading

    done = threading.Event()

    def _sync():
        try:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(name)
            done.set()
        except Exception:
            pass

    t = threading.Thread(target=_sync, daemon=True)
    t.start()
    return done.wait(timeout=seconds)


def agree_on_path(path: str) -> str:
    """Adopt process 0's ``version_N``-suffixed run directory everywhere.

    The local next-free-version scan can race: if host 0 already created
    version_K when another process scans, that process would pick K+1 and
    the run would split across directories."""
    if jax.process_count() <= 1 or "version_" not in path:
        return path
    import numpy as np
    from jax.experimental import multihost_utils

    base, v = path.rsplit("version_", 1)
    v = int(multihost_utils.broadcast_one_to_all(np.int32(int(v))))
    return f"{base}version_{v}"
