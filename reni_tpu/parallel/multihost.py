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
