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
    without a coordinator (env or argument) it is a no-op."""
    if jax.process_count() > 1:
        return True
    coordinator = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    in_tpu_pod = "TPU_WORKER_HOSTNAMES" in os.environ and (
        len(os.environ["TPU_WORKER_HOSTNAMES"].split(",")) > 1
    )
    if coordinator is None and not in_tpu_pod:
        return False
    try:
        jax.distributed.initialize(coordinator_address=coordinator, **kwargs)
    except (RuntimeError, ValueError):
        return jax.process_count() > 1
    return True


def global_mesh(n_pixel: int = 1):
    """('data', 'pixel') mesh over *all* devices in the job (local or pod).

    Data parallelism maps to the full device set; keep the pixel axis within
    a slice (ICI) — its resharding collectives are latency-sensitive."""
    return make_mesh(n_pixel=n_pixel, devices=jax.devices())


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs (host 0)."""
    return jax.process_index() == 0
