"""Benchmark: directional samples/sec/chip through the flagship RENI train
step (SIREN fwd+bwd+adam), the reference's hot loop (SURVEY §3.1).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Protocol (BASELINE.md): count directions evaluated per second per chip
through the decoder forward+backward. Workload = published config: VAD,
Cond-by-Concat, SO2, N=49, 5x256 SIREN, tanh; batch 100 at 64x128
(819,200 directional samples per optimizer step, as in the reference's
final curriculum stage).

``vs_baseline`` is measured live against a faithful torch re-implementation
of the reference's computation (concat encoding + SIREN + VAD loss, Adam)
run on this host's CPU — the only reference runtime available in this
environment (the reference's own 4xGPU numbers are unpublished).
"""

from __future__ import annotations

import json
import sys
import time


def bench_jax(
    batch: int = 100,
    width: int = 128,
    steps: int = 20,
    *,
    use_pallas: bool = False,
    fast_sine: bool = False,
    conditioning: str | None = None,
) -> float:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from reni_tpu.core import sphere
    from reni_tpu.models.reni import RENIModel
    from reni_tpu.train import tasks
    from reni_tpu.train.optim import OptimConfig, build_optimizer
    from reni_tpu.utils.profiling import benchmark_fn
    from __graft_entry__ import FLAGSHIP

    cfg = dataclasses.replace(FLAGSHIP, use_pallas=use_pallas, fast_sine=fast_sine)
    if conditioning is not None:
        cfg = dataclasses.replace(cfg, conditioning=conditioning)
    model = RENIModel(cfg)
    params = model.init(jax.random.PRNGKey(0), dataset_size=batch)
    directions = sphere.get_directions(width)
    sineweight = sphere.get_sineweight(width)
    npix = directions.shape[1]

    optimizer = build_optimizer(
        OptimConfig(lr_start=1e-5, lr_end=1e-7, epochs=2400, steps_per_epoch=1)
    )
    step = jax.jit(
        tasks.make_fit_decoder_step(
            model, optimizer, directions, sineweight, kld_weighting=1e-4
        )
    )
    state = tasks.init_train_state(model, params, optimizer, jax.random.PRNGKey(1))
    images = jax.random.normal(jax.random.PRNGKey(2), (batch, npix, 3), jnp.float32)
    batch_data = (images, jnp.arange(batch), jnp.ones((batch,), jnp.float32))

    # dependent chain (the state threads through) — same-input timing loops
    # are unreliable on tunneled chips (dedup/pipelining)
    dt, _ = benchmark_fn(lambda s: step(s, batch_data)[0], state, n=steps)
    return batch * npix / dt


def bench_torch_reference(batch: int = 10, width: int = 64, steps: int = 5) -> float:
    """Reference-equivalent computation in torch (CPU): concat SO2 encoding
    -> 6-layer SIREN -> tanh -> sineweighted MSE + KLD -> Adam step."""
    import math

    import torch

    torch.manual_seed(0)
    N, hidden, layers = 49, 256, 5
    in_features = 2 * N + N * N + 2
    npix = (width // 2) * width

    ws, bs = [], []
    dims = [in_features] + [hidden] * layers + [3]
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        bound = 1.0 / a if i == 0 else math.sqrt(6.0 / a) / 30.0
        ws.append(torch.empty(a, b).uniform_(-bound, bound).requires_grad_())
        bs.append(torch.zeros(b).requires_grad_())
    mu = torch.randn(batch, N, 3, requires_grad=True)
    log_var = torch.full((batch, N, 3), -5.0, requires_grad=True)

    u = (torch.arange(1, width + 1, dtype=torch.float32) - 0.5) / (width // 2)
    v = (torch.arange(1, width // 2 + 1, dtype=torch.float32) - 0.5) / (width // 2)
    vg, ug = torch.meshgrid(v, u, indexing="ij")
    theta, phi = math.pi * (ug.reshape(-1) - 1), math.pi * vg.reshape(-1)
    D = torch.stack(
        (torch.sin(phi) * torch.sin(theta), torch.cos(phi), -torch.sin(phi) * torch.cos(theta)),
        -1,
    )[None].repeat(batch, 1, 1)
    sw = torch.sin(phi)[None, :, None].repeat(batch, 1, 3)
    target = torch.randn(batch, npix, 3)

    opt = torch.optim.Adam([mu, log_var] + ws + bs, lr=1e-5)

    def train_step():
        opt.zero_grad()
        Z = mu + torch.randn_like(mu) * torch.exp(0.5 * log_var)
        Z_xz = torch.stack((Z[:, :, 0], Z[:, :, 2]), -1)
        D_xz = torch.stack((D[:, :, 0], D[:, :, 2]), -1)
        G = torch.bmm(Z_xz, Z_xz.transpose(1, 2)).flatten(1)[:, None].repeat(1, npix, 1)
        ip = torch.bmm(D_xz, Z_xz.transpose(1, 2))
        dn = (D[:, :, 0] ** 2 + D[:, :, 2] ** 2).sqrt()[..., None]
        zy = Z[:, :, 1][:, None].repeat(1, npix, 1)
        x = torch.cat((ip, G, dn, zy, D[:, :, 1][..., None]), 2)
        for w, b in zip(ws[:-1], bs[:-1]):
            x = torch.sin(30.0 * (x @ w + b))
        out = torch.tanh(x @ ws[-1] + bs[-1])
        mse = (((out - target) ** 2) * sw).view(batch, -1).mean(1).sum()
        kld = (
            -0.5 * (1 + log_var - mu**2 - log_var.exp()).view(batch, -1).sum(1) / (3 * N)
        ).sum()
        loss = mse + 1e-4 * kld
        loss.backward()
        opt.step()

    train_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        train_step()
    dt = time.perf_counter() - t0
    return batch * npix * steps / dt


def _arm_watchdog(timeout_s: float) -> None:
    """The tunneled TPU can wedge silently (a dispatch RPC that never
    returns; even jax.devices() in a fresh process blocks until the pool
    recovers). An unattended bench must emit SOMETHING rather than hang
    forever: after ``timeout_s`` with no completion, print an error JSON
    line and hard-exit 114 (same convention as the CLI's
    RENI_TPU_HANG_EXIT_S watchdog)."""
    import os
    import threading

    def watch():
        time.sleep(timeout_s)
        try:
            # a contended preempt_and_hold keeps its yield request alive
            # during the measurement; its finally never runs past os._exit,
            # so consume the request here rather than spuriously stopping
            # the NEXT chip job
            from reni_tpu.utils import chiplock

            stop = os.environ.get("RENI_TPU_STOP_FILE") or chiplock.DEFAULT_STOP
            if stop and os.path.exists(stop):
                os.remove(stop)
        except Exception:
            pass
        print(
            json.dumps(
                {
                    "metric": "directional_samples_per_sec_per_chip_siren_fwd_bwd",
                    "value": 0.0,
                    "unit": "samples/s/chip",
                    "vs_baseline": 0.0,
                    "error": f"bench exceeded {timeout_s:.0f}s — TPU "
                    "dispatch presumed wedged",
                }
            ),
            flush=True,
        )
        os._exit(114)

    threading.Thread(target=watch, daemon=True, name="bench-watchdog").start()


def _wait_for_pool(max_wait_s: float) -> None:
    """The axon pool goes UNAVAILABLE for stretches (observed: 2h+ on
    2026-08-19). A driver-launched bench should ride out a bounded amount
    of that rather than crash on the first backend-init failure. Probes
    ``jax.devices()`` in a fresh subprocess (the parent must not cache a
    failed backend init); returns as soon as a probe succeeds, or after
    ``max_wait_s`` — the bench then proceeds and reports whatever happens."""
    import os
    import subprocess

    deadline = time.monotonic() + max_wait_s
    first = True
    while True:
        try:
            ok = (
                subprocess.run(
                    [sys.executable, "-c", "import jax; jax.devices()"],
                    timeout=300,
                    capture_output=True,
                ).returncode
                == 0
            )
        except subprocess.TimeoutExpired:  # wedged pool: probe hangs
            ok = False
        if ok or time.monotonic() > deadline:
            return
        if first:
            print(
                "[bench] TPU pool unavailable; waiting up to "
                f"{max_wait_s:.0f}s for it to recover",
                file=sys.stderr,
                flush=True,
            )
            first = False
        time.sleep(30)


def main():
    import os

    from reni_tpu.utils import chiplock

    _wait_for_pool(float(os.environ.get("RENI_TPU_BENCH_WAIT_S", "900")))
    # the chip may be held by a long-running queue job (training chains,
    # benchmark sweeps): ask it to yield at its next segment boundary and
    # take the chip lock, so the headline measures an IDLE chip rather
    # than a timeshared one. No jax calls in there (wedge-safe); the
    # watchdog arms after, so lock waiting doesn't eat the bench budget.
    with chiplock.preempt_and_hold(
        wait_s=float(os.environ.get("RENI_TPU_BENCH_LOCK_WAIT_S", "1200")),
        what="bench",
    ) as exclusive:
        paths = _bench_tpu_paths()
    if paths is None:
        return 114
    # the torch CPU baseline needs no chip: run it AFTER releasing the
    # lock so a preempted queue trainer resumes while it grinds.
    # Headline = the published batch-100 protocol only — the FiLM and
    # saturated-batch figures are informational and must not leak into it
    headline_paths = ("xla_exact_sine", "xla_fast_sine", "pallas_fast_sine")
    value = max(v for k, v in paths.items() if k in headline_paths)
    try:
        baseline = bench_torch_reference()
        vs = value / baseline
    except Exception:
        vs = float("nan")
    record = {
        "metric": "directional_samples_per_sec_per_chip_siren_fwd_bwd",
        "value": round(value, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(vs, 2),
        "paths": {k: round(v, 1) for k, v in paths.items()},
    }
    if not exclusive:
        # another chip job never released the lock: the numbers above may
        # be timeshared — record that rather than report them as clean
        record["contended"] = True
    print(json.dumps(record))


def _bench_tpu_paths():
    """All chip-touching measurements (run under the chip lock); returns
    the per-path samples/s dict, or None after printing the error JSON."""
    import os

    _arm_watchdog(float(os.environ.get("RENI_TPU_BENCH_TIMEOUT_S", "1500")))
    # all shipped execution paths, so the record catches a regression in any
    # of them: xla exact-sine (reference numerics), xla fast-sine, pallas
    # fast-sine (the fused kernel, the CLI default on TPU), the fused FiLM
    # kernel, and the kernel at a saturating batch (PERF.md: the 512-tile
    # grid only fills the chip at batch >= ~400; the headline stays the
    # published-workload batch-100 protocol)
    paths = {}
    try:
        paths["xla_exact_sine"] = bench_jax()
    except Exception as e:  # pool down past the wait budget: still emit JSON
        print(
            json.dumps(
                {
                    "metric": "directional_samples_per_sec_per_chip_siren_fwd_bwd",
                    "value": 0.0,
                    "unit": "samples/s/chip",
                    "vs_baseline": 0.0,
                    "error": f"TPU backend unavailable: {type(e).__name__}: {e}"[:300],
                }
            ),
            flush=True,
        )
        return None
    try:
        paths["xla_fast_sine"] = bench_jax(fast_sine=True)
        paths["pallas_fast_sine"] = bench_jax(use_pallas=True, fast_sine=True)
    except Exception:
        pass  # non-TPU backends may lack the kernel path
    try:
        paths["pallas_fast_sine_film"] = bench_jax(
            use_pallas=True, fast_sine=True, conditioning="FiLM"
        )
        paths["pallas_saturated"] = bench_jax(
            batch=400, steps=8, use_pallas=True, fast_sine=True
        )
    except Exception:
        pass  # informational figures; keep the headline robust
    return paths


if __name__ == "__main__":
    sys.exit(main())
