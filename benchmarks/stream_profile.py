"""Phase-level profile of ONE streaming optimizer step at flagship shapes
(VERDICT r4 next-#1a): where does the streaming tiers' per-step overhead
live — host gather, host->device transfer, dispatch RTT, or compute?

Usage: python benchmarks/stream_profile.py  (TPU; takes the chip lock)
Writes /tmp/stream_profile.json and prints it.

Measures, with explicit block_until_ready barriers between phases so each
cost is attributed (the streaming runner overlaps them in production —
this is an ATTRIBUTION probe, not a throughput number):
  - null-dispatch RTT (tiny jitted add, dependent chain)
  - device_put bandwidth at the batch size (9.8 MB) and 8x that
  - host fancy-index gather of a batch from the (S, P, 3) array
  - the jitted step on a staged batch (dependent chain)
  - one UNPIPELINED streaming step (gather + put + step, serialized)
  - the production streaming runner's steady rate over 2 epochs
    (double-buffered), for reference against stream_bench.json
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from reni_tpu.core import sphere
from reni_tpu.models.reni import RENIConfig, RENIModel
from reni_tpu.train import tasks
from reni_tpu.train.optim import OptimConfig, build_optimizer
from reni_tpu.utils import chiplock
from reni_tpu.utils.profiling import benchmark_fn

S, B, width, N, layers, hidden = 4000, 100, 128, 49, 5, 256

results = {}


def main():
    model = RENIModel(
        RENIConfig(
            model_type="VariationalAutoDecoder",
            conditioning="Cond-by-Concat",
            equivariance="SO2",
            latent_dim=N,
            hidden_layers=layers,
            hidden_features=hidden,
            output_activation="tanh",
            use_pallas=True,
            fast_sine=True,
        )
    )
    params = model.init(jax.random.PRNGKey(0), dataset_size=S)
    directions = sphere.get_directions(width)
    sineweight = sphere.get_sineweight(width)
    P = directions.shape[1]
    nb = -(-S // B)
    optimizer = build_optimizer(
        OptimConfig(lr_start=1e-5, lr_end=1e-7, epochs=100, steps_per_epoch=nb)
    )
    step_fn = tasks.make_fit_decoder_step(
        model, optimizer, directions, sineweight, kld_weighting=1e-4
    )
    rng = np.random.default_rng(1)
    images = rng.normal(size=(S, P, 3)).astype(np.float32) * 0.1
    state = tasks.init_train_state(model, params, optimizer, jax.random.PRNGKey(2))
    idx, bmask = tasks.make_batches(S, B)

    # --- null dispatch RTT (dependent chain of tiny jitted adds) --------
    tiny = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    x = tiny(x).block_until_ready()  # compile
    dt, _ = benchmark_fn(tiny, x, n=20)
    results["null_dispatch_ms"] = round(dt * 1e3, 3)
    print("null_dispatch", results["null_dispatch_ms"], flush=True)

    # --- device_put bandwidth -------------------------------------------
    batch_host = np.ascontiguousarray(images[idx[0]])
    for name, arr in (
        ("put_batch_9p8MB", batch_host),
        ("put_8batches_79MB", np.ascontiguousarray(images[: 8 * B])),
    ):
        jax.device_put(arr).block_until_ready()  # warm path
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            jax.device_put(arr).block_until_ready()
        per = (time.perf_counter() - t0) / n
        results[name] = {
            "ms": round(per * 1e3, 2),
            "MB_per_s": round(arr.nbytes / per / 1e6, 1),
        }
        print(name, results[name], flush=True)

    # --- host gather ------------------------------------------------------
    t0 = time.perf_counter()
    n = 20
    for k in range(n):
        _ = images[idx[k % nb]]
    results["host_gather_ms"] = round((time.perf_counter() - t0) / n * 1e3, 3)
    print("host_gather", results["host_gather_ms"], flush=True)

    # --- jitted step on a staged batch (dependent chain) ----------------
    jstep = jax.jit(step_fn)
    buf = jax.device_put(batch_host)
    idx_d = jax.device_put(jnp.asarray(idx[0]))
    bm_d = jax.device_put(jnp.asarray(bmask[0]))
    st, _ = jstep(state, (buf, idx_d, bm_d))
    jax.block_until_ready(st)  # compile
    dt, _ = benchmark_fn(lambda s: jstep(s, (buf, idx_d, bm_d))[0], st, n=10)
    results["staged_step_ms"] = round(dt * 1e3, 2)
    print("staged_step", results["staged_step_ms"], flush=True)

    # --- one unpipelined streaming step (serialized phases) -------------
    t0 = time.perf_counter()
    n = 10
    s = st
    for k in range(n):
        hb = images[idx[k % nb]]
        db = jax.device_put(hb)
        jax.block_until_ready(db)
        s, _ = jstep(s, (db, idx_d, bm_d))
        jax.block_until_ready(s.trainable["latents"]["mu"])
    results["serialized_stream_step_ms"] = round(
        (time.perf_counter() - t0) / n * 1e3, 2
    )
    print("serialized_stream_step", results["serialized_stream_step_ms"], flush=True)

    # --- transfer-stall sweep: an UNCONSUMED put of S bytes interleaved
    # with staged steps isolates the tunnel's per-byte dispatch-pipeline
    # stall (the r5 discovery: ~40-46 ms/MB regardless of consumption;
    # PERF.md "streaming is TRANSFER-bound") ---------------------------------
    for rows_n in (25, 100, 400):
        arr = np.ascontiguousarray(images[:rows_n])
        t0 = time.perf_counter()
        s = st
        n = 6
        for k in range(n):
            jax.device_put(arr)  # unconsumed: pure pipeline-stall cost
            s, _ = jstep(s, (buf, idx_d, bm_d))
        jax.block_until_ready(s.trainable["latents"]["mu"])
        per = (time.perf_counter() - t0) / n * 1e3
        key = f"stall_put{arr.nbytes >> 20}MB_step_ms"
        results[key] = round(per, 1)
        print(key, results[key], flush=True)

    # --- the production double-buffered runner over 2 epochs ------------
    run1 = tasks.streaming_stage_runner()
    s2, _ = run1(step_fn, state, images, 1, B)  # warm-up epoch (compiles)
    jax.block_until_ready(s2.trainable["latents"]["mu"])
    t0 = time.perf_counter()
    s3, _ = run1(step_fn, s2, images, 2, B)
    jax.block_until_ready(s3.trainable["latents"]["mu"])
    wall = time.perf_counter() - t0
    results["runner_stream_step_ms"] = round(wall / (2 * nb) * 1e3, 2)
    results["runner_samples_per_s"] = round(2 * nb * B * P / wall, 0)

    print(json.dumps(results, indent=1))
    with open("/tmp/stream_profile.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    with chiplock.hold_chip_lock(
        chiplock.trainer_lock_path(), what="stream_profile"
    ):
        main()
