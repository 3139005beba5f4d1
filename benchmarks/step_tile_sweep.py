"""Tile-size and conditioning sweep of the single-launch fused train step
(r5): is 512 still the right pixel tile once fwd+loss+bwd share one
kernel, and what does the FiLM twin measure?

Usage: python benchmarks/step_tile_sweep.py  (TPU; takes the chip lock)
Prints one JSON line; each timing is a dependent chain through the full
jitted optimizer step (state threads), batch 400 @ 64x128.
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from reni_tpu.core import sphere
from reni_tpu.models.reni import RENIConfig, RENIModel
from reni_tpu.train import tasks
from reni_tpu.train.optim import OptimConfig, build_optimizer
from reni_tpu.utils import chiplock
from reni_tpu.utils.profiling import benchmark_fn


def time_step(conditioning: str, tile_env: int, batch: int = 400) -> float:
    import os

    os.environ["RENI_TPU_PALLAS_TILE"] = str(tile_env)
    model = RENIModel(
        RENIConfig(
            model_type="VariationalAutoDecoder",
            conditioning=conditioning,
            equivariance="SO2",
            latent_dim=49,
            hidden_layers=5,
            hidden_features=256,
            output_activation="tanh",
            use_pallas=True,
            fast_sine=True,
        )
    )
    params = model.init(jax.random.PRNGKey(0), dataset_size=batch)
    directions = sphere.get_directions(128)
    sineweight = sphere.get_sineweight(128)
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
    dt, _ = benchmark_fn(lambda s: step(s, batch_data)[0], state, n=8)
    return batch * npix / dt


def main():
    out = {}
    for tile in (256, 512, 1024):
        try:
            out[f"cbc_tile{tile}"] = round(time_step("Cond-by-Concat", tile), 0)
        except Exception as e:  # VMEM overflow etc: record, keep sweeping
            out[f"cbc_tile{tile}"] = f"failed: {type(e).__name__}"
        print(f"cbc_tile{tile}", out[f"cbc_tile{tile}"], flush=True)
    for tile in (512,):
        try:
            out[f"film_tile{tile}"] = round(time_step("FiLM", tile), 0)
        except Exception as e:
            out[f"film_tile{tile}"] = f"failed: {type(e).__name__}"
        print(f"film_tile{tile}", out[f"film_tile{tile}"], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    with chiplock.hold_chip_lock(
        chiplock.trainer_lock_path(), what="step_tile_sweep"
    ):
        main()
