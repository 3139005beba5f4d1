"""RENI as an illumination prior — the downstream-usage recipe.

This is the TPU-native analog of the reference's examples.ipynb cell 4
("RENI as a prior for masked in-painting"): load a trained decoder with a
fresh latent table, freeze it, and optimise latents for new (possibly
masked) observations with the test loss.

    python examples/fit_prior.py --checkpoint runs/.../fit_decoder_final \
        --image path/to/env.exr [--mask path/to/mask.png]

Without --checkpoint the script trains a small decoder on synthetic data
first, so it is runnable end-to-end anywhere (CPU included).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from reni_tpu.core import sphere
from reni_tpu.models.reni import RENIConfig, RENIModel, replace_latents
from reni_tpu.train import checkpoint as ckpt
from reni_tpu.train import tasks
from reni_tpu.train.optim import OptimConfig


def demo_decoder(width: int):
    """Train a tiny decoder on synthetic band-limited env maps."""
    model = RENIModel(
        RENIConfig(
            model_type="VariationalAutoDecoder",
            equivariance="SO2",
            latent_dim=9,
            hidden_layers=2,
            hidden_features=64,
            output_activation=None,
        )
    )
    d = np.asarray(sphere.get_directions(width))[0]
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        np.stack(
            [np.tanh(d @ rng.normal(size=(3, 3))) for _ in range(8)]
        ).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), dataset_size=8)
    cfg = tasks.TaskConfig(
        task="FIT_DECODER",
        optim=OptimConfig(lr_start=1e-3, lr_end=1e-4, beta1=0.9, beta2=0.999),
        batch_size=8,
        epochs=400,
        multi_res_training=False,
        final_resolution=(width // 2, width),
    )
    params, _ = tasks.fit_task(
        model, params, cfg, lambda r: images, jax.random.PRNGKey(1)
    )
    return model, params, images


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--checkpoint", default=None,
        help="trained decoder checkpoint; 'zoo' or 'zoo:<name>' resolves "
        "the bundled pretrained zoo (data/Zoo)",
    )
    ap.add_argument("--image", default=None, help="target env map (.exr/.hdr/.png)")
    ap.add_argument("--mask", default=None, help="binary mask PNG (1=observed)")
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--steps", type=int, default=400)
    args = ap.parse_args()

    width = args.width
    if args.checkpoint and args.checkpoint.split(":", 1)[0] == "zoo":
        from reni_tpu.utils import assets

        _, _, name = args.checkpoint.partition(":")
        if not name:
            # bare "zoo" resolves to the best measured prior (highest
            # test-PSNR eval card), not the alphabetical first
            name = assets.zoo_default()
            if name is None:
                raise FileNotFoundError("no bundled zoo in this checkout")
        args.checkpoint = assets.zoo_checkpoint(name)
        print(f"using bundled zoo model {name}: {args.checkpoint}")
    # --- 1. a trained, frozen decoder ------------------------------------
    if args.checkpoint:
        cfg = ckpt.load_model_config(args.checkpoint, fixed_decoder=True)
        model = RENIModel(cfg)
        n_targets = 1
        params = ckpt.load_decoder_only(
            args.checkpoint, model, n_targets, jax.random.PRNGKey(0)
        )
        target = None
    else:
        base_model, base_params, images = demo_decoder(width)
        cfg = RENIConfig(
            **{**base_model.config.__dict__, "fixed_decoder": True}
        )
        model = RENIModel(cfg)
        params = replace_latents(model, base_params, jax.random.PRNGKey(2), 1)
        target = images[:1]  # pretend the first training image is "new"

    # --- 2. the observation ------------------------------------------------
    if args.image:
        from reni_tpu.data.datasets import read_hdr, read_ldr

        reader = read_hdr if args.image.lower().endswith((".exr", ".hdr")) else read_ldr
        from reni_tpu.data.transforms import resize_bilinear

        img = resize_bilinear(reader(args.image), width // 2, width)
        target = jnp.asarray(img.reshape(1, -1, 3))
    assert target is not None, "--image required with --checkpoint"

    sineweight = sphere.get_sineweight(width)
    if args.mask:
        sineweight = sineweight * sphere.get_mask(width, args.mask)

    # --- 3. optimise only the latent code through the frozen decoder ------
    directions = sphere.get_directions(width)
    from reni_tpu.train.optim import build_optimizer

    opt = build_optimizer(
        OptimConfig(lr_start=1e-1, lr_end=1e-2, epochs=args.steps, steps_per_epoch=1)
    )
    step = jax.jit(
        tasks.make_fit_latent_step(
            model, opt, directions, sineweight, alpha=1e-7, beta=1e-1
        )
    )
    state = tasks.init_train_state(model, params, opt, jax.random.PRNGKey(3))
    batch = (target, jnp.asarray([0]), jnp.asarray([1.0]))
    for i in range(args.steps):
        state, metrics = step(state, batch)
        if i % 100 == 0:
            print(f"step {i}: loss={float(metrics['loss']):.5f}")

    # --- 4. decode the fitted latent anywhere on the sphere ----------------
    Z = model.latents(state.params, jnp.asarray([0]))
    recon = model.apply(state.params, Z, directions)
    err = float(jnp.abs(recon - target).mean())
    print(f"final mean abs error: {err:.4f}")

    # rotation equivariance: rotating the latent rotates the illumination
    r = jnp.asarray(sphere.rotation_y(np.pi / 4).astype(np.float32))
    rotated = model.apply(state.params, Z @ r, directions)
    print(f"decoded rotated illumination: {rotated.shape}")


if __name__ == "__main__":
    main()
