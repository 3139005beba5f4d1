"""Generate a synthetic HDR environment-map dataset (SG-mixture skies).

    python examples/make_synthetic_dataset.py --out /tmp/reni_synth \
        [--train 100] [--test 21] [--width 128] [--seed 0]

Writes Train/ and Test/ folders of equirectangular EXRs shaped like natural
illumination: an elevation-graded ambient sky, a few broad colored
spherical-Gaussian lobes (clouds/bounce), a small high-intensity sun lobe,
and a darker ground hemisphere. Used for the PERF.md published-scale runs
and the latent-dimension sweep — the repo has no dataset downloads by
design (zero egress), so experiments run on these skies.

The maps are plausible but out-of-family for the RENI paper's captured HDR
dataset; PSNR numbers on them are for cross-path comparisons, not paper
parity.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_sky(rng: np.random.Generator, width: int = 128) -> np.ndarray:
    """One synthetic HDR sky (width//2, width, 3), float32, radiance > 0."""
    from reni_tpu.core import sphere

    h = width // 2
    dirs = np.asarray(sphere.get_directions(width))[0].reshape(h, width, 3)
    up = dirs[..., 1]  # y-up elevation

    # ambient: horizon-to-zenith gradient with a random tint
    zen = np.asarray(rng.uniform(0.4, 1.2, size=3)) * np.asarray([0.5, 0.7, 1.0])
    hor = np.asarray(rng.uniform(0.3, 1.0, size=3))
    t = np.clip(up, 0.0, 1.0)[..., None]
    img = (1 - t) * hor + t * zen

    # broad SG lobes (clouds / environment bounce)
    for _ in range(rng.integers(3, 7)):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        sharp = rng.uniform(2.0, 12.0)
        amp = rng.uniform(0.2, 1.5, size=3)
        img += amp * np.exp(sharp * (dirs @ axis - 1.0))[..., None]

    # sun: sharp, very bright, above the horizon
    sun = rng.normal(size=3)
    sun[1] = abs(sun[1]) + 0.2
    sun /= np.linalg.norm(sun)
    sun_amp = rng.uniform(50.0, 2000.0)
    sun_col = np.asarray([1.0, rng.uniform(0.7, 1.0), rng.uniform(0.4, 0.9)])
    img += sun_amp * sun_col * np.exp(rng.uniform(80, 400) * (dirs @ sun - 1.0))[..., None]

    # ground hemisphere: darker albedo-like color
    ground = np.asarray(rng.uniform(0.05, 0.4, size=3))
    img = np.where(up[..., None] < 0.0, img * 0.15 + ground, img)
    return np.maximum(img, 1e-6).astype(np.float32)


def tonemap_ldr(img: np.ndarray) -> np.ndarray:
    """HDR sky -> 8-bit LDR frame: exposure to the 98th-percentile radiance
    (an auto-exposed camera clipping the sun), then the sRGB OETF.

    Deliberately NOT ``core.sphere.srgb``: that function preserves the
    reference's nested per-axis-quantile display quirk (utils.py:30-42) for
    parity of LOGGED images, whereas this is a camera model producing a
    DATASET — a flat global quantile is the honest auto-exposure. The
    committed LDR zoo entries were generated with this transform; changing
    it changes the zoo recipe."""
    x = img / max(float(np.quantile(img, 0.98)), 1e-12)
    x = np.clip(x, 0.0, 1.0)
    x = np.where(x <= 0.0031308, 12.92 * x, 1.055 * x ** (1.0 / 2.4) - 0.055)
    return np.round(x * 255.0).astype(np.uint8)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--train", type=int, default=100)
    ap.add_argument("--test", type=int, default=21)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ldr", action="store_true",
                    help="write tonemapped 8-bit PNGs (RENI_LDR datasets) "
                    "instead of HDR EXRs; same --seed => the same skies")
    ap.add_argument("--pixel_type", default="half", choices=["half", "float"],
                    help="EXR channel type (float = exact f32 roundtrip)")
    ap.add_argument("--compression", default="ZIP",
                    choices=["NONE", "RLE", "ZIPS", "ZIP", "PIZ", "PXR24",
                             "B44", "B44A", "DWAA", "DWAB"],
                    help="EXR compression (NONE is ~2x faster to stage and "
                    "the fastest to decode — used for the beyond-HBM "
                    "out-of-core runs)")
    args = ap.parse_args(argv)

    from reni_tpu.data import exr

    rng = np.random.default_rng(args.seed)
    for split, n in (("Train", args.train), ("Test", args.test)):
        d = os.path.join(args.out, split)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            sky = make_sky(rng, args.width)
            if args.ldr:
                from PIL import Image

                Image.fromarray(tonemap_ldr(sky)).save(
                    os.path.join(d, f"sky_{i:04d}.png")
                )
            else:
                exr.write(os.path.join(d, f"sky_{i:04d}.exr"), sky,
                          pixel_type=args.pixel_type,
                          compression=args.compression)
        kind = "PNGs" if args.ldr else "EXRs"
        print(f"{split}: {n} {kind} at {args.width // 2}x{args.width} -> {d}")


if __name__ == "__main__":
    main()
