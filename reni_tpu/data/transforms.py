"""Image transforms with the reference's exact numerics
(reference: src/utils/custom_transforms.py).

The HDR path is the load-bearing one (SURVEY §7 "hard parts"): per-image clip
to [smallest positive, largest finite] -> log -> affine scale to [-1, 1] by a
*dataset-level* log-domain min/max (custom_transforms.py:4-12), inverted by
`UnMinMaxNormalise` (:14-21). The dataset min/max discovery pass reproduces
datasets.py:90-101 exactly.

Transforms here are host-side numpy (they run once at dataset load, not in
the train loop); the normalisation forward/inverse also exist as jnp
functions for on-device use (e.g. unnormalising decoder output inside the
inverse-rendering step).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class MinMaxNormalise:
    """clip -> log -> scale to [-1, 1] by log-domain (min, max)."""

    def __init__(self, minmax):
        self.minmax = tuple(minmax) if len(minmax) else None

    def __call__(self, img: np.ndarray) -> np.ndarray:
        if self.minmax is None:
            raise ValueError("minmax not resolved; run dataset min/max discovery")
        img = clip_positive_finite(img)
        img = np.log(img)
        lo, hi = self.minmax
        return 2.0 * (img - lo) / (hi - lo) - 1.0


class UnMinMaxNormalise:
    """Inverse of MinMaxNormalise: rescale -> exp. Works on numpy or jnp."""

    def __init__(self, minmax):
        self.minmax = tuple(minmax)

    def __call__(self, img):
        lo, hi = self.minmax
        xp = jnp if isinstance(img, jnp.ndarray) else np
        return xp.exp(0.5 * (img + 1.0) * (hi - lo) + lo)


class Normalise:
    """Channel-wise (x - mean) / std on (..., 3) arrays (LDR path)."""

    def __init__(self, mean, std):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    def __call__(self, img: np.ndarray) -> np.ndarray:
        return (img - self.mean) / self.std


class UnNormalise:
    """Inverse channel normalisation; accepts channel-last (..., C) or the
    reference's channel-first (B, C, H, W) layout (custom_transforms.py:23-39)."""

    def __init__(self, mean, std):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    def __call__(self, img):
        c = self.mean.shape[0]
        if img.ndim == 4 and img.shape[1] == c and img.shape[-1] != c:
            mean = self.mean.reshape(1, c, 1, 1)
            std = self.std.reshape(1, c, 1, 1)
            return img * std + mean
        return img * self.std + self.mean


def clip_positive_finite(img: np.ndarray) -> np.ndarray:
    """Per-image clip to [min positive value, max finite value]
    (custom_transforms.py:9, datasets.py:95)."""
    positive = img[img > 0.0]
    finite = img[np.isfinite(img)]
    lo = positive.min() if positive.size else np.float32(1e-30)
    hi = finite.max() if finite.size else np.float32(1.0)
    return np.clip(img, lo, hi)


def resize_bilinear(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """Bilinear resize without antialias, half-pixel centers — matches
    torchvision's tensor-mode Resize used by the reference."""
    import cv2

    return cv2.resize(img, (width, height), interpolation=cv2.INTER_LINEAR)


def compute_log_minmax(images) -> tuple[float, float]:
    """Dataset min/max discovery in log domain (datasets.py:90-101):
    per-image clip then log; global min of mins / max of maxes."""
    lo, hi = np.inf, -np.inf
    for img in images:
        x = np.log(clip_positive_finite(np.asarray(img)))
        lo = min(lo, float(x.min()))
        hi = max(hi, float(x.max()))
    return lo, hi


# ---------------------------------------------------------------------------
# registry (name -> transform), mirroring custom_transforms.py:41-71
# ---------------------------------------------------------------------------


def get_transform(name: str, args):
    name = name.lower()
    if name == "resize":
        return lambda img: resize_bilinear(img, args[0], args[1])
    if name == "centercrop":
        size = args if isinstance(args, (list, tuple)) else (args, args)

        def crop(img):
            h, w = img.shape[:2]
            th, tw = size
            i, j = (h - th) // 2, (w - tw) // 2
            return img[i : i + th, j : j + tw]

        return crop
    if name == "grayscale":
        return lambda img: np.repeat(
            (0.2989 * img[..., :1] + 0.587 * img[..., 1:2] + 0.114 * img[..., 2:3]),
            1,
            axis=-1,
        )
    if name == "normalize":
        return Normalise(args[0], args[1])
    if name in ("minmaxnormalise", "minmaxormalise"):  # reference typo alias
        return MinMaxNormalise(args)
    raise ValueError(f"unsupported transform {name!r}")


def transform_builder(transform_config):
    """[(name, args), ...] -> composed callable (custom_transforms.py:73-78)."""
    fns = [get_transform(n, a) for n, a in transform_config]

    def composed(img):
        for f in fns:
            img = f(img)
        return img

    return composed
