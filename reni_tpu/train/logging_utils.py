"""Metrics and image logging: JSONL always, TensorBoard when available.

Replaces the reference's PL TensorBoard/W&B logging (reference: run.py:32-59,
src/lightning/RENI_module.py:148-163) with the same metric names
(``{task}_loss`` etc.) so dashboards are comparable. Scalars are recorded to
``metrics.jsonl`` unconditionally; TensorBoard event files are written via
torch.utils.tensorboard when importable.
"""

from __future__ import annotations

import json
import os

import numpy as np


class MetricLogger:
    def __init__(
        self,
        log_dir: str,
        use_tensorboard: bool = True,
        wandb_config: dict | None = None,
        enabled: bool = True,
    ):
        """wandb_config: the reference's TRAINER.LOGGER.WANDB block
        (run.py:33-41) — used when the wandb package is importable.

        enabled=False makes every method a no-op and touches no files —
        the non-primary processes of a multi-host job (the reference logs
        from rank 0 only; PL does this implicitly)."""
        self.log_dir = log_dir
        self.enabled = enabled
        self._jsonl = None
        self._tb = None
        self._wandb = None
        if not enabled:
            return
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        if wandb_config is not None:
            try:
                import wandb

                self._wandb = wandb.init(
                    name=wandb_config.get("NAME"),
                    project=wandb_config.get("PROJECT"),
                    dir=wandb_config.get("SAVE_DIR"),
                    mode="offline" if wandb_config.get("OFFLINE") else "online",
                    config=wandb_config.get("run_config"),
                )
            except Exception:
                self._wandb = None
        if use_tensorboard and self._wandb is None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def log_scalars(self, step: int, scalars: dict) -> None:
        if not self.enabled:
            return
        rec = {"step": int(step)}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), int(step))
        if self._wandb is not None:
            self._wandb.log({k: float(v) for k, v in scalars.items()}, step=int(step))

    def log_image(self, tag: str, image_hwc: np.ndarray, step: int) -> None:
        """image_hwc: (H, W, 3) float in [0, 1]. Saved as PNG + TB image."""
        if not self.enabled:
            return
        from PIL import Image

        arr = np.clip(np.asarray(image_hwc), 0.0, 1.0)
        img8 = (arr * 255).astype(np.uint8)
        imgdir = os.path.join(self.log_dir, "images")
        os.makedirs(imgdir, exist_ok=True)
        Image.fromarray(img8).save(os.path.join(imgdir, f"{tag}_{step:06d}.png"))
        if self._tb is not None:
            self._tb.add_image(tag, img8, int(step), dataformats="HWC")
        if self._wandb is not None:
            import wandb

            self._wandb.log({tag: wandb.Image(img8)}, step=int(step))

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()


def make_grid(
    images: np.ndarray, nrow: int = 5, pad: int = 2, pad_value: float = 2.0
) -> np.ndarray:
    """(B, H, W, 3) -> tiled (H', W', 3) grid (torchvision make_grid layout,
    callbacks.py:50,127)."""
    images = np.asarray(images)
    b, h, w, c = images.shape
    ncol = min(nrow, b)
    nrows = -(-b // ncol)
    grid = np.full(
        (nrows * (h + pad) + pad, ncol * (w + pad) + pad, c),
        pad_value,
        dtype=images.dtype,
    )
    for i in range(b):
        r, col = divmod(i, ncol)
        y, x = pad + r * (h + pad), pad + col * (w + pad)
        grid[y : y + h, x : x + w] = images[i]
    return grid
