"""Dataset / pretrained-model asset management.

The reference fetches its datasets and model zoo from Google Drive via gdown
(reference: src/data/datasets.py:31-41,117-127; src/utils/utils.py:93-103;
setup.py:5-11). This build runs in zero-egress environments, so the same
entry points exist but resolve strictly locally: they verify presence and
explain how to provision, instead of downloading.

Also carries the reference's device-selection helper analog
(utils.py:9-28): on JAX the accelerator is chosen by the platform, so
`select_device` just reports it.
"""

from __future__ import annotations

import os

DATASET_HINTS = {
    "RENI_HDR": "the RENI HDR dataset (Train/ and Test/ folders of .exr equirectangular maps)",
    "RENI_LDR": "the RENI LDR dataset (Train/ and Test/ folders of .png equirectangular maps)",
}


def download_data(config) -> None:
    """API-parity hook for the reference's prepare_data (datasets.py:161-166).

    Verifies the configured dataset exists locally; raises with provisioning
    instructions otherwise (no network access is assumed)."""
    name = config.DATASET.NAME
    path = config.DATASET[name].PATH
    if name == "CUSTOM" or os.path.isdir(path):
        return
    hint = DATASET_HINTS.get(name, "the dataset")
    raise FileNotFoundError(
        f"dataset path {path!r} not found. Place {hint} there (the reference "
        "implementation's setup.py documents the published Google Drive "
        "archives), or point DATASET.{name}.PATH at an existing copy."
    )


def download_pretrained_models(output_path: str) -> None:
    """API-parity hook for utils.py:93-103; local-only."""
    if os.path.isdir(output_path) and os.listdir(output_path):
        return
    raise FileNotFoundError(
        f"no pretrained models at {output_path!r}. Convert reference "
        "checkpoints with reni_tpu.utils.convert.load_reference_checkpoint, "
        "or train with reni_tpu.cli.run."
    )


def select_device():
    """The reference shells out to nvidia-smi to pick the freest GPU
    (utils.py:9-28); under JAX the runtime owns placement — return the
    default device for logging."""
    import jax

    d = jax.devices()[0]
    print(f"Using {d.platform}: {d}")
    return d
