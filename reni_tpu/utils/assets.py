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


def bundled_zoo_dir() -> str | None:
    """Path of the committed model zoo (``data/Zoo``), or None.

    The reference downloads its pretrained zoo from Google Drive
    (utils.py:93-103); this build COMMITS a small zero-egress zoo instead:
    the published flagship recipe trained on the in-repo synthetic SG-sky
    dataset (configs/zoo_synthetic.yaml). Resolved relative to the repo
    checkout; absent in a bare wheel install."""
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    zoo = os.path.join(root, "data", "Zoo")
    return zoo if os.path.isdir(zoo) else None


def zoo_models() -> dict:
    """name -> directory of every bundled pretrained model. Each directory
    holds ``checkpoint.npz`` (decoder + fitted latents, loadable with
    train.checkpoint.load_checkpoint / the notebook recipe),
    ``decoder.jaxexport`` (cpu+tpu serving artifact for cli.serve), and
    ``config.yaml`` (the exact training recipe)."""
    zoo = bundled_zoo_dir()
    if zoo is None:
        return {}
    return {
        name: os.path.join(zoo, name)
        for name in sorted(os.listdir(zoo))
        if os.path.isfile(os.path.join(zoo, name, "checkpoint.npz"))
    }


def zoo_default() -> str | None:
    """Name of the best bundled prior: the entry whose ``eval.json``
    (the cli.evaluate report make_zoo measures at packaging time) has the
    highest test PSNR. Entries without an eval card rank last; ties and the
    no-eval fallback resolve alphabetically. None when the zoo is absent."""
    import json

    models = zoo_models()
    if not models:
        return None

    def psnr(item):
        name, d = item
        card = os.path.join(d, "eval.json")
        try:
            with open(card) as f:
                return float(json.load(f).get("psnr_mean", float("-inf")))
        except (OSError, ValueError, TypeError):
            # TypeError: a card with "psnr_mean": null ranks last, not crash
            return float("-inf")

    return max(sorted(models.items()), key=psnr)[0]


def zoo_checkpoint(name: str) -> str:
    """Checkpoint path of a bundled model; raises with the available names."""
    models = zoo_models()
    if name not in models:
        raise FileNotFoundError(
            f"no bundled model {name!r}; available: {sorted(models)} "
            "(data/Zoo in the repo checkout)"
        )
    return os.path.join(models[name], "checkpoint.npz")


def download_pretrained_models(output_path: str) -> None:
    """API-parity hook for utils.py:93-103; local-only.

    The reference gdown-fetches its zoo here; this provisions the bundled
    in-repo zoo into ``output_path`` (copy), or raises with instructions
    when neither exists."""
    if os.path.isdir(output_path) and os.listdir(output_path):
        return
    models = zoo_models()
    if models:
        import shutil

        os.makedirs(output_path, exist_ok=True)
        for name, src in models.items():
            shutil.copytree(src, os.path.join(output_path, name), dirs_exist_ok=True)
        return
    raise FileNotFoundError(
        f"no pretrained models at {output_path!r} and no bundled zoo found. "
        "Convert reference checkpoints with "
        "reni_tpu.utils.convert.load_reference_checkpoint, or train with "
        "reni_tpu.cli.run."
    )


def select_device():
    """The reference shells out to nvidia-smi to pick the freest GPU
    (utils.py:9-28); under JAX the runtime owns placement — return the
    default device for logging."""
    import jax

    d = jax.devices()[0]
    print(f"Using {d.platform}: {d}")
    return d
