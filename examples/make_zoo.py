"""Build the bundled pretrained zoo (data/Zoo) from scratch.

    python examples/make_zoo.py [--out data/Zoo] [--work /tmp/reni_zoo]

Reproduces the committed zero-egress model zoo — the analog of the
reference's Google-Drive pretrained zoo (reference src/utils/utils.py:93-103,
setup.py:5-11):

1. generate the synthetic SG-sky dataset (seed 7, 100 train / 21 test);
2. train the published flagship recipe (configs/zoo_synthetic.yaml:
   VAD, Cond-by-Concat, SO2, N=49, 5x256, tanh, full 2400-epoch
   curriculum to 64x128) with FIT_DECODER + FIT_LATENT;
3. package the FIT_DECODER best checkpoint, a cpu+tpu serving artifact,
   the fitted test latents, and the recipe into data/Zoo/<name>/.

The committed zoo lets the notebook, cli.serve and download_pretrained_models
work out of the box in a fresh checkout with zero downloads."""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

NAME = "reni_vad_cbc_so2_49_synthetic"


def best_checkpoint(ckpt_dir: str, task: str) -> str:
    """Lowest-loss saved checkpoint of a task (falls back to _final).

    The CLI keeps the best-2 periodic saves plus ``{task}_latest`` /
    ``{task}_final``; the training loss lives in each .json sidecar."""
    best, best_loss = None, float("inf")
    for j in glob.glob(os.path.join(ckpt_dir, f"{task}_*.json")):
        with open(j) as f:
            meta = json.load(f).get("metadata", {})
        loss = float(meta.get("loss", float("inf")))
        if loss < best_loss:
            best, best_loss = j[: -len(".json")] + ".npz", loss
    if best is None or not os.path.isfile(best):
        final = os.path.join(ckpt_dir, f"{task}_final.npz")
        if not os.path.isfile(final):
            raise FileNotFoundError(f"no {task} checkpoints under {ckpt_dir}")
        best = final
    return best


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.path.join(ROOT, "data", "Zoo"))
    ap.add_argument("--work", default="/tmp/reni_zoo")
    ap.add_argument("--skip_train", action="store_true",
                    help="package from an existing --work run (no training)")
    args = ap.parse_args(argv)

    data_dir = os.path.join(args.work, "data")
    ckpt_dir = os.path.join(args.work, "ckpts")
    cfg_path = os.path.join(args.work, "zoo.yaml")

    if not args.skip_train:
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "examples", "make_synthetic_dataset.py"),
             "--out", data_dir, "--train", "100", "--test", "21",
             "--width", "128", "--seed", "0"],
            check=True,
        )
        with open(os.path.join(ROOT, "configs", "zoo_synthetic.yaml")) as f:
            cfg = f.read()
        cfg = cfg.replace("/tmp/reni_zoo_data", data_dir)
        cfg = cfg.replace("/tmp/reni_zoo_ckpts", ckpt_dir)
        cfg = cfg.replace("/tmp/reni_zoo_runs", os.path.join(args.work, "runs"))
        with open(cfg_path, "w") as f:
            f.write(cfg)
        subprocess.run(
            [sys.executable, "-m", "reni_tpu.cli.run", "--cfg_path", cfg_path,
             "--retries", "4"],
            check=True, cwd=ROOT,
        )

    dec_best = best_checkpoint(ckpt_dir, "fit_decoder")

    out = os.path.join(args.out, NAME)
    os.makedirs(out, exist_ok=True)
    shutil.copy(dec_best, os.path.join(out, "checkpoint.npz"))
    shutil.copy(dec_best[: -len(".npz")] + ".json",
                os.path.join(out, "checkpoint.json"))
    try:
        lat_best = best_checkpoint(ckpt_dir, "fit_latent")
        shutil.copy(lat_best, os.path.join(out, "latents_test.npz"))
        shutil.copy(lat_best[: -len(".npz")] + ".json",
                    os.path.join(out, "latents_test.json"))
    except FileNotFoundError:
        pass
    shutil.copy(os.path.join(ROOT, "configs", "zoo_synthetic.yaml"),
                os.path.join(out, "config.yaml"))

    from reni_tpu.serve import export_from_checkpoint

    export_from_checkpoint(
        os.path.join(out, "checkpoint.npz"),
        os.path.join(out, "decoder.jaxexport"),
        platforms=("cpu", "tpu"),
    )

    sizes = {
        f: os.path.getsize(os.path.join(out, f)) for f in sorted(os.listdir(out))
    }
    print(json.dumps({"zoo": out, "bytes": sizes}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
