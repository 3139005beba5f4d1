"""Build the bundled pretrained zoo matrix (data/Zoo) from scratch.

    python examples/make_zoo.py [--out data/Zoo] [--work /tmp/reni_zoo4]
                                [--entries name1,name2] [--skip_train]

Reproduces the committed zero-egress model zoo — the analog of the
reference's Google-Drive pretrained matrix (reference run.py:44-49,
src/utils/utils.py:93-103, setup.py:5-11), using the reference's naming
scheme ``latent_dim_{N}_net_{L}_{H}_{vad|ad}_{cbc|film}_{act}_{hdr|ldr}``:

1. generate the synthetic SG-sky prior (seed 1, 1000 train / 21 test —
   the PERF.md "1000-map prior"; the LDR variant tonemaps the same skies);
2. per entry, train the published flagship recipe
   (configs/zoo_synthetic.yaml schedule: 2400-epoch FIT_DECODER +
   FIT_LATENT, curriculum to 64x128) with the entry's model overrides;
3. package the lowest-loss FIT_DECODER checkpoint, the fitted test
   latents, a cpu+tpu serving artifact, the recipe, and an eval.json
   (cli.evaluate report) into data/Zoo/<name>/.

The committed zoo lets the notebook, cli.serve and
download_pretrained_models work out of the box in a fresh checkout with
zero downloads; ``assets.zoo_default()`` picks the entry with the best
measured test PSNR."""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# the zoo matrix: both conditionings, both latent capacities the PERF.md
# prior-scaling table measures, the LDR chain, the non-variational (ad)
# chain and the exp-activation chain (reference run.py:44-49 ships
# {36,49,...} x {vad,ad} x {cbc,film} x {hdr,ldr} with tanh/exp activation
# naming; this matrix covers every axis that changes behaviour —
# conditioning, capacity, dynamic range, model type, output activation)
ENTRIES = [
    {"latent_dim": 49, "conditioning": "Cond-by-Concat", "dataset": "hdr"},
    {"latent_dim": 100, "conditioning": "Cond-by-Concat", "dataset": "hdr"},
    {"latent_dim": 49, "conditioning": "FiLM", "dataset": "hdr"},
    {"latent_dim": 49, "conditioning": "Cond-by-Concat", "dataset": "ldr"},
    {"latent_dim": 49, "conditioning": "Cond-by-Concat", "dataset": "hdr",
     "model_type": "AutoDecoder"},
    {"latent_dim": 49, "conditioning": "Cond-by-Concat", "dataset": "hdr",
     "output_activation": "exp"},
]

SEED = 1  # the PERF.md 1000-map prior ("fresh seed-1 skies")
N_TRAIN, N_TEST = 1000, 21


def entry_config(entry: dict, data_dir: str, ckpt_dir: str, runs_dir: str):
    """The published zoo recipe (configs/zoo_synthetic.yaml) with this
    entry's model/dataset overrides applied."""
    from reni_tpu.utils.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(ROOT, "configs", "zoo_synthetic.yaml"))
    cfg.RENI.LATENT_DIMENSION = int(entry["latent_dim"])
    cfg.RENI.CONDITIONING = entry["conditioning"]
    cfg.RENI.MODEL_TYPE = entry.get("model_type", "VariationalAutoDecoder")
    cfg.RENI.OUTPUT_ACTIVATION = entry.get("output_activation", "tanh")
    if entry["dataset"] == "ldr":
        cfg.DATASET.NAME = "RENI_LDR"
        cfg.DATASET.RENI_LDR.PATH = data_dir
        cfg.DATASET.RENI_LDR.TRANSFORMS = [
            ["normalize", [[0.5, 0.5, 0.5], [0.5, 0.5, 0.5]]]
        ]
        cfg.DATASET.RENI_LDR.IS_HDR = False
    else:
        cfg.DATASET.RENI_HDR.PATH = data_dir
        if entry.get("output_activation") == "exp":
            # exp predicts LINEAR radiance: train on unnormalised HDR.
            # The reference cannot run exp at all (nn.Exp() does not exist,
            # reference src/models/RENI.py:174) so the pairing is this
            # build's decision, recorded in PARITY.md: minmax-log targets
            # span [-1, 1], unreachable from exp's (0, inf) codomain.
            cfg.DATASET.RENI_HDR.TRANSFORMS = []
    cfg.TRAINER.CHKPTS.SAVE_DIR = ckpt_dir
    cfg.TRAINER.LOGGER.TB.SAVE_DIR = runs_dir
    return cfg


def entry_name(entry: dict) -> str:
    from reni_tpu.utils.config import experiment_name

    cfg = entry_config(entry, "/tmp", "/tmp", "/tmp")
    return experiment_name(cfg)


def best_checkpoint(ckpt_dir: str, task: str) -> str:
    """Lowest-loss periodic checkpoint of a task (falls back to _final).

    The CLI keeps the best-2 periodic saves plus ``{task}_latest`` /
    ``{task}_final``; the training loss is the top-level ``loss`` key of
    each .json sidecar. ``_latest``/``_final`` are excluded from the
    lowest-loss scan: ``_latest`` duplicates a periodic save but carries
    optimizer state, and ``_final`` is the last epoch, not the best."""
    best, best_loss = None, float("inf")
    for j in glob.glob(os.path.join(ckpt_dir, f"{task}_*.json")):
        stem = os.path.basename(j)[: -len(".json")]
        if stem.endswith("_latest") or stem.endswith("_final"):
            continue
        with open(j) as f:
            loss = float(json.load(f).get("loss", float("inf")))
        if loss < best_loss:
            best, best_loss = j[: -len(".json")] + ".npz", loss
    if best is None or not os.path.isfile(best):
        final = os.path.join(ckpt_dir, f"{task}_final.npz")
        if not os.path.isfile(final):
            raise FileNotFoundError(f"no {task} checkpoints under {ckpt_dir}")
        print(f"[make_zoo] no periodic {task} saves found; packaging _final")
        best = final
    return best


def package_checkpoint(src_npz: str, dst_npz: str) -> None:
    """Copy a checkpoint, stripping training-only state (``__opt__``/
    ``__rng__`` keys): the zoo ships model weights, not optimizer moments
    (~3x the bytes when a periodic save wins the lowest-loss scan)."""
    with np.load(src_npz) as z:
        kept = {
            k: z[k]
            for k in z.files
            if not (k.startswith("__opt__") or k == "__rng__")
        }
    np.savez(dst_npz, **kept)
    shutil.copy(src_npz[: -len(".npz")] + ".json",
                dst_npz[: -len(".npz")] + ".json")


def write_config(cfg_path: str, cfg) -> None:
    import yaml

    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f, sort_keys=False)


def train_entry(cfg_path: str, cfg, max_restarts: int = 6) -> None:
    """Run the training chain, surviving both crash-retries (in-process,
    --retries) and hang-watchdog hard-exits (exit 114: rerun the CLI with a
    resume plan recomputed from the newest checkpoint — the same policy as
    cli.run._auto_resume_plan, applied across process restarts)."""
    env = dict(os.environ, RENI_TPU_HANG_EXIT_S="1800")
    from reni_tpu.cli.run import _auto_resume_plan

    # resume-aware from the FIRST attempt: if a previous (crashed) build
    # left checkpoints in this entry's work dir, continue from them rather
    # than retraining the chain from scratch
    # (SAVE_DIR is absolute in zoo configs, so log_dir="" resolves it)
    tasks_list, resume, load_path = _auto_resume_plan(cfg, "")
    if not tasks_list:
        return  # every task already completed in a previous run
    if tasks_list != list(cfg.RENI.TASKS) or resume or load_path:
        cfg = cfg.clone()
        cfg.RENI.TASKS = tasks_list
        if load_path:
            cfg.TRAINER.CHKPTS.LOAD_PATH = load_path
        write_config(cfg_path, cfg)
        print(f"[make_zoo] resuming previous build: tasks={tasks_list} "
              f"resume={resume}", flush=True)
    for attempt in range(max_restarts + 1):
        cmd = [sys.executable, "-m", "reni_tpu.cli.run",
               "--cfg_path", cfg_path, "--retries", "6"]
        if resume:
            cmd += ["--resume", resume]
        rc = subprocess.run(cmd, cwd=ROOT, env=env).returncode
        if rc == 0:
            return
        tasks_list, resume, load_path = _auto_resume_plan(cfg, "")
        if not tasks_list:
            return  # every task already completed; the failure was post-train
        cfg = cfg.clone()
        cfg.RENI.TASKS = tasks_list
        cfg.TRAINER.CHKPTS.LOAD_PATH = load_path
        write_config(cfg_path, cfg)
        print(
            f"[make_zoo restart {attempt + 1}/{max_restarts}] exit {rc}; "
            f"tasks={tasks_list} resume={resume}",
            flush=True,
        )
    raise RuntimeError(f"training failed after {max_restarts} process restarts")


def build_entry(entry: dict, out_root: str, work: str, skip_train: bool) -> str:
    name = entry_name(entry)
    data_dir = os.path.join(work, f"data_{entry['dataset']}")
    ckpt_dir = os.path.join(work, "ckpts", name)
    runs_dir = os.path.join(work, "runs")
    cfg = entry_config(entry, data_dir, ckpt_dir, runs_dir)
    cfg_path = os.path.join(work, f"{name}.yaml")
    os.makedirs(work, exist_ok=True)
    write_config(cfg_path, cfg)

    if not skip_train:
        gen = [sys.executable,
               os.path.join(ROOT, "examples", "make_synthetic_dataset.py"),
               "--out", data_dir, "--train", str(N_TRAIN),
               "--test", str(N_TEST), "--width", "128", "--seed", str(SEED)]
        if entry["dataset"] == "ldr":
            gen.append("--ldr")
        # count, don't just stat: a generation run killed midway must not
        # leave a truncated "1000-map prior" that later builds silently use
        train_dir = os.path.join(data_dir, "Train")
        n_have = len(glob.glob(os.path.join(train_dir, "*.exr"))) + len(
            glob.glob(os.path.join(train_dir, "*.png"))
        )
        if n_have != N_TRAIN:
            subprocess.run(gen, check=True)
        train_entry(cfg_path, cfg)

    out = os.path.join(out_root, name)
    os.makedirs(out, exist_ok=True)
    package_checkpoint(best_checkpoint(ckpt_dir, "fit_decoder"),
                       os.path.join(out, "checkpoint.npz"))
    try:
        package_checkpoint(best_checkpoint(ckpt_dir, "fit_latent"),
                           os.path.join(out, "latents_test.npz"))
    except FileNotFoundError:
        pass
    # the packaged recipe is the PRISTINE config (cfg_path may carry a
    # trimmed task list after crash restarts)
    write_config(os.path.join(out, "config.yaml"),
                 entry_config(entry, data_dir, ckpt_dir, runs_dir))

    from reni_tpu.serve import export_from_checkpoint

    export_from_checkpoint(
        os.path.join(out, "checkpoint.npz"),
        os.path.join(out, "decoder.jaxexport"),
        platforms=("cpu", "tpu"),
    )

    # measured quality card: the cli.evaluate report on the fitted test
    # latents (PSNR/SSIM/equivariance) — zoo_default() picks by it
    lat = os.path.join(out, "latents_test.npz")
    if os.path.isfile(lat):
        res = subprocess.run(
            [sys.executable, "-m", "reni_tpu.cli.evaluate",
             "--checkpoint", lat,
             "--cfg_path", os.path.join(out, "config.yaml")],
            cwd=ROOT, capture_output=True, text=True,
        )
        if res.returncode == 0:
            report = json.loads(res.stdout)
            report.pop("psnr_per_image", None)
            report.pop("ssim_per_image", None)
            with open(os.path.join(out, "eval.json"), "w") as f:
                json.dump(report, f, indent=2)
        else:
            print(f"[make_zoo] evaluate failed for {name}:\n{res.stderr}")

    sizes = {
        f: os.path.getsize(os.path.join(out, f)) for f in sorted(os.listdir(out))
    }
    print(json.dumps({"zoo": out, "bytes": sizes}, indent=2))
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.path.join(ROOT, "data", "Zoo"))
    ap.add_argument("--work", default="/tmp/reni_zoo4")
    ap.add_argument("--entries", default=None,
                    help="comma-separated entry names to (re)build; "
                    "default: the whole matrix")
    ap.add_argument("--skip_train", action="store_true",
                    help="package from an existing --work run (no training)")
    args = ap.parse_args(argv)

    wanted = set(args.entries.split(",")) if args.entries else None
    built = []
    for entry in ENTRIES:
        name = entry_name(entry)
        if wanted is not None and name not in wanted:
            continue
        built.append(build_entry(entry, args.out, args.work, args.skip_train))
    if wanted is not None:
        missing = wanted - {os.path.basename(b) for b in built}
        if missing:
            raise SystemExit(f"unknown zoo entries: {sorted(missing)}; "
                             f"known: {[entry_name(e) for e in ENTRIES]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
