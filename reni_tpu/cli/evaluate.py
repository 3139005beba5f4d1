"""Evaluation CLI: run the BASELINE.md protocol on a trained checkpoint.

    python -m reni_tpu.cli.evaluate --checkpoint runs/.../fit_latent_final \
        --cfg_path configs/experiment.yaml [--mask data/Masks/Mask-3.png]

Prints a JSON report: test-set reconstruction PSNR, the rotation-
equivariance eval (latent rotation vs rolled ground truth), and — with a
mask — in-painting observed/hallucinated PSNR.
"""

from __future__ import annotations

import argparse
import json
import os


from reni_tpu import eval as ev
from reni_tpu.core import sphere
from reni_tpu.data.datasets import get_dataset
from reni_tpu.models.reni import RENIModel
from reni_tpu.train import checkpoint as ckpt
from reni_tpu.utils.config import get_cfg_defaults


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--cfg_path", default=None)
    ap.add_argument("--split", default="Test")
    ap.add_argument("--resolution", type=int, nargs=2, default=[64, 128])
    ap.add_argument("--mask", default=None)
    ap.add_argument("--rotation_columns", type=int, default=8)
    args = ap.parse_args(argv)

    # serialize against other chip jobs (utils/chiplock.py): eval decodes
    # dispatch on the shared chip too and must not timeshare a bench
    from reni_tpu.utils import chiplock

    with chiplock.hold_chip_lock(chiplock.trainer_lock_path(), what="cli.evaluate"):
        return _main(args)


def _main(args):
    cfg = get_cfg_defaults()
    if args.cfg_path:
        cfg.merge_from_file(args.cfg_path)

    model_cfg = ckpt.load_model_config(args.checkpoint)
    model = RENIModel(model_cfg)
    params, meta = ckpt.load_checkpoint(args.checkpoint)

    dname = cfg.DATASET.NAME
    dcfg = cfg.DATASET[dname]
    split_path = os.path.join(dcfg.PATH, args.split)
    if not os.path.isdir(split_path):
        split_path = dcfg.PATH
    dataset = get_dataset(dname, split_path, dcfg.TRANSFORMS, dcfg.IS_HDR)
    res = tuple(args.resolution)
    images = dataset.images_at(res)

    if params["latents"][next(iter(params["latents"]))].shape[0] != len(dataset):
        raise SystemExit(
            f"checkpoint latent table holds "
            f"{params['latents'][next(iter(params['latents']))].shape[0]} rows "
            f"but the {args.split} split has {len(dataset)} images — evaluate "
            "the checkpoint produced by FIT_LATENT on this split"
        )

    report = {
        "checkpoint": args.checkpoint,
        "task": meta.get("task"),
        "split": args.split,
        "resolution": list(res),
        "n_images": len(dataset),
    }
    report.update(
        ev.reconstruction_psnr(
            model, params, images, res,
            unnormalise=dataset.unnormalise, is_hdr=dcfg.IS_HDR,
        )
    )
    report["psnr_per_image"] = [float(x) for x in report["psnr_per_image"]]
    if "ssim_per_image" in report:
        report["ssim_per_image"] = [float(x) for x in report["ssim_per_image"]]
    report.update(
        ev.equivariance_eval(
            model, params, images, res,
            columns=args.rotation_columns,
            unnormalise=dataset.unnormalise, is_hdr=dcfg.IS_HDR,
        )
    )
    if args.mask:
        mask = sphere.get_mask(res[1], args.mask)
        report.update(
            ev.inpainting_eval(
                model, params, images, res, mask,
                unnormalise=dataset.unnormalise, is_hdr=dcfg.IS_HDR,
            )
        )
    if meta.get("task") == "FIT_INVERSE":
        # recovery quality through the renderer (the task's own observable):
        # rebuild the scene from the config's FIT_INVERSE block
        from reni_tpu.render.inverse import InverseRenderSetup
        from reni_tpu.train.tasks import TaskConfig

        tc = TaskConfig.from_config(cfg, "FIT_INVERSE")
        setup = InverseRenderSetup(
            tc.object_path,
            render_resolution=tc.render_resolution,
            kd=tc.kd_value,
            azimuths=tc.azimuths,
            elevations=tc.elevations,
        )
        inv = ev.inverse_recovery_eval(
            model, params, images, res, setup,
            unnormalise=dataset.unnormalise,
        )
        inv["render_correlation_per_image"] = [
            float(x) for x in inv["render_correlation_per_image"]
        ]
        report.update(inv)
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
