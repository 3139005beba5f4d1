"""Convert checkpoints between the reference's Lightning format and ours.

    # reference .ckpt (torch.save Lightning layout) -> reni_tpu checkpoint
    python -m reni_tpu.cli.convert --from_torch model.ckpt --out ck

    # reni_tpu checkpoint -> Lightning-layout .ckpt (loadable by the
    # reference's RENI.load_from_checkpoint / notebook torch.load recipe)
    python -m reni_tpu.cli.convert --to_torch ck --out model.ckpt

The migration path for users of the reference's pretrained zoo
(reference: run.py:76 `RENI.load_from_checkpoint`, examples.ipynb cell 4
`torch.load`): convert once, then train/evaluate/export here. Weight-layout
transposition and the first-layer concat-row canonicalisation live in
utils/convert.py; this is the command-line veneer.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    g = parser.add_mutually_exclusive_group(required=True)
    g.add_argument("--from_torch", help="reference Lightning .ckpt to import")
    g.add_argument("--to_torch", help="reni_tpu checkpoint to export")
    parser.add_argument("--out", required=True)
    parser.add_argument(
        "--task",
        default=None,
        help="task context for the embedded config (sets fixed_decoder)",
    )
    args = parser.parse_args(argv)

    from reni_tpu.train import checkpoint as ckpt
    from reni_tpu.utils import convert

    if args.from_torch:
        params, cfg = convert.load_reference_checkpoint(
            args.from_torch, task=args.task
        )
        ckpt.save_checkpoint(
            args.out, params, model_config=cfg,
            metadata={"source": args.from_torch},
        )
        print(
            f"imported {cfg.model_type}/{cfg.conditioning}/{cfg.equivariance} "
            f"N={cfg.latent_dim} -> {args.out}.npz"
        )
    else:
        import torch

        params, _ = ckpt.load_checkpoint(args.to_torch)
        cfg = ckpt.load_model_config(args.to_torch)
        # keys already carry the Lightning "model." prefix
        state_dict = {
            k: torch.from_numpy(v.copy())
            for k, v in convert.params_to_torch_state_dict(params, cfg).items()
        }
        # embed the config in the reference's hyper_parameters layout so
        # RENI.load_from_checkpoint / our --from_torch can rebuild the model
        ref_cfg = {
            "RENI": {
                "MODEL_TYPE": cfg.model_type,
                "CONDITIONING": cfg.conditioning,
                "EQUIVARIANCE": cfg.equivariance,
                "LATENT_DIMENSION": cfg.latent_dim,
                "HIDDEN_LAYERS": cfg.hidden_layers,
                "HIDDEN_FEATURES": cfg.hidden_features,
                "OUT_FEATURES": cfg.out_features,
                "LAST_LAYER_LINEAR": cfg.last_layer_linear,
                "OUTPUT_ACTIVATION": cfg.output_activation,
                "FIRST_OMEGA_0": cfg.first_omega_0,
                "HIDDEN_OMEGA_0": cfg.hidden_omega_0,
                "MAPPING_LAYERS": cfg.mapping_layers,
                "MAPPING_FEATURES": cfg.mapping_features,
            }
        }
        torch.save(
            {"state_dict": state_dict, "hyper_parameters": {"config": ref_cfg}},
            args.out,
        )
        print(f"exported Lightning-layout state_dict -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
