"""Export a trained decoder checkpoint as a serving artifact.

    python -m reni_tpu.cli.export --checkpoint runs/.../fit_decoder_final \
        --out decoder.jaxexport [--platforms cpu,tpu]

The artifact is versioned StableHLO (jax.export) with symbolic batch/pixel
dimensions: a serving process loads it with ``reni_tpu.serve.load_exported``
(or raw ``jax.export.deserialize``) and decodes any resolution without the
model code. See reni_tpu/serve.py.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True, help="checkpoint path (.npz base)")
    parser.add_argument("--out", required=True, help="output artifact path")
    parser.add_argument(
        "--platforms",
        default=None,
        help="comma-separated lowering platforms (e.g. cpu,tpu); default: current backend",
    )
    args = parser.parse_args(argv)

    from reni_tpu.serve import export_from_checkpoint

    platforms = tuple(args.platforms.split(",")) if args.platforms else None
    cfg = export_from_checkpoint(args.checkpoint, args.out, platforms=platforms)
    print(
        f"exported {cfg.model_type}/{cfg.conditioning}/{cfg.equivariance} "
        f"N={cfg.latent_dim} {cfg.hidden_layers}x{cfg.hidden_features} -> {args.out}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
