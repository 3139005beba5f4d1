"""Serving export: the decoder as a portable, ahead-of-time artifact.

The reference's deployment story is "load the Lightning checkpoint in a
Python process" (examples.ipynb cell 4). The TPU-native analog is
``jax.export``: the decoder forward is traced once with *symbolic* batch
and pixel dimensions, lowered to versioned StableHLO, and serialized to a
single file a serving process can load **without the model code** — only
jax — and call on any (B, npix) at full XLA speed.

    ex = export_decoder(model, params)          # symbolic (B, P)
    save_exported(ex, "decoder.jaxexport")
    ...
    f = load_exported("decoder.jaxexport")      # any process, no reni_tpu
    rgb = f(Z, directions)                      # (B, P, 3)

Exports run the XLA trunk (the fused Pallas kernel is a runtime dispatch
choice, not a portable artifact); on TPU the fast-sine polynomial is baked
in when the model config enables it. Post-warmup the artifact decodes at
the direct XLA rate (PERF.md "Serving export") — issue one warmup call
after load: the first execution uploads the baked weight constants
(seconds through a tunneled chip).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import export as jax_export

from reni_tpu.models.reni import RENIConfig, RENIModel


def export_decoder(
    model: RENIModel,
    params,
    *,
    platforms: tuple[str, ...] | None = None,
) -> jax_export.Exported:
    """Trace + lower ``model.apply`` on symbolic (B, P) shapes.

    The artifact closes over the decoder weights (latents are serving
    inputs: the caller passes Z rows). Returns a ``jax.export.Exported``;
    serialize with :func:`save_exported`.

    platforms: lowering platforms (default: the current backend). Pass
    ("cpu", "tpu") for an artifact that runs on both.
    """
    cfg = model.config
    if cfg.use_pallas:
        # pallas_call is an opaque custom call — not portable across
        # processes/compiler versions; export the XLA path instead
        model = RENIModel(dataclasses.replace(cfg, use_pallas=False))

    decoder = {"decoder": jax.tree.map(jnp.asarray, params["decoder"])}

    def apply_fn(Z, D):
        return model.apply(decoder, Z, D)

    scope = jax_export.SymbolicScope()
    (b,) = jax_export.symbolic_shape("b", scope=scope)
    (p,) = jax_export.symbolic_shape("p", scope=scope)
    z_spec = jax.ShapeDtypeStruct((b, cfg.latent_dim, 3), jnp.float32)
    d_spec = jax.ShapeDtypeStruct((b, p, 3), jnp.float32)
    kwargs = {} if platforms is None else {"platforms": list(platforms)}
    return jax_export.export(jax.jit(apply_fn), **kwargs)(z_spec, d_spec)


def save_exported(ex: jax_export.Exported, path: str) -> None:
    with open(path, "wb") as f:
        f.write(ex.serialize())


def load_exported(path: str):
    """Deserialize an exported decoder -> ``f(Z, D) -> (B, P, 3)``.

    Needs only jax (the model code is baked into the artifact)."""
    with open(path, "rb") as f:
        ex = jax_export.deserialize(f.read())

    def call(Z, D):
        return ex.call(jnp.asarray(Z, jnp.float32), jnp.asarray(D, jnp.float32))

    call.exported = ex
    return call


def export_from_checkpoint(
    checkpoint_path: str, out_path: str, *, platforms: tuple[str, ...] | None = None
) -> RENIConfig:
    """Checkpoint file -> serving artifact; returns the model config."""
    from reni_tpu.train import checkpoint as ckpt

    params, _ = ckpt.load_checkpoint(checkpoint_path)
    cfg = ckpt.load_model_config(checkpoint_path, fixed_decoder=True)
    model = RENIModel(cfg)
    ex = export_decoder(model, params, platforms=platforms)
    save_exported(ex, out_path)
    return cfg
