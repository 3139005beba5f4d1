"""Convert reference (PyTorch/Lightning) RENI checkpoints to/from our params.

The reference persists Lightning checkpoints whose ``state_dict`` prefixes
every key with ``model.`` (reference: src/models/RENI.py:190-203 strips it);
layer layout (RENI.py:132-178):

Cond-by-Concat:
    model.net.{i}.linear.{weight,bias}   i in [0, hidden_layers]  (SineLayer)
    model.net.{L+1}.{weight,bias}        final nn.Linear (last_layer_linear)
    model.net.{L+1}.linear.{weight,bias} final SineLayer otherwise
    model.{mu,log_var} | model.Z         latent tables

FiLM (RENI.py:563-598):
    model.net.{i}.layer.{weight,bias}            FiLMLayer trunk
    model.final_layer.{weight,bias}
    model.mapping_network.network.{2k}.{weight,bias}  (Linear at even idx)

Torch Linear weights are (out, in); ours are (in, out) — transposed here.

`load_reference_checkpoint` reads an actual .ckpt file (torch.load); the
embedded yacs config is translated to RENIConfig when present, otherwise
pass ``model_config`` explicitly.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax.numpy as jnp

from reni_tpu.models.reni import RENIConfig

Params = dict[str, Any]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    # copy=True is load-bearing: torch .numpy() views share the parameter's
    # storage, and jnp.asarray is zero-copy on CPU — without the copy, a
    # torch optimizer stepping the source module would mutate the converted
    # jax params in place.
    return np.array(t, dtype=np.float32, copy=True)


def _strip_prefix(state_dict: dict) -> dict:
    out = {}
    for k, v in state_dict.items():
        out[k[6:] if k.startswith("model.") else k] = v
    return out


def torch_state_dict_to_params(state_dict: dict, config: RENIConfig) -> Params:
    """Reference state dict -> our params pytree (decoder + latents)."""
    sd = _strip_prefix(state_dict)
    decoder: dict = {}

    if config.is_film:
        layers = []
        i = 0
        while f"net.{i}.layer.weight" in sd:
            layers.append(
                {
                    "w": _np(sd[f"net.{i}.layer.weight"]).T,
                    "b": _np(sd[f"net.{i}.layer.bias"]),
                }
            )
            i += 1
        mapping_layers = []
        idx = sorted(
            int(k.split(".")[2])
            for k in sd
            if k.startswith("mapping_network.network.") and k.endswith(".weight")
        )
        for j in idx[:-1]:
            mapping_layers.append(
                {
                    "w": _np(sd[f"mapping_network.network.{j}.weight"]).T,
                    "b": _np(sd[f"mapping_network.network.{j}.bias"]),
                }
            )
        last = idx[-1]
        decoder = {
            "layers": layers,
            "final": {
                "w": _np(sd["final_layer.weight"]).T,
                "b": _np(sd["final_layer.bias"]),
            },
            "mapping": {
                "layers": mapping_layers,
                "last": {
                    "w": _np(sd[f"mapping_network.network.{last}.weight"]).T,
                    "b": _np(sd[f"mapping_network.network.{last}.bias"]),
                },
            },
        }
    else:
        layers = []
        i = 0
        while f"net.{i}.linear.weight" in sd:
            layers.append(
                {
                    "w": _np(sd[f"net.{i}.linear.weight"]).T,
                    "b": _np(sd[f"net.{i}.linear.bias"]),
                }
            )
            i += 1
        if f"net.{i}.weight" in sd:  # final plain Linear
            final = {"w": _np(sd[f"net.{i}.weight"]).T, "b": _np(sd[f"net.{i}.bias"])}
        else:  # last_layer_linear=False: the last SineLayer is the final layer
            final = layers.pop()
        decoder = {"layers": layers, "final": final}

    latents = {}
    if "mu" in sd:
        latents = {"mu": _np(sd["mu"]), "log_var": _np(sd["log_var"])}
    elif "Z" in sd:
        latents = {"Z": _np(sd["Z"])}

    import jax

    return jax.tree.map(jnp.asarray, {"decoder": decoder, "latents": latents})


def params_to_torch_state_dict(params: Params, config: RENIConfig) -> dict:
    """Our params -> reference-layout state dict (numpy arrays, ``model.``
    prefix) so checkpoints can flow back to the reference implementation."""
    sd: dict[str, np.ndarray] = {}
    dec = params["decoder"]
    if config.is_film:
        for i, l in enumerate(dec["layers"]):
            sd[f"model.net.{i}.layer.weight"] = _np(l["w"]).T
            sd[f"model.net.{i}.layer.bias"] = _np(l["b"])
        sd["model.final_layer.weight"] = _np(dec["final"]["w"]).T
        sd["model.final_layer.bias"] = _np(dec["final"]["b"])
        j = 0
        for l in dec["mapping"]["layers"]:
            sd[f"model.mapping_network.network.{j}.weight"] = _np(l["w"]).T
            sd[f"model.mapping_network.network.{j}.bias"] = _np(l["b"])
            j += 2  # LeakyReLU between linears
        sd[f"model.mapping_network.network.{j}.weight"] = _np(
            dec["mapping"]["last"]["w"]
        ).T
        sd[f"model.mapping_network.network.{j}.bias"] = _np(dec["mapping"]["last"]["b"])
    else:
        for i, l in enumerate(dec["layers"]):
            sd[f"model.net.{i}.linear.weight"] = _np(l["w"]).T
            sd[f"model.net.{i}.linear.bias"] = _np(l["b"])
        n = len(dec["layers"])
        if config.last_layer_linear:
            sd[f"model.net.{n}.weight"] = _np(dec["final"]["w"]).T
            sd[f"model.net.{n}.bias"] = _np(dec["final"]["b"])
        else:
            sd[f"model.net.{n}.linear.weight"] = _np(dec["final"]["w"]).T
            sd[f"model.net.{n}.linear.bias"] = _np(dec["final"]["b"])

    lat = params["latents"]
    for k in ("mu", "log_var", "Z"):
        if k in lat:
            sd[f"model.{k}"] = _np(lat[k])
    return sd


def config_from_yacs(yacs_cfg, task: str | None = None) -> RENIConfig:
    """Translate the reference's embedded yacs config to RENIConfig."""
    r = yacs_cfg["RENI"] if isinstance(yacs_cfg, dict) else yacs_cfg.RENI
    get = (lambda k: r[k]) if isinstance(r, dict) else (lambda k: getattr(r, k))
    fixed = task in ("FIT_LATENT", "FIT_INVERSE") if task else False
    return RENIConfig(
        model_type=get("MODEL_TYPE"),
        conditioning=get("CONDITIONING"),
        equivariance=str(get("EQUIVARIANCE")),
        latent_dim=get("LATENT_DIMENSION"),
        hidden_layers=get("HIDDEN_LAYERS"),
        hidden_features=get("HIDDEN_FEATURES"),
        out_features=get("OUT_FEATURES"),
        last_layer_linear=get("LAST_LAYER_LINEAR"),
        output_activation=get("OUTPUT_ACTIVATION"),
        first_omega_0=get("FIRST_OMEGA_0"),
        hidden_omega_0=get("HIDDEN_OMEGA_0"),
        mapping_layers=get("MAPPING_LAYERS"),
        mapping_features=get("MAPPING_FEATURES"),
        fixed_decoder=fixed,
    )


def load_reference_checkpoint(
    path: str, model_config: RENIConfig | None = None, task: str | None = None
) -> tuple[Params, RENIConfig]:
    """Load a reference Lightning .ckpt -> (params, RENIConfig)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    if model_config is None:
        hp = ckpt.get("hyper_parameters", {})
        if "config" not in hp:
            raise ValueError(
                "checkpoint has no embedded config; pass model_config explicitly"
            )
        model_config = config_from_yacs(hp["config"], task)
    return torch_state_dict_to_params(state_dict, model_config), model_config
