"""FiLM-conditioned decoder: mapping network + FiLM sine trunk.

Mirrors the reference's FiLM stack (reference: src/models/RENI.py:452-858)
with two TPU-first changes that preserve the math exactly:

1. The mapping network runs **once per image** on the per-image invariants
   (Gram terms), not once per pixel — the reference tiles the identical
   mapping input to every pixel (RENI.py:407-449) and pays npix times the
   mapping-MLP FLOPs for byte-identical outputs.

2. The first FiLM layer's linear part is decomposed like the concat model's
   (see `reni_tpu.models.siren`): the inner-product block of its weight is
   contracted with Z once per image, so per-pixel width is <= 4.

Initialisation matches the reference:
- mapping net linears: kaiming-normal fan-in with leaky_relu(0.2) gain
  (RENI.py:452-457), last layer weight scaled by 0.25 (RENI.py:495-496);
- FiLM trunk linears: U(+-sqrt(6/in)/25) (frequency_init(25), RENI.py:460-469),
  first layer re-initialised U(+-1/in) (RENI.py:472-476);
- final linear: frequency_init(25);
- biases: torch nn.Linear default U(+-1/sqrt(in)).

Forward: frequencies are scaled ``freq * 15 + 30`` (RENI.py:668-678) and each
trunk layer computes ``sin(freq * (x @ w + b) + phase)``.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from reni_tpu.core import encodings
from reni_tpu.models.siren import _output_activation, _uniform, init_linear

Params = dict[str, Any]


def _kaiming_leaky(key, in_features: int, out_features: int) -> Params:
    kw, kb = jax.random.split(key)
    gain = math.sqrt(2.0 / (1.0 + 0.2**2))
    std = gain / math.sqrt(in_features)
    return {
        "w": std * jax.random.normal(kw, (in_features, out_features), jnp.float32),
        "b": _uniform(kb, (out_features,), 1.0 / math.sqrt(in_features)),
    }


def init_mapping_network(
    key, in_features: int, hidden_layers: int, hidden_dim: int, out_dim: int
) -> Params:
    keys = jax.random.split(key, hidden_layers + 1)
    layers = []
    fan_in = in_features
    for i in range(hidden_layers):
        layers.append(_kaiming_leaky(keys[i], fan_in, hidden_dim))
        fan_in = hidden_dim
    last = _kaiming_leaky(keys[-1], fan_in, out_dim)
    last = {"w": last["w"] * 0.25, "b": last["b"]}
    return {"layers": layers, "last": last}


def apply_mapping_network(params: Params, z: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, in) -> (frequencies (B, T*h), phase_shifts (B, T*h))."""
    h = z
    for layer in params["layers"]:
        h = jax.nn.leaky_relu(h @ layer["w"] + layer["b"], negative_slope=0.2)
    out = h @ params["last"]["w"] + params["last"]["b"]
    half = out.shape[-1] // 2
    return out[..., :half], out[..., half:]


def init_film_siren(
    key,
    siren_in_features: int,
    mapping_in_features: int,
    hidden_features: int,
    siren_hidden_layers: int,
    mapping_layers: int,
    mapping_features: int,
    out_features: int,
    first_layer_init_scale: float = 1.0,
) -> Params:
    """FiLM decoder params: trunk of ``siren_hidden_layers`` FiLM layers, a
    final linear, and the mapping network producing 2*T*h modulation values."""
    n_trunk = siren_hidden_layers
    keys = jax.random.split(key, n_trunk + 2)
    freq_bound_first = first_layer_init_scale / siren_in_features
    layers = [
        init_linear(keys[0], siren_in_features, hidden_features, freq_bound_first)
    ]
    for i in range(1, n_trunk):
        bound = math.sqrt(6.0 / hidden_features) / 25.0
        layers.append(init_linear(keys[i], hidden_features, hidden_features, bound))
    final = init_linear(
        keys[n_trunk],
        hidden_features,
        out_features,
        math.sqrt(6.0 / hidden_features) / 25.0,
    )
    mapping = init_mapping_network(
        keys[n_trunk + 1],
        mapping_in_features,
        mapping_layers,
        mapping_features,
        n_trunk * hidden_features * 2,
    )
    return {"layers": layers, "final": final, "mapping": mapping}


def _first_film_pre(
    layer: Params, equivariance: str, d_feats: jnp.ndarray, proj: jnp.ndarray
) -> jnp.ndarray:
    """Decomposed pre-activation of the first FiLM layer.

    FiLM siren-input orderings (encodings module docstring): SO2 is
    [|D_xz|, D_y, innerprod]; SO3/None are just innerprod.
    """
    w = layer["w"]
    if equivariance == "SO2":
        w_direct = w[:2]  # rows for [|D_xz|, D_y]
        w_ip = w[2:]
        a = jnp.einsum("bcn,nh->bch", proj, w_ip)  # (B, 2, h)
        pre = jnp.einsum("bpc,bch->bph", d_feats[..., :2], a)
        pre = pre + jnp.einsum("bpk,kh->bph", d_feats[..., 2:], w_direct)
    else:
        a = jnp.einsum("bcn,nh->bch", proj, w)
        pre = jnp.einsum("bpc,bch->bph", d_feats, a)
    return pre + layer["b"]


def apply_film_decomposed(
    params: Params,
    equivariance: str,
    Z: jnp.ndarray,
    D: jnp.ndarray,
    *,
    hidden_features: int,
    output_activation: str | None,
    fast_sine: bool = False,
) -> jnp.ndarray:
    """Full FiLM decoder forward: Z (B, N, 3), D (B, npix, 3) -> (B, npix, out)."""
    from reni_tpu.core.fastmath import sine_fns

    sine, _ = sine_fns(fast_sine)
    parts = encodings.z_parts(equivariance, Z)
    freqs, phases = apply_mapping_network(params["mapping"], parts["bias_feats"])
    freqs = freqs * 15.0 + 30.0
    d_feats = encodings.d_features(equivariance, D)

    h = None
    for i, layer in enumerate(params["layers"]):
        lo, hi = i * hidden_features, (i + 1) * hidden_features
        f = freqs[:, None, lo:hi]
        p = phases[:, None, lo:hi]
        if i == 0:
            pre = _first_film_pre(layer, equivariance, d_feats, parts["proj"])
        else:
            pre = h @ layer["w"] + layer["b"]
        h = sine(f * pre + p)
    out = h @ params["final"]["w"] + params["final"]["b"]
    return _output_activation(out, output_activation)


def apply_film_concat(
    params: Params,
    siren_in: jnp.ndarray,
    mapping_in: jnp.ndarray,
    *,
    hidden_features: int,
    output_activation: str | None,
) -> jnp.ndarray:
    """Reference-parity forward on pre-built FiLM inputs (for tests).

    siren_in: (B, npix, s); mapping_in: (B, m) per-image.
    """
    freqs, phases = apply_mapping_network(params["mapping"], mapping_in)
    freqs = freqs * 15.0 + 30.0
    h = siren_in
    for i, layer in enumerate(params["layers"]):
        lo, hi = i * hidden_features, (i + 1) * hidden_features
        pre = h @ layer["w"] + layer["b"]
        h = jnp.sin(freqs[:, None, lo:hi] * pre + phases[:, None, lo:hi])
    out = h @ params["final"]["w"] + params["final"]["b"]
    return _output_activation(out, output_activation)
