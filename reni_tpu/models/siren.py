"""SIREN trunk: initialisation and apply functions, as pure pytrees.

Weight convention is ``y = x @ w + b`` with ``w`` of shape (in, out) — the
transpose of the reference's torch layout. Initialisation distributions
match the reference exactly (they are load-bearing for SIREN training):

- first layer weight  ~ U(-1/in, 1/in)            (reference RENI.py:79)
- hidden layer weight ~ U(+-sqrt(6/in)/omega_0)   (reference RENI.py:81-84)
- final linear weight ~ U(+-sqrt(6/hidden)/omega_0) (reference RENI.py:156-160)
- every bias          ~ U(+-1/sqrt(in))           (torch nn.Linear default,
  which the reference keeps)

The *decomposed first layer* is the TPU-first core of this module. The first
layer consumes the concatenated invariant encoding (canonical orderings in
`reni_tpu.core.encodings`), but since it is linear, we split its weight by
input-feature rows into a per-pixel part (width <= 4) and a per-image part
folded into a bias:

    x_concat @ w1 = d_feats @ w_pix(Z) + bias(Z)

where ``w_pix(Z)`` mixes the latent projection into the weight once per image.
This is exact (up to fp reassociation) and never materialises the
``(B, npix, 2N + N^2 + 2)`` tensor the reference builds per step.

First-layer weights are *stored* in the canonical concat layout so that
parameters remain interchangeable with a naive concat evaluation (used in
parity tests) and with converted reference checkpoints.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from reni_tpu.core import encodings

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_linear(key, in_features: int, out_features: int, w_bound: float) -> Params:
    kw, kb = jax.random.split(key)
    return {
        "w": _uniform(kw, (in_features, out_features), w_bound),
        "b": _uniform(kb, (out_features,), 1.0 / math.sqrt(in_features)),
    }


def init_siren(
    key,
    in_features: int,
    hidden_features: int,
    hidden_layers: int,
    out_features: int,
    last_layer_linear: bool,
    first_omega_0: float,
    hidden_omega_0: float,
    first_layer_init_scale: float = 1.0,
) -> Params:
    """Initialise the SIREN stack: 1 first sine layer, ``hidden_layers`` hidden
    sine layers, and a final layer (linear or sine). The first-layer bound
    is ``first_layer_init_scale / in`` (reference: 1/in; see
    RENIConfig.first_layer_init_scale for the wide-N rationale)."""
    n_layers = 1 + hidden_layers
    keys = jax.random.split(key, n_layers + 1)
    layers = [
        init_linear(
            keys[0], in_features, hidden_features,
            first_layer_init_scale / in_features,
        )
    ]
    hidden_bound = math.sqrt(6.0 / hidden_features) / hidden_omega_0
    for i in range(hidden_layers):
        layers.append(
            init_linear(keys[1 + i], hidden_features, hidden_features, hidden_bound)
        )
    final = init_linear(keys[-1], hidden_features, out_features, hidden_bound)
    return {"layers": layers, "final": final}


# ---------------------------------------------------------------------------
# first-layer weight split
# ---------------------------------------------------------------------------


def split_first_layer(
    w1: jnp.ndarray, equivariance: str, ndims: int
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray | None]:
    """Split the canonical concat-layout first-layer weight into
    (w_innerprod (N, h), w_bias (m, h), w_direct (k, h) | None).

    ``w_direct`` covers direction-only scalar features (|D_xz| and D_y for
    SO2); it is None when there are none. Orderings follow
    `reni_tpu.core.encodings` canonical concat layout.
    """
    n = ndims
    if equivariance == "SO3":
        return w1[:n], w1[n : n + n * n], None
    if equivariance == "SO2":
        w_ip = w1[:n]
        w_g = w1[n : n + n * n]
        w_dn = w1[n + n * n : n + n * n + 1]
        w_zy = w1[n + n * n + 1 : n + n * n + 1 + n]
        w_dy = w1[n + n * n + 1 + n :]
        w_bias = jnp.concatenate((w_g, w_zy), axis=0)  # matches [G_flat, Z_y]
        w_direct = jnp.concatenate((w_dn, w_dy), axis=0)  # matches [|D_xz|, D_y]
        return w_ip, w_bias, w_direct
    if equivariance == "None":
        return w1[:n], w1[n:], None
    raise ValueError(f"unknown equivariance {equivariance!r}")


def first_layer_pre(
    layer: Params,
    equivariance: str,
    ndims: int,
    d_feats: jnp.ndarray,
    parts: dict,
) -> jnp.ndarray:
    """Pre-activation of the first layer via the decomposed path.

    d_feats: (B or 1, npix, k) from `encodings.d_features`.
    parts:   from `encodings.z_parts` — {'proj': (B, c, N), 'bias_feats': (B, m)}.
    Returns (B, npix, hidden).
    """
    w_ip, w_bias, w_direct = split_first_layer(layer["w"], equivariance, ndims)
    proj = parts["proj"]  # (B, c, N)
    a = jnp.einsum("bcn,nh->bch", proj, w_ip)  # (B, c, hidden)
    c = a.shape[1]
    d_proj = d_feats[..., :c]
    pre = jnp.einsum("bpc,bch->bph", d_proj, a)
    if w_direct is not None:
        pre = pre + jnp.einsum("bpk,kh->bph", d_feats[..., c:], w_direct)
    bias = jnp.einsum("bm,mh->bh", parts["bias_feats"], w_bias) + layer["b"]
    return pre + bias[:, None, :]


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _output_activation(x: jnp.ndarray, name: str | None) -> jnp.ndarray:
    if name == "exp":
        return jnp.exp(x)
    if name == "tanh":
        return jnp.tanh(x)
    return x


def apply_trunk(
    params: Params,
    h: jnp.ndarray,
    last_layer_linear: bool,
    output_activation: str | None,
    hidden_omega_0: float,
    sine=jnp.sin,
) -> jnp.ndarray:
    """Hidden sine layers + final layer, given first-layer *activations* h."""
    for layer in params["layers"][1:]:
        h = sine(hidden_omega_0 * (h @ layer["w"] + layer["b"]))
    out = h @ params["final"]["w"] + params["final"]["b"]
    if not last_layer_linear:
        out = sine(hidden_omega_0 * out)
    return _output_activation(out, output_activation)


def apply_siren_decomposed(
    params: Params,
    equivariance: str,
    ndims: int,
    Z: jnp.ndarray,
    D: jnp.ndarray,
    *,
    last_layer_linear: bool,
    output_activation: str | None,
    first_omega_0: float,
    hidden_omega_0: float,
    fast_sine: bool = False,
) -> jnp.ndarray:
    """Full decoder forward on latents Z (B, N, 3) and directions D (B, npix, 3)
    via the decomposed first layer. Returns (B, npix, out)."""
    from reni_tpu.core.fastmath import sine_fns

    sine, _ = sine_fns(fast_sine)
    d_feats = encodings.d_features(equivariance, D)
    parts = encodings.z_parts(equivariance, Z)
    pre = first_layer_pre(params["layers"][0], equivariance, ndims, d_feats, parts)
    h = sine(first_omega_0 * pre)
    return apply_trunk(
        params, h, last_layer_linear, output_activation, hidden_omega_0, sine
    )


def apply_siren_concat(
    params: Params,
    x: jnp.ndarray,
    *,
    last_layer_linear: bool,
    output_activation: str | None,
    first_omega_0: float,
    hidden_omega_0: float,
) -> jnp.ndarray:
    """Reference-parity forward on a pre-built concat encoding x (B, npix, in)."""
    layer0 = params["layers"][0]
    h = jnp.sin(first_omega_0 * (x @ layer0["w"] + layer0["b"]))
    return apply_trunk(params, h, last_layer_linear, output_activation, hidden_omega_0)
