"""Rotation-invariant input encodings for the RENI decoder.

The reference conditions its SIREN on rotation-invariant quantities only
(reference: src/models/RENI.py:23-60 for concat conditioning,
src/models/RENI.py:407-449 for FiLM conditioning):

- SO(3): inner products ``D @ Z^T`` and the Gram matrix ``Z @ Z^T``;
- SO(2) (y-axis): the same built from the xz-plane projections, plus
  ``|D_xz|``, ``Z_y`` and ``D_y``;
- None: inner products plus raw flattened ``Z``.

Two forms are provided here:

1. **Concat form** (`so3_invariant` etc.) — the exact ``(B, npix, in)``
   tensors the reference feeds its first layer. These exist for parity tests
   and for users that want the raw encoding.

2. **Decomposed form** (`d_features`, `z_parts`) — the TPU-first compute path.
   Because the first layer is linear in the concatenated encoding, the
   concat splits algebraically into a *per-pixel* part of width <= 4 and a
   *per-image* part (Gram terms) folded into a per-image bias:

       x @ W1 = D_feats @ [Z^T W_ip ; W_extra] + (G_flat @ W_G + ...)

   so the huge ``(B, npix, 2N + N^2 + 2)`` tensor is never materialised and
   first-layer FLOPs drop by ~600x at N=49. The split of W1 by input-feature
   rows lives in `reni_tpu.models.siren`; this module only defines the pieces
   and the canonical feature ordering they correspond to.

Canonical concat orderings (must match the weight-row splits in models/):

- SO3:   [innerprod (N), G_flat (N^2)]
- SO2:   [innerprod (N), G_flat (N^2), |D_xz| (1), Z_y (N), D_y (1)]
- None:  [innerprod (N), Z_flat (3N)]

FiLM siren-input orderings (reference: src/models/RENI.py:418-449):

- SO3:   innerprod (N)                    mapping: G_flat (N^2)
- SO2:   [|D_xz| (1), D_y (1), innerprod (N)]   mapping: [G_flat, Z_y]
- None:  innerprod (N)                    mapping: Z_flat (3N)
"""

from __future__ import annotations

import jax.numpy as jnp

EQUIVARIANCES = ("SO3", "SO2", "None")


# ---------------------------------------------------------------------------
# feature widths
# ---------------------------------------------------------------------------


def concat_in_features(equivariance: str, ndims: int) -> int:
    """Width of the concatenated invariant encoding (reference RENI.py:118-126)."""
    if equivariance == "SO3":
        return ndims + ndims * ndims
    if equivariance == "SO2":
        return 2 * ndims + ndims * ndims + 2
    if equivariance == "None":
        return ndims * 3 + ndims
    raise ValueError(f"unknown equivariance {equivariance!r}")


def film_in_features(equivariance: str, ndims: int) -> tuple[int, int]:
    """(siren_in, mapping_in) widths for FiLM conditioning (RENI.py:548-559).

    Note: for equivariance "None" the reference declares (3N, N)
    (RENI.py:550-551) but its own encoding emits siren input of width N and
    mapping input of width 3N (RENI.py:446-449), which would crash at
    runtime. We implement the intended, consistent widths (N, 3N).
    """
    if equivariance == "SO3":
        return ndims, ndims * ndims
    if equivariance == "SO2":
        return 2 + ndims, ndims * ndims + ndims
    if equivariance == "None":
        return ndims, ndims * 3
    raise ValueError(f"unknown equivariance {equivariance!r}")


def d_feature_width(equivariance: str) -> int:
    """Width of the decomposed per-pixel direction features."""
    return {"SO3": 3, "SO2": 4, "None": 3}[equivariance]


# ---------------------------------------------------------------------------
# concat-form encodings (reference parity; O(npix * N^2) memory)
# ---------------------------------------------------------------------------


def so3_invariant(Z: jnp.ndarray, D: jnp.ndarray) -> jnp.ndarray:
    """SO(3)-invariant concat encoding, (B, npix, N + N^2) (RENI.py:23-28)."""
    G = jnp.einsum("bnc,bmc->bnm", Z, Z)
    innerprod = jnp.einsum("bpc,bnc->bpn", D, Z)
    npix = D.shape[1]
    z_invar = jnp.broadcast_to(
        G.reshape(G.shape[0], 1, -1), (G.shape[0], npix, G.shape[1] * G.shape[2])
    )
    return jnp.concatenate((innerprod, z_invar), axis=2)


def so2_invariant(Z: jnp.ndarray, D: jnp.ndarray) -> jnp.ndarray:
    """SO(2)-invariant concat encoding, (B, npix, 2N + N^2 + 2) (RENI.py:31-53)."""
    Z_xz = jnp.stack((Z[:, :, 0], Z[:, :, 2]), -1)
    D_xz = jnp.stack((D[:, :, 0], D[:, :, 2]), -1)
    G = jnp.einsum("bnc,bmc->bnm", Z_xz, Z_xz)
    npix = D.shape[1]
    z_xz_invar = jnp.broadcast_to(
        G.reshape(G.shape[0], 1, -1), (G.shape[0], npix, G.shape[1] * G.shape[2])
    )
    innerprod = jnp.einsum("bpc,bnc->bpn", D_xz, Z_xz)
    d_xz_norm = jnp.sqrt(D[:, :, 0] ** 2 + D[:, :, 2] ** 2)[..., None]
    z_y = jnp.broadcast_to(
        Z[:, None, :, 1], (Z.shape[0], npix, Z.shape[1])
    )
    d_y = D[:, :, 1][..., None]
    return jnp.concatenate((innerprod, z_xz_invar, d_xz_norm, z_y, d_y), axis=2)


def no_invariance(Z: jnp.ndarray, D: jnp.ndarray) -> jnp.ndarray:
    """Non-invariant concat encoding, (B, npix, N + 3N) (RENI.py:56-60)."""
    innerprod = jnp.einsum("bpc,bnc->bpn", D, Z)
    npix = D.shape[1]
    z_flat = jnp.broadcast_to(
        Z.reshape(Z.shape[0], 1, -1), (Z.shape[0], npix, Z.shape[1] * Z.shape[2])
    )
    return jnp.concatenate((innerprod, z_flat), axis=2)


def invariant_representation(equivariance: str, Z, D):
    """Dispatch matching the reference's InvariantRepresentation selection."""
    return {
        "SO3": so3_invariant,
        "SO2": so2_invariant,
        "None": no_invariance,
    }[equivariance](Z, D)


# ---------------------------------------------------------------------------
# FiLM-form encodings (mapping input is per-IMAGE here; the reference
# replicates it per-pixel and runs the mapping MLP per pixel — same values)
# ---------------------------------------------------------------------------


def film_inputs(
    equivariance: str, Z: jnp.ndarray, D: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(siren_input (B, npix, s), mapping_input (B, m)).

    The mapping input carries only per-image invariants, so unlike the
    reference (RENI.py:407-449, which tiles it to every pixel) we return it
    once per image; the mapping network output is broadcast where needed.
    """
    if equivariance == "SO3":
        siren_in = jnp.einsum("bpc,bnc->bpn", D, Z)
        G = jnp.einsum("bnc,bmc->bnm", Z, Z)
        mapping_in = G.reshape(G.shape[0], -1)
    elif equivariance == "SO2":
        Z_xz = jnp.stack((Z[:, :, 0], Z[:, :, 2]), -1)
        D_xz = jnp.stack((D[:, :, 0], D[:, :, 2]), -1)
        G = jnp.einsum("bnc,bmc->bnm", Z_xz, Z_xz)
        innerprod = jnp.einsum("bpc,bnc->bpn", D_xz, Z_xz)
        d_xz_norm = jnp.sqrt(D[:, :, 0] ** 2 + D[:, :, 2] ** 2)[..., None]
        d_y = D[:, :, 1][..., None]
        siren_in = jnp.concatenate((d_xz_norm, d_y, innerprod), axis=2)
        mapping_in = jnp.concatenate((G.reshape(G.shape[0], -1), Z[:, :, 1]), axis=1)
    elif equivariance == "None":
        siren_in = jnp.einsum("bpc,bnc->bpn", D, Z)
        mapping_in = Z.reshape(Z.shape[0], -1)
    else:
        raise ValueError(f"unknown equivariance {equivariance!r}")
    return siren_in, mapping_in


# ---------------------------------------------------------------------------
# decomposed form (the TPU compute path)
# ---------------------------------------------------------------------------


def d_features(equivariance: str, D: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel direction features for the decomposed first layer.

    Independent of Z, so for a fixed direction grid this is a constant.

    - SO3 / None: D itself, (B, npix, 3).
    - SO2: [D_x, D_z, |D_xz|, D_y], (B, npix, 4).
    """
    if equivariance in ("SO3", "None"):
        return D
    if equivariance == "SO2":
        d_xz_norm = jnp.sqrt(D[:, :, 0] ** 2 + D[:, :, 2] ** 2)
        return jnp.stack((D[:, :, 0], D[:, :, 2], d_xz_norm, D[:, :, 1]), -1)
    raise ValueError(f"unknown equivariance {equivariance!r}")


def z_parts(equivariance: str, Z: jnp.ndarray) -> dict:
    """Per-image pieces of the invariant encoding.

    Returns a dict with:
      - 'proj':  (B, c, N) matrix P such that innerprod = D_proj @ P^T where
                 D_proj is the first c columns of `d_features` (c=3 for
                 SO3/None over D, c=2 for SO2 over D_xz);
      - 'bias_feats': (B, m) per-image features entering only via a
                 per-image bias (G_flat [+ Z_y] or Z_flat).
    """
    B = Z.shape[0]
    if equivariance == "SO3":
        G = jnp.einsum("bnc,bmc->bnm", Z, Z)
        return {"proj": jnp.swapaxes(Z, 1, 2), "bias_feats": G.reshape(B, -1)}
    if equivariance == "SO2":
        Z_xz = jnp.stack((Z[:, :, 0], Z[:, :, 2]), -1)  # (B, N, 2)
        G = jnp.einsum("bnc,bmc->bnm", Z_xz, Z_xz)
        bias_feats = jnp.concatenate((G.reshape(B, -1), Z[:, :, 1]), axis=1)
        return {"proj": jnp.swapaxes(Z_xz, 1, 2), "bias_feats": bias_feats}
    if equivariance == "None":
        return {"proj": jnp.swapaxes(Z, 1, 2), "bias_feats": Z.reshape(B, -1)}
    raise ValueError(f"unknown equivariance {equivariance!r}")
