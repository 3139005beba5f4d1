"""Fused encoding+SIREN Pallas kernel — the north-star hot path (SURVEY §6).

The decoder train step is HBM-bound under plain XLA: each of the six
(M, 256) activation tensors makes HBM round trips in forward and backward
(~10 GB/step at the published workload). This kernel keeps the whole trunk
in VMEM per pixel tile:

- input per pixel is only the 4-wide decomposed direction features
  (see reni_tpu.core.encodings) — 16 B/sample instead of a 1 KB h0 row;
- the per-image latent contraction A = proj @ W_ip and first-layer bias are
  tiny (4 x 256 per image) and computed in XLA outside the kernel, so the
  kernel stays differentiable w.r.t. Z and the first-layer weight through
  the chain rule on (A, bias0);
- hidden layers run as VMEM-resident (TM, H) @ (H, H) MXU matmuls
  (optionally bf16 inputs with f32 accumulation); sin stays f32;
- backward recomputes activations per tile (flash-style) and accumulates
  weight gradients across the sequential TPU grid into constant-indexed
  output blocks;
- with ``fast_sine`` the trunk uses the polynomial sine/cosine from
  core/fastmath.py — on the attached chip the *transcendentals*, not the
  matmuls, dominate (jnp.sin is ~26 VPU ops), and the fast pair takes the
  measured forward from 35.3 to 9.0 ms and backward from 41.5 to 17.3 ms
  at the published workload (PERF.md round-2 table).

Grid: (B, npix / TM). Outputs are channel-padded to 8 lanes; callers slice
[..., :3].
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C_PAD = 8  # output channels padded to one sublane group
K_PAD = 8  # direction-feature width padded (actual <= 4)


def pick_tile(npix: int, tile: int = 512) -> int | None:
    """Largest pixel-tile <= ``tile`` that divides ``npix`` and is
    sublane-aligned (multiple of 8, the f32 second-to-last tiling).

    A divisor search rather than a fixed tile: a 20x40 grid (800 px) gets
    tm=400 and stays on the fast path instead of silently falling back to
    XLA at ~0.6x (round-2 verdict, weak #5). Returns None when no aligned
    divisor exists (npix not a multiple of 8)."""
    if npix <= 0 or npix % 8:
        return None
    best = None
    for tm in range(8, min(tile, npix) + 1, 8):
        if npix % tm == 0:
            best = tm
    return best


def unsupported_reason(
    npix: int,
    hidden_features: int,
    batch: int | None = None,
    tile: int = 512,
    mesh=None,
) -> str | None:
    """Why the fused kernels cannot serve this shape (None = supported).

    Mesh-aware: with an active ``parallel.mesh.kernel_mesh`` (or an explicit
    ``mesh``), the kernel runs per-shard under shard_map, so divisibility is
    checked against the *local* pixel/batch extents, and a model
    (tensor-parallel) axis declines the kernel outright — it assumes
    chip-resident weights."""
    if mesh is None:
        from reni_tpu.parallel.mesh import active_kernel_mesh

        mesh = active_kernel_mesh()
    if mesh is not None:
        if mesh.shape.get("model", 1) > 1:
            return (
                f"mesh has a model (tensor-parallel) axis of size "
                f"{mesh.shape['model']}; the fused kernel needs chip-resident "
                "weights — XLA path with Megatron sharding instead"
            )
        n_px = mesh.shape.get("pixel", 1)
        if npix % n_px:
            return f"npix={npix} not divisible by the pixel axis ({n_px})"
        npix = npix // n_px
        n_dt = mesh.shape.get("data", 1)
        if batch is not None and batch % n_dt:
            return f"batch={batch} not divisible by the data axis ({n_dt})"
    if hidden_features % 128:
        return (
            f"hidden_features={hidden_features} is not a multiple of the "
            "128-lane width"
        )
    if pick_tile(npix, tile) is None:
        return (
            f"per-shard pixel count {npix} has no sublane-aligned tile "
            "divisor (must be a multiple of 8)"
        )
    return None


def kernel_supported(npix: int, hidden_features: int, tile: int = 512) -> bool:
    """Shapes the fused kernels handle; see ``unsupported_reason``."""
    return unsupported_reason(npix, hidden_features, tile=tile) is None


def _kernel_mesh_info():
    """(mesh, n_pixel, sharded): the active kernel mesh and whether the
    dispatch should take the shard_map path (any data/pixel extent > 1)."""
    from reni_tpu.parallel.mesh import active_kernel_mesh

    mesh = active_kernel_mesh()
    if mesh is None:
        return None, 1, False
    n_px = mesh.shape.get("pixel", 1)
    n_dt = mesh.shape.get("data", 1)
    return mesh, n_px, n_px * n_dt > 1


def _matmul(a, b, trunk_dtype):
    if trunk_dtype is not None:
        a = a.astype(trunk_dtype)
        b = b.astype(trunk_dtype)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot(a, b, dims, trunk_dtype):
    """dot_general with optional bf16 inputs, f32 accumulation."""
    if trunk_dtype is not None:
        a = a.astype(trunk_dtype)
        b = b.astype(trunk_dtype)
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32
    )


def _fwd_kernel(
    d_ref, a_ref, b0_ref, ws_ref, bs_ref, wf_ref, bf_ref, out_ref,
    *, n_hidden, omega0, omega_h, trunk_dtype, sine,
):
    d = d_ref[0]  # (TM, K_PAD)
    h = sine(omega0 * (_matmul(d, a_ref[0], trunk_dtype) + b0_ref[0]))
    for i in range(n_hidden):
        h = sine(omega_h * (_matmul(h, ws_ref[i], trunk_dtype) + bs_ref[i]))
    out_ref[0] = _matmul(h, wf_ref[...], trunk_dtype) + bf_ref[0]


def _bwd_kernel(
    d_ref, a_ref, b0_ref, ws_ref, bs_ref, wf_ref, bf_ref, g_ref,
    da_ref, db0_ref, dws_ref, dbs_ref, dwf_ref, dbf_ref,
    *, n_hidden, omega0, omega_h, trunk_dtype, sincos,
):
    b = pl.program_id(0)
    pt = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, pt == 0))
    def _():
        dws_ref[...] = jnp.zeros_like(dws_ref)
        dbs_ref[...] = jnp.zeros_like(dbs_ref)
        dwf_ref[...] = jnp.zeros_like(dwf_ref)
        dbf_ref[...] = jnp.zeros_like(dbf_ref)

    @pl.when(pt == 0)
    def _():
        da_ref[...] = jnp.zeros_like(da_ref)
        db0_ref[...] = jnp.zeros_like(db0_ref)

    d = d_ref[0]  # (TM, K_PAD)
    g = g_ref[0]  # (TM, C_PAD)

    # recompute forward; the joint sincos shares the range reduction
    # between the activation and the sin' chain-rule factor
    h, c = sincos(omega0 * (_matmul(d, a_ref[0], trunk_dtype) + b0_ref[0]))
    hs, cs = [h], [c]
    for i in range(n_hidden):
        h, c = sincos(
            omega_h * (_matmul(hs[-1], ws_ref[i], trunk_dtype) + bs_ref[i])
        )
        hs.append(h)
        cs.append(c)

    # final linear
    dwf_ref[...] += _dot(hs[-1], g, ((0,), (0,)), trunk_dtype)
    dbf_ref[...] += jnp.sum(g, axis=0, keepdims=True)
    dh = _dot(g, wf_ref[...], ((1,), (1,)), trunk_dtype)

    for i in reversed(range(n_hidden)):
        dz = dh * (omega_h * cs[i + 1])
        dws_ref[i] += _dot(hs[i], dz, ((0,), (0,)), trunk_dtype)
        dbs_ref[i] += jnp.sum(dz, axis=0)
        dh = _dot(dz, ws_ref[i], ((1,), (1,)), trunk_dtype)

    dz0 = dh * (omega0 * cs[0])
    da_ref[0] += _dot(d, dz0, ((0,), (0,)), trunk_dtype)
    db0_ref[0] += jnp.sum(dz0, axis=0)


def _film_fwd_kernel(
    d_ref, a0_ref, ws_ref, bs_ref, wf_ref, bf_ref, fr_ref, ph_ref, out_ref,
    *, n_trunk, hidden, trunk_dtype, sine,
):
    d = d_ref[0]  # (TM, K_PAD)
    f = fr_ref[0, 0]  # (T*H,)
    p = ph_ref[0, 0]
    h = None
    for i in range(n_trunk):
        lo = i * hidden
        fi, pi = f[lo : lo + hidden], p[lo : lo + hidden]
        pre = (
            _matmul(d, a0_ref[0], trunk_dtype)
            if i == 0
            else _matmul(h, ws_ref[i - 1], trunk_dtype)
        ) + bs_ref[i]
        h = sine(fi * pre + pi)
    out_ref[0] = _matmul(h, wf_ref[...], trunk_dtype) + bf_ref[0]


def _film_bwd_kernel(
    d_ref, a0_ref, ws_ref, bs_ref, wf_ref, bf_ref, fr_ref, ph_ref, g_ref,
    da0_ref, dws_ref, dbs_ref, dwf_ref, dbf_ref, dfr_ref, dph_ref,
    *, n_trunk, hidden, trunk_dtype, sincos,
):
    b = pl.program_id(0)
    pt = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, pt == 0))
    def _():
        dws_ref[...] = jnp.zeros_like(dws_ref)
        dbs_ref[...] = jnp.zeros_like(dbs_ref)
        dwf_ref[...] = jnp.zeros_like(dwf_ref)
        dbf_ref[...] = jnp.zeros_like(dbf_ref)

    @pl.when(pt == 0)
    def _():
        da0_ref[...] = jnp.zeros_like(da0_ref)
        dfr_ref[...] = jnp.zeros_like(dfr_ref)
        dph_ref[...] = jnp.zeros_like(dph_ref)

    d = d_ref[0]
    f = fr_ref[0, 0]
    p = ph_ref[0, 0]
    g = g_ref[0]
    # recompute forward; joint sincos shares the range reduction between
    # the activation and the sin' chain-rule factor
    pres, hs, coss = [], [], []
    for i in range(n_trunk):
        lo = i * hidden
        fi, pi = f[lo : lo + hidden], p[lo : lo + hidden]
        pre = (
            _matmul(d, a0_ref[0], trunk_dtype)
            if i == 0
            else _matmul(hs[-1], ws_ref[i - 1], trunk_dtype)
        ) + bs_ref[i]
        h, c = sincos(fi * pre + pi)
        pres.append(pre)
        hs.append(h)
        coss.append(c)

    dwf_ref[...] += _dot(hs[-1], g, ((0,), (0,)), trunk_dtype)
    dbf_ref[...] += jnp.sum(g, axis=0, keepdims=True)
    dh = _dot(g, wf_ref[...], ((1,), (1,)), trunk_dtype)

    for i in reversed(range(n_trunk)):
        lo = i * hidden
        fi = f[lo : lo + hidden]
        dmod = dh * coss[i]  # d/d(f*pre + p)
        dfr_ref[0, 0, lo : lo + hidden] += jnp.sum(dmod * pres[i], axis=0)
        dph_ref[0, 0, lo : lo + hidden] += jnp.sum(dmod, axis=0)
        dz = dmod * fi
        dbs_ref[i] += jnp.sum(dz, axis=0)
        if i == 0:
            da0_ref[0] += _dot(d, dz, ((0,), (0,)), trunk_dtype)
        else:
            dws_ref[i - 1] += _dot(hs[i - 1], dz, ((0,), (0,)), trunk_dtype)
            dh = _dot(dz, ws_ref[i - 1], ((1,), (1,)), trunk_dtype)


def _film_calls(
    n_trunk: int,
    hidden: int,
    *,
    tile: int = 512,
    trunk_dtype: Any = jnp.bfloat16,
    interpret: bool = False,
    fast_sine: bool = False,
):
    """(fwd_call, bwd_call) pallas dispatchers for the fused FiLM trunk:

        fwd(d_pad (B_d, npix, 8), A0 (B, 8, H), Ws (T-1, H, H), bs (T, H),
            Wf (H, 8), bf (1, 8), freqs (B, 1, T*H), phases (B, 1, T*H))
        -> (B, npix, 8)

    freqs/phases are the *scaled* modulations (freq*15+30 applied outside).
    """
    from reni_tpu.core.fastmath import sincos_fns, sine_fns

    sine, _ = sine_fns(fast_sine)
    kw = dict(
        n_trunk=n_trunk, hidden=hidden, trunk_dtype=trunk_dtype, sine=sine,
    )
    kw_bwd = {k: v for k, v in kw.items() if k != "sine"}
    kw_bwd["sincos"] = sincos_fns(fast_sine)

    def specs(tm, d_batched):
        d_idx = (lambda b, p: (b, p, 0)) if d_batched else (lambda b, p: (0, p, 0))
        return [
            pl.BlockSpec((1, tm, K_PAD), d_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K_PAD, hidden), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_trunk * hidden), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_trunk * hidden), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM),
        ]

    def fwd_call(d_pad, a0, ws, bs, wf, bf, fr, ph):
        if ws.shape[0] == 0:
            # single-trunk-layer decoder: ws is never read by the kernel,
            # but a zero-extent operand breaks pallas block shapes
            ws = jnp.zeros((1,) + ws.shape[1:], ws.dtype)
        batch, npix = a0.shape[0], d_pad.shape[1]
        tm = min(tile, npix)
        assert npix % tm == 0, (npix, tm)
        return pl.pallas_call(
            functools.partial(_film_fwd_kernel, **kw),
            grid=(batch, npix // tm),
            in_specs=specs(tm, d_pad.shape[0] > 1),
            out_specs=pl.BlockSpec(
                (1, tm, C_PAD), lambda b, p: (b, p, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((batch, npix, C_PAD), jnp.float32),
            interpret=interpret,
        )(d_pad, a0, ws, bs, wf, bf, fr, ph)

    def bwd_call(d_pad, a0, ws, bs, wf, bf, fr, ph, g):
        empty_ws = ws.shape[0] == 0
        if empty_ws:
            ws = jnp.zeros((1,) + ws.shape[1:], ws.dtype)
        batch, npix = a0.shape[0], d_pad.shape[1]
        tm = min(tile, npix)
        grads = pl.pallas_call(
            functools.partial(_film_bwd_kernel, **kw_bwd),
            grid=(batch, npix // tm),
            in_specs=specs(tm, d_pad.shape[0] > 1)
            + [
                pl.BlockSpec((1, tm, C_PAD), lambda b, p: (b, p, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, K_PAD, hidden), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n_trunk * hidden), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n_trunk * hidden), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct(a0.shape, jnp.float32),
                jax.ShapeDtypeStruct(ws.shape, jnp.float32),
                jax.ShapeDtypeStruct(bs.shape, jnp.float32),
                jax.ShapeDtypeStruct(wf.shape, jnp.float32),
                jax.ShapeDtypeStruct(bf.shape, jnp.float32),
                jax.ShapeDtypeStruct(fr.shape, jnp.float32),
                jax.ShapeDtypeStruct(ph.shape, jnp.float32),
            ),
            interpret=interpret,
        )(d_pad, a0, ws, bs, wf, bf, fr, ph, g)
        if empty_ws:
            # cotangent must match the primal's (0, H, H) shape
            grads = (grads[0], grads[1][:0]) + grads[2:]
        return grads

    return fwd_call, bwd_call


def make_fused_film(
    n_trunk: int,
    hidden: int,
    *,
    tile: int = 512,
    trunk_dtype: Any = jnp.bfloat16,
    interpret: bool = False,
    fast_sine: bool = False,
):
    """Fused FiLM decoder trunk (see ``_film_calls`` for the signature).
    Differentiable in everything except d_pad."""
    fwd_call, bwd_call = _film_calls(
        n_trunk, hidden, tile=tile, trunk_dtype=trunk_dtype,
        interpret=interpret, fast_sine=fast_sine,
    )

    @jax.custom_vjp
    def fused(d_pad, a0, ws, bs, wf, bf, fr, ph):
        return fwd_call(d_pad, a0, ws, bs, wf, bf, fr, ph)

    def fused_fwd(*args):
        return fwd_call(*args), args

    def fused_bwd(res, g):
        grads = bwd_call(*res, g)
        return (jnp.zeros_like(res[0]),) + grads

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def make_fused_film_sharded(
    mesh,
    n_trunk: int,
    hidden: int,
    *,
    d_batched: bool,
    tile: int = 512,
    trunk_dtype: Any = jnp.bfloat16,
    interpret: bool = False,
    fast_sine: bool = False,
):
    """The fused FiLM trunk partitioned over the mesh's data/pixel axes —
    same design as ``make_fused_siren_sharded``: per-shard kernel launch
    under shard_map, weight grads psum'd over data+pixel, per-image grads
    (A0, freqs, phases) psum'd over 'pixel' only."""
    from jax.sharding import PartitionSpec as P

    fwd_call, bwd_call = _film_calls(
        n_trunk, hidden, tile=tile, trunk_dtype=trunk_dtype,
        interpret=interpret, fast_sine=fast_sine,
    )
    dn, px = _mesh_axes(mesh)
    d_spec = P(dn if d_batched else None, px, None)
    per_image = P(dn)
    rep = P()
    in_specs = (d_spec, per_image, rep, rep, rep, rep, per_image, per_image)
    out_spec = P(dn, px, None)
    both = tuple(ax for ax in (dn, px) if ax is not None)

    fwd_sm = jax.shard_map(
        fwd_call, mesh=mesh, in_specs=in_specs, out_specs=out_spec,
        check_vma=False,
    )

    def bwd_inner(d_pad, a0, ws, bs, wf, bf, fr, ph, g):
        da0, dws, dbs, dwf, dbf, dfr, dph = bwd_call(
            d_pad, a0, ws, bs, wf, bf, fr, ph, g
        )
        if px is not None:
            da0 = jax.lax.psum(da0, px)
            dfr = jax.lax.psum(dfr, px)
            dph = jax.lax.psum(dph, px)
        if both:
            dws, dbs, dwf, dbf = (
                jax.lax.psum(x, both) for x in (dws, dbs, dwf, dbf)
            )
        return da0, dws, dbs, dwf, dbf, dfr, dph

    bwd_sm = jax.shard_map(
        bwd_inner, mesh=mesh, in_specs=in_specs + (out_spec,),
        out_specs=(per_image, rep, rep, rep, rep, per_image, per_image),
        check_vma=False,
    )

    @jax.custom_vjp
    def fused(d_pad, a0, ws, bs, wf, bf, fr, ph):
        return fwd_sm(d_pad, a0, ws, bs, wf, bf, fr, ph)

    def fused_fwd(*args):
        return fwd_sm(*args), args

    def fused_bwd(res, g):
        grads = bwd_sm(*res, g)
        return (jnp.zeros_like(res[0]),) + tuple(grads)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


@functools.lru_cache(maxsize=16)
def _get_film_kernel(n_trunk, hidden, tile, trunk, interpret, fast_sine):
    dtype = {"bfloat16": jnp.bfloat16, "float32": None}[trunk]
    return make_fused_film(
        n_trunk, hidden, tile=tile, trunk_dtype=dtype, interpret=interpret,
        fast_sine=fast_sine,
    )


@functools.lru_cache(maxsize=16)
def _get_film_kernel_sharded(
    mesh, n_trunk, hidden, tile, trunk, interpret, fast_sine, d_batched,
):
    dtype = {"bfloat16": jnp.bfloat16, "float32": None}[trunk]
    return make_fused_film_sharded(
        mesh, n_trunk, hidden, d_batched=d_batched, tile=tile,
        trunk_dtype=dtype, interpret=interpret, fast_sine=fast_sine,
    )


def fused_film_apply(
    params,
    equivariance: str,
    Z,
    D,
    *,
    hidden_layers: int,
    hidden_features: int,
    out_features: int,
    output_activation: str | None,
    tile: int = 512,
    trunk: str = "bfloat16",
    interpret: bool | None = None,
    fast_sine: bool = False,
):
    """Drop-in for film.apply_film_decomposed on the Pallas path.

    The mapping network (tiny, per-image) runs in XLA; the kernel fuses the
    per-pixel FiLM trunk. D: (1, npix, 3) shared grid. interpret=None
    auto-selects interpret mode off-TPU (Mosaic only targets TPU)."""
    from reni_tpu.core import encodings
    from reni_tpu.models import film as film_lib

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    tile = _env_tile(tile)
    d_feats = encodings.d_features(equivariance, D)  # (B_d, npix, k)
    npix = d_feats.shape[1]
    mesh, n_px, sharded = _kernel_mesh_info()
    reason = unsupported_reason(
        npix, hidden_features, batch=Z.shape[0], tile=tile, mesh=mesh
    )
    if reason:
        raise ValueError(f"unsupported shapes for pallas film path: {reason}")
    tm = pick_tile(npix // n_px, tile)

    parts = encodings.z_parts(equivariance, Z)
    fr, ph = film_lib.apply_mapping_network(
        params["mapping"], parts["bias_feats"]
    )
    fr = (fr * 15.0 + 30.0)[:, None, :]  # (B, 1, T*H)
    ph = ph[:, None, :]

    layer0 = params["layers"][0]
    w0 = layer0["w"]
    if equivariance == "SO2":
        # FiLM siren-input ordering [|D_xz|, D_y, innerprod]; d_features
        # ordering [D_x, D_z, |D_xz|, D_y]
        a0 = jnp.einsum("bcn,nh->bch", parts["proj"], w0[2:])
        a0 = jnp.concatenate(
            (a0, jnp.broadcast_to(w0[:2][None], (a0.shape[0], 2, w0.shape[1]))),
            axis=1,
        )
    else:
        a0 = jnp.einsum("bcn,nh->bch", parts["proj"], w0)
    a0_pad = jnp.pad(a0, ((0, 0), (0, K_PAD - a0.shape[1]), (0, 0)))
    d_pad = jnp.pad(d_feats, ((0, 0), (0, 0), (0, K_PAD - d_feats.shape[-1])))

    n_trunk = hidden_layers
    ws = (
        jnp.stack([l["w"] for l in params["layers"][1:]])
        if n_trunk > 1
        else jnp.zeros((0, hidden_features, hidden_features))
    )
    bs = jnp.stack([l["b"] for l in params["layers"]])
    wf = jnp.pad(params["final"]["w"], ((0, 0), (0, C_PAD - out_features)))
    bf = jnp.pad(params["final"]["b"], ((0, C_PAD - out_features),))[None]

    if sharded:
        kernel = _get_film_kernel_sharded(
            mesh, n_trunk, hidden_features, tm, trunk, interpret, fast_sine,
            d_feats.shape[0] > 1,
        )
    else:
        kernel = _get_film_kernel(
            n_trunk, hidden_features, tm, trunk, interpret, fast_sine
        )
    out = kernel(d_pad, a0_pad, ws, bs, wf, bf, fr, ph)[..., :out_features]
    if output_activation == "exp":
        return jnp.exp(out)
    if output_activation == "tanh":
        return jnp.tanh(out)
    return out


def _siren_calls(
    n_hidden: int,
    hidden: int,
    omega0: float,
    omega_h: float,
    *,
    tile: int = 512,
    trunk_dtype: Any = jnp.bfloat16,
    interpret: bool = False,
    fast_sine: bool = False,
):
    """(fwd_call, bwd_call) pallas dispatchers for the fused trunk:

        fwd(d_pad (B_d, npix, 8), A (B, 8, H), b0 (B, 1, H), Ws (L, H, H),
            bs (L, H), Wf (H, 8), bf (1, 8)) -> (B, npix, 8)

    shared by the single-device custom_vjp (``make_fused_siren``) and the
    shard_map-partitioned variant (``make_fused_siren_sharded``), which
    invokes them per data/pixel shard."""
    from reni_tpu.core.fastmath import sincos_fns, sine_fns

    sine, _ = sine_fns(fast_sine)
    kw = dict(
        n_hidden=n_hidden, omega0=omega0, omega_h=omega_h,
        trunk_dtype=trunk_dtype, sine=sine,
    )
    kw_bwd = {k: v for k, v in kw.items() if k != "sine"}
    kw_bwd["sincos"] = sincos_fns(fast_sine)

    def fwd_call(d_pad, a, b0, ws, bs, wf, bf):
        batch, npix = a.shape[0], d_pad.shape[1]
        tm = min(tile, npix)
        assert npix % tm == 0, (npix, tm)
        grid = (batch, npix // tm)
        d_idx = (
            (lambda b, p: (b, p, 0))
            if d_pad.shape[0] > 1
            else (lambda b, p: (0, p, 0))
        )
        return pl.pallas_call(
            functools.partial(_fwd_kernel, **kw),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, tm, K_PAD), d_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K_PAD, hidden), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, hidden), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, tm, C_PAD), lambda b, p: (b, p, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((batch, npix, C_PAD), jnp.float32),
            interpret=interpret,
        )(d_pad, a, b0, ws, bs, wf, bf)

    def bwd_call(d_pad, a, b0, ws, bs, wf, bf, g):
        batch, npix = a.shape[0], d_pad.shape[1]
        tm = min(tile, npix)
        grid = (batch, npix // tm)
        d_idx = (
            (lambda b, p: (b, p, 0))
            if d_pad.shape[0] > 1
            else (lambda b, p: (0, p, 0))
        )
        out_shapes = (
            jax.ShapeDtypeStruct(a.shape, jnp.float32),
            jax.ShapeDtypeStruct(b0.shape, jnp.float32),
            jax.ShapeDtypeStruct(ws.shape, jnp.float32),
            jax.ShapeDtypeStruct(bs.shape, jnp.float32),
            jax.ShapeDtypeStruct(wf.shape, jnp.float32),
            jax.ShapeDtypeStruct(bf.shape, jnp.float32),
        )
        return pl.pallas_call(
            functools.partial(_bwd_kernel, **kw_bwd),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, tm, K_PAD), d_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K_PAD, hidden), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, hidden), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tm, C_PAD), lambda b, p: (b, p, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, K_PAD, hidden), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, hidden), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=out_shapes,
            interpret=interpret,
        )(d_pad, a, b0, ws, bs, wf, bf, g)

    return fwd_call, bwd_call


def make_fused_siren(
    n_hidden: int,
    hidden: int,
    omega0: float,
    omega_h: float,
    *,
    tile: int = 512,
    trunk_dtype: Any = jnp.bfloat16,
    interpret: bool = False,
    fast_sine: bool = False,
):
    """Build the fused decoder trunk (see ``_siren_calls`` for signature).

    Differentiable in everything except d_pad (directions are constants).
    """
    fwd_call, bwd_call = _siren_calls(
        n_hidden, hidden, omega0, omega_h,
        tile=tile, trunk_dtype=trunk_dtype, interpret=interpret,
        fast_sine=fast_sine,
    )

    @jax.custom_vjp
    def fused(d_pad, a, b0, ws, bs, wf, bf):
        return fwd_call(d_pad, a, b0, ws, bs, wf, bf)

    def fused_fwd(d_pad, a, b0, ws, bs, wf, bf):
        out = fwd_call(d_pad, a, b0, ws, bs, wf, bf)
        return out, (d_pad, a, b0, ws, bs, wf, bf)

    def fused_bwd(res, g):
        d_pad, a, b0, ws, bs, wf, bf = res
        da, db0, dws, dbs, dwf, dbf = bwd_call(d_pad, a, b0, ws, bs, wf, bf, g)
        return jnp.zeros_like(d_pad), da, db0, dws, dbs, dwf, dbf

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def _mesh_axes(mesh) -> tuple[str | None, str | None]:
    """('data' | None, 'pixel' | None) as present in the mesh (the flat
    decode mesh carries only 'pixel'). Size-1 axes are kept — sharding over
    them is a no-op and psum over them is identity."""
    dn = "data" if "data" in mesh.axis_names else None
    px = "pixel" if "pixel" in mesh.axis_names else None
    return dn, px


def make_fused_siren_sharded(
    mesh,
    n_hidden: int,
    hidden: int,
    omega0: float,
    omega_h: float,
    *,
    d_batched: bool,
    tile: int = 512,
    trunk_dtype: Any = jnp.bfloat16,
    interpret: bool = False,
    fast_sine: bool = False,
):
    """The fused trunk partitioned over the mesh's data/pixel axes.

    GSPMD treats ``pallas_call`` as an opaque custom call and would
    all-gather sharded operands around it, destroying DP scaling of the
    shipped default (TPU.USE_PALLAS; round-2 verdict weak #1). The kernel is
    per-(batch row, pixel tile) independent, so ``shard_map`` is the exact
    fit: each device runs the kernel on its local (B/n_data, npix/n_pixel)
    block; the backward psums weight grads over both axes (DDP's all-reduce,
    reference run.py:97) and per-image grads (A, b0) over 'pixel' only.

    ``tile`` must already be chosen for the LOCAL pixel extent
    (``pick_tile(npix // n_pixel)``); ``d_batched`` is static because the
    direction operand's in_spec depends on it."""
    from jax.sharding import PartitionSpec as P

    fwd_call, bwd_call = _siren_calls(
        n_hidden, hidden, omega0, omega_h,
        tile=tile, trunk_dtype=trunk_dtype, interpret=interpret,
        fast_sine=fast_sine,
    )
    dn, px = _mesh_axes(mesh)
    d_spec = P(dn if d_batched else None, px, None)
    per_image = P(dn)  # A (B, 8, H) and b0 (B, 1, H): batch rows on 'data'
    rep = P()
    in_specs = (d_spec, per_image, per_image, rep, rep, rep, rep)
    out_spec = P(dn, px, None)
    both = tuple(ax for ax in (dn, px) if ax is not None)

    fwd_sm = jax.shard_map(
        fwd_call, mesh=mesh, in_specs=in_specs, out_specs=out_spec,
        check_vma=False,
    )

    def bwd_inner(d_pad, a, b0, ws, bs, wf, bf, g):
        da, db0, dws, dbs, dwf, dbf = bwd_call(d_pad, a, b0, ws, bs, wf, bf, g)
        if px is not None:
            # per-image grads: each pixel shard holds a partial sum
            da = jax.lax.psum(da, px)
            db0 = jax.lax.psum(db0, px)
        if both:
            # weight grads: partial over local batch rows AND pixel tiles
            dws, dbs, dwf, dbf = (
                jax.lax.psum(x, both) for x in (dws, dbs, dwf, dbf)
            )
        return da, db0, dws, dbs, dwf, dbf

    bwd_sm = jax.shard_map(
        bwd_inner, mesh=mesh, in_specs=in_specs + (out_spec,),
        out_specs=(per_image, per_image, rep, rep, rep, rep),
        check_vma=False,
    )

    @jax.custom_vjp
    def fused(d_pad, a, b0, ws, bs, wf, bf):
        return fwd_sm(d_pad, a, b0, ws, bs, wf, bf)

    def fused_fwd(*args):
        return fwd_sm(*args), args

    def fused_bwd(res, g):
        da, db0, dws, dbs, dwf, dbf = bwd_sm(*res, g)
        return jnp.zeros_like(res[0]), da, db0, dws, dbs, dwf, dbf

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


# ---------------------------------------------------------------------------
# model-facing wrapper: pack RENI concat-layout params into kernel layout
# ---------------------------------------------------------------------------


def pack_inputs(params, equivariance: str, ndims: int, Z, d_feats):
    """XLA-side prep: per-image A/bias0 from the first-layer weight split
    (differentiable w.r.t. Z and the decoder), padded kernel weights."""
    from reni_tpu.models import siren as siren_lib

    layer0 = params["layers"][0]
    w_ip, w_bias, w_direct = siren_lib.split_first_layer(
        layer0["w"], equivariance, ndims
    )
    from reni_tpu.core import encodings

    parts = encodings.z_parts(equivariance, Z)
    a = jnp.einsum("bcn,nh->bch", parts["proj"], w_ip)  # (B, c, H)
    c = a.shape[1]
    if w_direct is not None:
        a = jnp.concatenate(
            (a, jnp.broadcast_to(w_direct[None], (a.shape[0],) + w_direct.shape)),
            axis=1,
        )
    k = a.shape[1]
    a_pad = jnp.pad(a, ((0, 0), (0, K_PAD - k), (0, 0)))
    b0 = (
        jnp.einsum("bm,mh->bh", parts["bias_feats"], w_bias) + layer0["b"]
    )[:, None, :]  # (B, 1, H) — sublane-aligned block shape for the kernel

    d_pad = jnp.pad(
        d_feats, ((0, 0),) * (d_feats.ndim - 1) + ((0, K_PAD - d_feats.shape[-1]),)
    )

    ws = jnp.stack([l["w"] for l in params["layers"][1:]])  # (L, H, H)
    bs = jnp.stack([l["b"] for l in params["layers"][1:]])  # (L, H)
    wf = params["final"]["w"]  # (H, out)
    bf = params["final"]["b"]
    wf_pad = jnp.pad(wf, ((0, 0), (0, C_PAD - wf.shape[-1])))
    bf_pad = jnp.pad(bf, ((0, C_PAD - bf.shape[-1]),))[None]
    return d_pad, a_pad, b0, ws, bs, wf_pad, bf_pad


@functools.lru_cache(maxsize=16)
def _get_kernel(
    n_hidden, hidden, omega0, omega_h, tile, trunk, interpret, fast_sine,
):
    dtype = {"bfloat16": jnp.bfloat16, "float32": None}[trunk]
    return make_fused_siren(
        n_hidden, hidden, omega0, omega_h,
        tile=tile, trunk_dtype=dtype, interpret=interpret, fast_sine=fast_sine,
    )


@functools.lru_cache(maxsize=16)
def _get_kernel_sharded(
    mesh, n_hidden, hidden, omega0, omega_h, tile, trunk, interpret,
    fast_sine, d_batched,
):
    dtype = {"bfloat16": jnp.bfloat16, "float32": None}[trunk]
    return make_fused_siren_sharded(
        mesh, n_hidden, hidden, omega0, omega_h, d_batched=d_batched,
        tile=tile, trunk_dtype=dtype, interpret=interpret, fast_sine=fast_sine,
    )


def _env_tile(tile: int) -> int:
    """Tile-size cap after the RENI_TPU_PALLAS_TILE override (0/unset =
    caller's value). Exists for on-chip A/B sweeps (PERF.md bwd anatomy);
    pick_tile still rounds to an aligned divisor of the pixel count."""
    import os

    return int(os.environ.get("RENI_TPU_PALLAS_TILE", "0")) or tile


def fused_apply(
    params,
    equivariance: str,
    ndims: int,
    Z,
    D,
    *,
    hidden_layers: int,
    hidden_features: int,
    out_features: int,
    first_omega_0: float,
    hidden_omega_0: float,
    output_activation: str | None,
    tile: int = 512,
    trunk: str = "bfloat16",
    interpret: bool | None = None,
    fast_sine: bool = False,
):
    """Drop-in for siren.apply_siren_decomposed on the Pallas path.

    D: (1, npix, 3) shared grid, or (B, npix, 3) per-image grids (each
    image's tiles read their own direction block). interpret=None
    auto-selects interpret mode off-TPU (Mosaic only targets TPU)."""
    from reni_tpu.core import encodings

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    tile = _env_tile(tile)
    d_feats = encodings.d_features(equivariance, D)  # (B_d, npix, k)
    npix = d_feats.shape[1]
    mesh, n_px, sharded = _kernel_mesh_info()
    reason = unsupported_reason(
        npix, hidden_features, batch=Z.shape[0], tile=tile, mesh=mesh
    )
    if reason:
        raise ValueError(f"unsupported shapes for pallas path: {reason}")
    tm = pick_tile(npix // n_px, tile)

    d_pad, a_pad, b0, ws, bs, wf_pad, bf_pad = pack_inputs(
        params, equivariance, ndims, Z, d_feats
    )
    if sharded:
        kernel = _get_kernel_sharded(
            mesh, hidden_layers, hidden_features, first_omega_0,
            hidden_omega_0, tm, trunk, interpret, fast_sine,
            d_feats.shape[0] > 1,
        )
    else:
        kernel = _get_kernel(
            hidden_layers, hidden_features, first_omega_0, hidden_omega_0,
            tm, trunk, interpret, fast_sine,
        )
    out = kernel(d_pad, a_pad, b0, ws, bs, wf_pad, bf_pad)[..., :out_features]
    if output_activation == "exp":
        return jnp.exp(out)
    if output_activation == "tanh":
        return jnp.tanh(out)
    return out


# ---------------------------------------------------------------------------
# fused TRAIN-STEP kernel: forward + weighted-MSE loss + full backward in
# ONE pallas launch
# ---------------------------------------------------------------------------
#
# The r4 bwd anatomy (benchmarks/results/r4/anatomy.json, PERF.md) measured
# the two-kernel train step as purely ADDITIVE costs: fwd 31.2 ms
# (matmuls 18.7 + sine 12.5) + bwd 57.4 ms (matmuls-incl-recompute 28.6 +
# sincos 15.0 + dW/elementwise 13.8) at the saturated batch. The backward
# already recomputes the whole forward, so running the forward separately
# (plus the XLA loss/elementwise pass between the kernels, plus the
# (B, npix, 8) out/g HBM round trips) buys nothing. This kernel computes
# the FIT_DECODER objective's weighted MSE (reference
# loss_functions.py:6-13 semantics: mean over pixels*channels per sample,
# sum over batch) AND every parameter gradient in a single pass:
#
# - forward trunk once per tile with the JOINT sincos (the cos chain-rule
#   factor costs ~0.3x a second sine, vs a full fwd sine + bwd sincos);
# - output activation, residual, per-lane loss partials, and the output
#   cotangent g = 2 * (out - tgt) * sw * act'(o) / (npix * C) computed
#   in-register (no out/g HBM traffic at all);
# - backward chain exactly as _bwd_kernel.
#
# Because the result is a SCALAR, the custom_vjp can compute the gradients
# in the PRIMAL pass and stash them as residuals — the vjp just scales
# them by the incoming cotangent. One kernel launch per optimizer step.


def _step_kernel(
    d_ref, a_ref, b0_ref, ws_ref, bs_ref, wf_ref, bf_ref,
    tgt_ref, sw_ref, bm_ref,
    mse_ref, da_ref, db0_ref, dws_ref, dbs_ref, dwf_ref, dbf_ref,
    *, n_hidden, omega0, omega_h, trunk_dtype, sincos, out_act, gscale,
):
    b = pl.program_id(0)
    pt = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, pt == 0))
    def _():
        mse_ref[...] = jnp.zeros_like(mse_ref)
        dws_ref[...] = jnp.zeros_like(dws_ref)
        dbs_ref[...] = jnp.zeros_like(dbs_ref)
        dwf_ref[...] = jnp.zeros_like(dwf_ref)
        dbf_ref[...] = jnp.zeros_like(dbf_ref)

    @pl.when(pt == 0)
    def _():
        da_ref[...] = jnp.zeros_like(da_ref)
        db0_ref[...] = jnp.zeros_like(db0_ref)

    d = d_ref[0]  # (TM, K_PAD)

    # forward, keeping activations and cos factors in VMEM for the tile
    h, c = sincos(omega0 * (_matmul(d, a_ref[0], trunk_dtype) + b0_ref[0]))
    hs, cs = [h], [c]
    for i in range(n_hidden):
        h, c = sincos(
            omega_h * (_matmul(hs[-1], ws_ref[i], trunk_dtype) + bs_ref[i])
        )
        hs.append(h)
        cs.append(c)
    o = _matmul(hs[-1], wf_ref[...], trunk_dtype) + bf_ref[0]  # (TM, C_PAD)

    if out_act == "tanh":
        out = jnp.tanh(o)
        dact = 1.0 - out * out
    elif out_act == "exp":
        out = jnp.exp(o)
        dact = out
    else:
        out = o
        dact = None

    # loss partials + output cotangent (padded lanes carry sw == 0)
    swm = sw_ref[0] * bm_ref[0]  # (TM, C_PAD) * (1, C_PAD)
    r = out - tgt_ref[0]
    rs = r * swm
    mse_ref[...] += jnp.sum(rs * r, axis=0, keepdims=True)
    g = (2.0 * gscale) * rs
    if dact is not None:
        g = g * dact

    # backward chain (identical to _bwd_kernel)
    dwf_ref[...] += _dot(hs[-1], g, ((0,), (0,)), trunk_dtype)
    dbf_ref[...] += jnp.sum(g, axis=0, keepdims=True)
    dh = _dot(g, wf_ref[...], ((1,), (1,)), trunk_dtype)

    for i in reversed(range(n_hidden)):
        dz = dh * (omega_h * cs[i + 1])
        dws_ref[i] += _dot(hs[i], dz, ((0,), (0,)), trunk_dtype)
        dbs_ref[i] += jnp.sum(dz, axis=0)
        dh = _dot(dz, ws_ref[i], ((1,), (1,)), trunk_dtype)

    dz0 = dh * (omega0 * cs[0])
    da_ref[0] += _dot(d, dz0, ((0,), (0,)), trunk_dtype)
    db0_ref[0] += jnp.sum(dz0, axis=0)


def _step_call_builder(
    n_hidden: int,
    hidden: int,
    omega0: float,
    omega_h: float,
    *,
    out_act: str | None,
    gscale: float,
    tile: int = 512,
    trunk_dtype: Any = jnp.bfloat16,
    interpret: bool = False,
    fast_sine: bool = False,
):
    """step_call(d_pad (B_d, npix, 8), A (B, 8, H), b0 (B, 1, H),
    Ws (L, H, H), bs (L, H), Wf (H, 8), bf (1, 8), tgt (B, npix, 8),
    sw (1, npix, 8), bm (B, 1, 8))
    -> (mse_row (1, 8), dA, db0, dWs, dbs, dWf, dbf)

    mse_row holds per-lane partial sums of (out - tgt)^2 * sw * bm over the
    whole grid; sum(mse_row) * gscale is the reference weighted_mse. The
    gradients correspond to that scaled loss (gscale baked into g)."""
    from reni_tpu.core.fastmath import sincos_fns

    kw = dict(
        n_hidden=n_hidden, omega0=omega0, omega_h=omega_h,
        trunk_dtype=trunk_dtype, sincos=sincos_fns(fast_sine),
        out_act=out_act, gscale=gscale,
    )

    def step_call(d_pad, a, b0, ws, bs, wf, bf, tgt, sw, bm):
        batch, npix = a.shape[0], d_pad.shape[1]
        tm = min(tile, npix)
        assert npix % tm == 0, (npix, tm)
        grid = (batch, npix // tm)
        d_idx = (
            (lambda b, p: (b, p, 0))
            if d_pad.shape[0] > 1
            else (lambda b, p: (0, p, 0))
        )
        return pl.pallas_call(
            functools.partial(_step_kernel, **kw),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, tm, K_PAD), d_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K_PAD, hidden), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, hidden), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tm, C_PAD), lambda b, p: (b, p, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tm, C_PAD), lambda b, p: (0, p, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, C_PAD), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, C_PAD), lambda b, p: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K_PAD, hidden), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, hidden), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((1, C_PAD), jnp.float32),
                jax.ShapeDtypeStruct(a.shape, jnp.float32),
                jax.ShapeDtypeStruct(b0.shape, jnp.float32),
                jax.ShapeDtypeStruct(ws.shape, jnp.float32),
                jax.ShapeDtypeStruct(bs.shape, jnp.float32),
                jax.ShapeDtypeStruct(wf.shape, jnp.float32),
                jax.ShapeDtypeStruct(bf.shape, jnp.float32),
            ),
            interpret=interpret,
        )(d_pad, a, b0, ws, bs, wf, bf, tgt, sw, bm)

    return step_call


def _wrap_step_vjp(step_call, gscale: float):
    """custom_vjp around a (possibly shard_mapped) step_call: the primal
    pass already computed every gradient (scalar-valued function), so the
    vjp just scales the stashed residuals by the incoming cotangent."""

    @jax.custom_vjp
    def fused(d_pad, a, b0, ws, bs, wf, bf, tgt, sw, bm):
        mse_row = step_call(d_pad, a, b0, ws, bs, wf, bf, tgt, sw, bm)[0]
        return jnp.sum(mse_row) * gscale

    def fused_fwd(d_pad, a, b0, ws, bs, wf, bf, tgt, sw, bm):
        mse_row, da, db0, dws, dbs, dwf, dbf = step_call(
            d_pad, a, b0, ws, bs, wf, bf, tgt, sw, bm
        )
        res = (da, db0, dws, dbs, dwf, dbf, d_pad, tgt, sw, bm)
        return jnp.sum(mse_row) * gscale, res

    def fused_bwd(res, ct):
        da, db0, dws, dbs, dwf, dbf, d_pad, tgt, sw, bm = res
        # targets/weights/mask cotangents are structurally required but
        # unused (constants per step); XLA dead-code-eliminates the zeros
        return (
            jnp.zeros_like(d_pad),
            ct * da, ct * db0, ct * dws, ct * dbs, ct * dwf, ct * dbf,
            jnp.zeros_like(tgt), jnp.zeros_like(sw), jnp.zeros_like(bm),
        )

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


@functools.lru_cache(maxsize=16)
def _get_step_kernel(
    n_hidden, hidden, omega0, omega_h, tile, trunk, interpret, fast_sine,
    out_act, gscale,
):
    dtype = {"bfloat16": jnp.bfloat16, "float32": None}[trunk]
    call = _step_call_builder(
        n_hidden, hidden, omega0, omega_h, out_act=out_act, gscale=gscale,
        tile=tile, trunk_dtype=dtype, interpret=interpret,
        fast_sine=fast_sine,
    )
    return _wrap_step_vjp(call, gscale)


@functools.lru_cache(maxsize=16)
def _get_step_kernel_sharded(
    mesh, n_hidden, hidden, omega0, omega_h, tile, trunk, interpret,
    fast_sine, out_act, gscale, d_batched,
):
    """The fused train-step partitioned over the mesh's data/pixel axes:
    per-shard kernel under shard_map; weight grads and the loss partial
    psum over data+pixel, per-image grads (A, b0) over 'pixel' only —
    same collective plan as make_fused_siren_sharded."""
    from jax.sharding import PartitionSpec as P

    dtype = {"bfloat16": jnp.bfloat16, "float32": None}[trunk]
    call = _step_call_builder(
        n_hidden, hidden, omega0, omega_h, out_act=out_act, gscale=gscale,
        tile=tile, trunk_dtype=dtype, interpret=interpret,
        fast_sine=fast_sine,
    )
    dn, px = _mesh_axes(mesh)
    d_spec = P(dn if d_batched else None, px, None)
    per_image = P(dn)
    rep = P()
    in_specs = (
        d_spec, per_image, per_image, rep, rep, rep, rep,
        P(dn, px, None),  # targets: batch rows x pixel shards
        P(None, px, None),  # sineweight: shared across batch
        per_image,  # bmask row
    )
    both = tuple(ax for ax in (dn, px) if ax is not None)

    def inner(d_pad, a, b0, ws, bs, wf, bf, tgt, sw, bm):
        mse_row, da, db0, dws, dbs, dwf, dbf = call(
            d_pad, a, b0, ws, bs, wf, bf, tgt, sw, bm
        )
        if px is not None:
            da = jax.lax.psum(da, px)
            db0 = jax.lax.psum(db0, px)
        if both:
            mse_row, dws, dbs, dwf, dbf = (
                jax.lax.psum(x, both) for x in (mse_row, dws, dbs, dwf, dbf)
            )
        return mse_row, da, db0, dws, dbs, dwf, dbf

    sm = jax.shard_map(
        inner, mesh=mesh, in_specs=in_specs,
        out_specs=(rep, per_image, per_image, rep, rep, rep, rep),
        check_vma=False,
    )
    return _wrap_step_vjp(sm, gscale)


def fused_step_mse(
    params,
    equivariance: str,
    ndims: int,
    Z,
    D,
    targets,
    sineweight,
    bmask,
    *,
    hidden_layers: int,
    hidden_features: int,
    out_features: int,
    first_omega_0: float,
    hidden_omega_0: float,
    output_activation: str | None,
    tile: int = 512,
    trunk: str = "bfloat16",
    interpret: bool | None = None,
    fast_sine: bool = False,
):
    """The FIT_DECODER objective's weighted MSE through the single-launch
    train-step kernel: exactly
    ``losses.weighted_mse(act(decode(Z, D)), targets, sineweight * bmask)``
    (reference loss_functions.py:6-13 reduction), differentiable w.r.t. Z
    and every decoder parameter. targets (B, npix, C), sineweight
    (1, npix, C), bmask (B,). One pallas launch computes the value AND all
    gradients (see _step_kernel header)."""
    from reni_tpu.core import encodings

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    tile = _env_tile(tile)
    d_feats = encodings.d_features(equivariance, D)  # (B_d, npix, k)
    npix = d_feats.shape[1]
    mesh, n_px, sharded = _kernel_mesh_info()
    reason = unsupported_reason(
        npix, hidden_features, batch=Z.shape[0], tile=tile, mesh=mesh
    )
    if reason:
        raise ValueError(f"unsupported shapes for pallas step path: {reason}")
    tm = pick_tile(npix // n_px, tile)

    d_pad, a_pad, b0, ws, bs, wf_pad, bf_pad = pack_inputs(
        params, equivariance, ndims, Z, d_feats
    )
    c = targets.shape[-1]
    tgt = jnp.pad(targets, ((0, 0), (0, 0), (0, C_PAD - c)))
    sw = jnp.pad(sineweight, ((0, 0), (0, 0), (0, C_PAD - sineweight.shape[-1])))
    bm = jnp.broadcast_to(
        bmask[:, None, None].astype(jnp.float32),
        (bmask.shape[0], 1, C_PAD),
    )
    # weighted_mse = sum(se * sw) / (pixels * channels per sample); the
    # denominator uses GLOBAL npix (shards hold partials) and the REAL
    # channel count (padded lanes carry zero weight)
    gscale = 1.0 / float(npix * out_features)

    if sharded:
        kernel = _get_step_kernel_sharded(
            mesh, hidden_layers, hidden_features, first_omega_0,
            hidden_omega_0, tm, trunk, interpret, fast_sine,
            output_activation, gscale, d_feats.shape[0] > 1,
        )
    else:
        kernel = _get_step_kernel(
            hidden_layers, hidden_features, first_omega_0, hidden_omega_0,
            tm, trunk, interpret, fast_sine, output_activation, gscale,
        )
    return kernel(d_pad, a_pad, b0, ws, bs, wf_pad, bf_pad, tgt, sw, bm)


def _film_step_kernel(
    d_ref, a0_ref, ws_ref, bs_ref, wf_ref, bf_ref, fr_ref, ph_ref,
    tgt_ref, sw_ref, bm_ref,
    mse_ref, da0_ref, dws_ref, dbs_ref, dwf_ref, dbf_ref, dfr_ref, dph_ref,
    *, n_trunk, hidden, trunk_dtype, sincos, out_act, gscale,
):
    """FiLM variant of _step_kernel: forward + weighted-MSE partials +
    full backward (incl. freq/phase modulation grads) in one launch."""
    b = pl.program_id(0)
    pt = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, pt == 0))
    def _():
        mse_ref[...] = jnp.zeros_like(mse_ref)
        dws_ref[...] = jnp.zeros_like(dws_ref)
        dbs_ref[...] = jnp.zeros_like(dbs_ref)
        dwf_ref[...] = jnp.zeros_like(dwf_ref)
        dbf_ref[...] = jnp.zeros_like(dbf_ref)

    @pl.when(pt == 0)
    def _():
        da0_ref[...] = jnp.zeros_like(da0_ref)
        dfr_ref[...] = jnp.zeros_like(dfr_ref)
        dph_ref[...] = jnp.zeros_like(dph_ref)

    d = d_ref[0]
    f = fr_ref[0, 0]
    p = ph_ref[0, 0]

    pres, hs, coss = [], [], []
    for i in range(n_trunk):
        lo = i * hidden
        fi, pi = f[lo : lo + hidden], p[lo : lo + hidden]
        pre = (
            _matmul(d, a0_ref[0], trunk_dtype)
            if i == 0
            else _matmul(hs[-1], ws_ref[i - 1], trunk_dtype)
        ) + bs_ref[i]
        h, c = sincos(fi * pre + pi)
        pres.append(pre)
        hs.append(h)
        coss.append(c)
    o = _matmul(hs[-1], wf_ref[...], trunk_dtype) + bf_ref[0]

    if out_act == "tanh":
        out = jnp.tanh(o)
        dact = 1.0 - out * out
    elif out_act == "exp":
        out = jnp.exp(o)
        dact = out
    else:
        out = o
        dact = None

    swm = sw_ref[0] * bm_ref[0]
    r = out - tgt_ref[0]
    rs = r * swm
    mse_ref[...] += jnp.sum(rs * r, axis=0, keepdims=True)
    g = (2.0 * gscale) * rs
    if dact is not None:
        g = g * dact

    dwf_ref[...] += _dot(hs[-1], g, ((0,), (0,)), trunk_dtype)
    dbf_ref[...] += jnp.sum(g, axis=0, keepdims=True)
    dh = _dot(g, wf_ref[...], ((1,), (1,)), trunk_dtype)

    for i in reversed(range(n_trunk)):
        lo = i * hidden
        fi = f[lo : lo + hidden]
        dmod = dh * coss[i]  # d/d(f*pre + p)
        dfr_ref[0, 0, lo : lo + hidden] += jnp.sum(dmod * pres[i], axis=0)
        dph_ref[0, 0, lo : lo + hidden] += jnp.sum(dmod, axis=0)
        dz = dmod * fi
        dbs_ref[i] += jnp.sum(dz, axis=0)
        if i == 0:
            da0_ref[0] += _dot(d, dz, ((0,), (0,)), trunk_dtype)
        else:
            dws_ref[i - 1] += _dot(hs[i - 1], dz, ((0,), (0,)), trunk_dtype)
            dh = _dot(dz, ws_ref[i - 1], ((1,), (1,)), trunk_dtype)


def _film_step_call_builder(
    n_trunk: int,
    hidden: int,
    *,
    out_act: str | None,
    gscale: float,
    tile: int = 512,
    trunk_dtype: Any = jnp.bfloat16,
    interpret: bool = False,
    fast_sine: bool = False,
):
    """step_call(d_pad, A0 (B, 8, H), Ws (T-1, H, H), bs (T, H), Wf (H, 8),
    bf (1, 8), freqs (B, 1, T*H), phases (B, 1, T*H), tgt (B, npix, 8),
    sw (1, npix, 8), bm (B, 1, 8))
    -> (mse_row (1, 8), dA0, dWs, dbs, dWf, dbf, dfreqs, dphases)."""
    from reni_tpu.core.fastmath import sincos_fns

    kw = dict(
        n_trunk=n_trunk, hidden=hidden, trunk_dtype=trunk_dtype,
        sincos=sincos_fns(fast_sine), out_act=out_act, gscale=gscale,
    )

    def step_call(d_pad, a0, ws, bs, wf, bf, fr, ph, tgt, sw, bm):
        empty_ws = ws.shape[0] == 0
        real_ws_shape = ws.shape
        if empty_ws:
            ws = jnp.zeros((1,) + ws.shape[1:], ws.dtype)
        batch, npix = a0.shape[0], d_pad.shape[1]
        tm = min(tile, npix)
        assert npix % tm == 0, (npix, tm)
        grid = (batch, npix // tm)
        d_idx = (
            (lambda b, p: (b, p, 0))
            if d_pad.shape[0] > 1
            else (lambda b, p: (0, p, 0))
        )
        th = n_trunk * hidden
        outs = pl.pallas_call(
            functools.partial(_film_step_kernel, **kw),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, tm, K_PAD), d_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K_PAD, hidden), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, th), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, th), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tm, C_PAD), lambda b, p: (b, p, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tm, C_PAD), lambda b, p: (0, p, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, C_PAD), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, C_PAD), lambda b, p: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K_PAD, hidden), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, th), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, th), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((1, C_PAD), jnp.float32),
                jax.ShapeDtypeStruct(a0.shape, jnp.float32),
                jax.ShapeDtypeStruct(ws.shape, jnp.float32),
                jax.ShapeDtypeStruct(bs.shape, jnp.float32),
                jax.ShapeDtypeStruct(wf.shape, jnp.float32),
                jax.ShapeDtypeStruct(bf.shape, jnp.float32),
                jax.ShapeDtypeStruct(fr.shape, jnp.float32),
                jax.ShapeDtypeStruct(ph.shape, jnp.float32),
            ),
            interpret=interpret,
        )(d_pad, a0, ws, bs, wf, bf, fr, ph, tgt, sw, bm)
        if empty_ws:
            outs = outs[:2] + (outs[2][:0].reshape(real_ws_shape),) + outs[3:]
        return outs

    return step_call


def _wrap_film_step_vjp(step_call, gscale: float):
    """custom_vjp around a FiLM step_call (same primal-pass-gradients
    trick as _wrap_step_vjp)."""

    @jax.custom_vjp
    def fused(d_pad, a0, ws, bs, wf, bf, fr, ph, tgt, sw, bm):
        mse_row = step_call(d_pad, a0, ws, bs, wf, bf, fr, ph, tgt, sw, bm)[0]
        return jnp.sum(mse_row) * gscale

    def fused_fwd(d_pad, a0, ws, bs, wf, bf, fr, ph, tgt, sw, bm):
        outs = step_call(d_pad, a0, ws, bs, wf, bf, fr, ph, tgt, sw, bm)
        mse_row, grads = outs[0], outs[1:]
        return jnp.sum(mse_row) * gscale, (grads, d_pad, tgt, sw, bm)

    def fused_bwd(res, ct):
        (da0, dws, dbs, dwf, dbf, dfr, dph), d_pad, tgt, sw, bm = res
        return (
            jnp.zeros_like(d_pad),
            ct * da0, ct * dws, ct * dbs, ct * dwf, ct * dbf,
            ct * dfr, ct * dph,
            jnp.zeros_like(tgt), jnp.zeros_like(sw), jnp.zeros_like(bm),
        )

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


@functools.lru_cache(maxsize=16)
def _get_film_step_kernel(
    n_trunk, hidden, tile, trunk, interpret, fast_sine, out_act, gscale,
):
    dtype = {"bfloat16": jnp.bfloat16, "float32": None}[trunk]
    call = _film_step_call_builder(
        n_trunk, hidden, out_act=out_act, gscale=gscale, tile=tile,
        trunk_dtype=dtype, interpret=interpret, fast_sine=fast_sine,
    )
    return _wrap_film_step_vjp(call, gscale)


@functools.lru_cache(maxsize=16)
def _get_film_step_kernel_sharded(
    mesh, n_trunk, hidden, tile, trunk, interpret, fast_sine, out_act,
    gscale, d_batched,
):
    """shard_map-partitioned FiLM train step (collective plan identical
    to make_fused_film_sharded, plus the loss-partial psum)."""
    from jax.sharding import PartitionSpec as P

    dtype = {"bfloat16": jnp.bfloat16, "float32": None}[trunk]
    call = _film_step_call_builder(
        n_trunk, hidden, out_act=out_act, gscale=gscale, tile=tile,
        trunk_dtype=dtype, interpret=interpret, fast_sine=fast_sine,
    )
    dn, px = _mesh_axes(mesh)
    d_spec = P(dn if d_batched else None, px, None)
    per_image = P(dn)
    rep = P()
    in_specs = (
        d_spec, per_image, rep, rep, rep, rep, per_image, per_image,
        P(dn, px, None), P(None, px, None), per_image,
    )
    both = tuple(ax for ax in (dn, px) if ax is not None)

    def inner(d_pad, a0, ws, bs, wf, bf, fr, ph, tgt, sw, bm):
        mse_row, da0, dws, dbs, dwf, dbf, dfr, dph = call(
            d_pad, a0, ws, bs, wf, bf, fr, ph, tgt, sw, bm
        )
        if px is not None:
            da0 = jax.lax.psum(da0, px)
            dfr = jax.lax.psum(dfr, px)
            dph = jax.lax.psum(dph, px)
        if both:
            mse_row, dws, dbs, dwf, dbf = (
                jax.lax.psum(x, both) for x in (mse_row, dws, dbs, dwf, dbf)
            )
        return mse_row, da0, dws, dbs, dwf, dbf, dfr, dph

    sm = jax.shard_map(
        inner, mesh=mesh, in_specs=in_specs,
        out_specs=(rep, per_image, rep, rep, rep, rep, per_image, per_image),
        check_vma=False,
    )
    return _wrap_film_step_vjp(sm, gscale)


def fused_film_step_mse(
    params,
    equivariance: str,
    Z,
    D,
    targets,
    sineweight,
    bmask,
    *,
    hidden_layers: int,
    hidden_features: int,
    out_features: int,
    output_activation: str | None,
    tile: int = 512,
    trunk: str = "bfloat16",
    interpret: bool | None = None,
    fast_sine: bool = False,
):
    """FiLM analog of fused_step_mse: the FIT_DECODER weighted MSE through
    one pallas launch (mapping network stays in XLA, tiny per-image)."""
    from reni_tpu.core import encodings
    from reni_tpu.models import film as film_lib

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    tile = _env_tile(tile)
    d_feats = encodings.d_features(equivariance, D)
    npix = d_feats.shape[1]
    mesh, n_px, sharded = _kernel_mesh_info()
    reason = unsupported_reason(
        npix, hidden_features, batch=Z.shape[0], tile=tile, mesh=mesh
    )
    if reason:
        raise ValueError(f"unsupported shapes for pallas film step: {reason}")
    tm = pick_tile(npix // n_px, tile)

    parts = encodings.z_parts(equivariance, Z)
    fr, ph = film_lib.apply_mapping_network(
        params["mapping"], parts["bias_feats"]
    )
    fr = (fr * 15.0 + 30.0)[:, None, :]
    ph = ph[:, None, :]

    layer0 = params["layers"][0]
    w0 = layer0["w"]
    if equivariance == "SO2":
        a0 = jnp.einsum("bcn,nh->bch", parts["proj"], w0[2:])
        a0 = jnp.concatenate(
            (a0, jnp.broadcast_to(w0[:2][None], (a0.shape[0], 2, w0.shape[1]))),
            axis=1,
        )
    else:
        a0 = jnp.einsum("bcn,nh->bch", parts["proj"], w0)
    a0_pad = jnp.pad(a0, ((0, 0), (0, K_PAD - a0.shape[1]), (0, 0)))
    d_pad = jnp.pad(d_feats, ((0, 0), (0, 0), (0, K_PAD - d_feats.shape[-1])))

    n_trunk = hidden_layers
    ws = (
        jnp.stack([l["w"] for l in params["layers"][1:]])
        if n_trunk > 1
        else jnp.zeros((0, hidden_features, hidden_features))
    )
    bs = jnp.stack([l["b"] for l in params["layers"]])
    wf = jnp.pad(params["final"]["w"], ((0, 0), (0, C_PAD - out_features)))
    bf = jnp.pad(params["final"]["b"], ((0, C_PAD - out_features),))[None]

    c = targets.shape[-1]
    tgt = jnp.pad(targets, ((0, 0), (0, 0), (0, C_PAD - c)))
    sw = jnp.pad(sineweight, ((0, 0), (0, 0), (0, C_PAD - sineweight.shape[-1])))
    bm = jnp.broadcast_to(
        bmask[:, None, None].astype(jnp.float32),
        (bmask.shape[0], 1, C_PAD),
    )
    gscale = 1.0 / float(npix * out_features)

    if sharded:
        kernel = _get_film_step_kernel_sharded(
            mesh, n_trunk, hidden_features, tm, trunk, interpret, fast_sine,
            output_activation, gscale, d_feats.shape[0] > 1,
        )
    else:
        kernel = _get_film_step_kernel(
            n_trunk, hidden_features, tm, trunk, interpret, fast_sine,
            output_activation, gscale,
        )
    return kernel(d_pad, a0_pad, ws, bs, wf, bf, fr, ph, tgt, sw, bm)
