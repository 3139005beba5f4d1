"""Anatomy of the fused SIREN backward kernel: which resource binds it?

    python benchmarks/bwd_anatomy.py [--batch 400] [--tile 512]

Times the shipped forward/backward kernels and surgically-modified
backward variants at the published flagship shape (N=49, 5x256, 64x128)
to attribute the backward's time (VERDICT r3 #3):

- ``bwd``            the shipped kernel (recompute + dW accumulation + dX)
- ``bwd_no_accum``   dW written (=) instead of accumulated (+=): isolates
                     the cross-grid-step read-modify-write dependency
- ``bwd_no_sincos``  sincos recompute replaced by a linear dummy: isolates
                     the VPU transcendental cost
- ``bwd_no_dw``      only dX / per-image grads (no weight grads at all)
- ``bwd_mxu_only``   no sincos AND no dW: the pure matmul skeleton

Forward variants probe the OTHER side of the roofline — whether the
forward's strict matmul->sine->matmul dependency chain serialises the MXU
behind the VPU (the backward's independent dW dots can hide its
transcendentals; the forward has no independent work to overlap):

- ``fwd``             the shipped kernel
- ``fwd_no_sine``     sine replaced by a linear dummy: the pure MXU chain
- ``fwd_interleave2`` tile processed as 2 independent half-tiles,
                      layer-by-layer — gives the scheduler a matmul to run
                      under every sine
- ``fwd_interleave4`` same with 4 quarter-tiles

All variants are numerically WRONG except ``bwd`` — they exist to move
one term at a time. Dependent-chain timing (profiling.benchmark_fn).
"""

from __future__ import annotations

import argparse
import functools
import json

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from reni_tpu.core.fastmath import sincos_fns
from reni_tpu.kernels import siren_pallas as sp
from reni_tpu.utils.profiling import benchmark_fn

K_PAD, C_PAD = sp.K_PAD, sp.C_PAD


def _bwd_kernel_variant(
    d_ref, a_ref, b0_ref, ws_ref, bs_ref, wf_ref, bf_ref, g_ref,
    da_ref, db0_ref, dws_ref, dbs_ref, dwf_ref, dbf_ref,
    *, n_hidden, omega0, omega_h, trunk_dtype, sincos,
    accum=True, transcendental=True, weight_grads=True,
):
    b = pl.program_id(0)
    pt = pl.program_id(1)

    if accum and weight_grads:
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

    def fake_sincos(z):
        # linear stand-in with the same shapes/dtypes (MXU work unchanged)
        return z * 0.8, z * 0.6

    sc = sincos if transcendental else fake_sincos
    d = d_ref[0]
    z0 = sp._matmul(d, a_ref[0], trunk_dtype) + b0_ref[0]
    h0, c0 = sc(omega0 * z0)
    hs, cs = [h0], [c0]
    for i in range(n_hidden):
        z = sp._matmul(hs[-1], ws_ref[i], trunk_dtype) + bs_ref[i]
        h, c = sc(omega_h * z)
        hs.append(h)
        cs.append(c)

    g = g_ref[0]
    if weight_grads:
        if accum:
            dwf_ref[...] += sp._dot(hs[-1], g, ((0,), (0,)), trunk_dtype)
            dbf_ref[...] += jnp.sum(g, axis=0, keepdims=True)
        else:
            dwf_ref[...] = sp._dot(hs[-1], g, ((0,), (0,)), trunk_dtype)
            dbf_ref[...] = jnp.sum(g, axis=0, keepdims=True)
    dh = sp._dot(g, wf_ref[...], ((1,), (1,)), trunk_dtype)

    for i in reversed(range(n_hidden)):
        dz = dh * (omega_h * cs[i + 1])
        if weight_grads:
            if accum:
                dws_ref[i] += sp._dot(hs[i], dz, ((0,), (0,)), trunk_dtype)
                dbs_ref[i] += jnp.sum(dz, axis=0)
            else:
                dws_ref[i] = sp._dot(hs[i], dz, ((0,), (0,)), trunk_dtype)
                dbs_ref[i] = jnp.sum(dz, axis=0)
        dh = sp._dot(dz, ws_ref[i], ((1,), (1,)), trunk_dtype)

    dz0 = dh * (omega0 * cs[0])
    da_ref[0] += sp._dot(d, dz0, ((0,), (0,)), trunk_dtype)
    db0_ref[0] += jnp.sum(dz0, axis=0)


def _fwd_kernel_variant(
    d_ref, a_ref, b0_ref, ws_ref, bs_ref, wf_ref, bf_ref, out_ref,
    *, n_hidden, omega0, omega_h, trunk_dtype, sine,
    transcendental=True, interleave=1,
):
    sn = sine if transcendental else (lambda z: z * 0.8)
    d = d_ref[0]
    step = d.shape[0] // interleave
    parts = [d[j * step : (j + 1) * step] for j in range(interleave)]
    # independent per-part chains: the scheduler can overlap part j's sine
    # (VPU) with part j+1's matmul (MXU)
    hs = [
        sn(omega0 * (sp._matmul(p, a_ref[0], trunk_dtype) + b0_ref[0]))
        for p in parts
    ]
    for i in range(n_hidden):
        hs = [
            sn(omega_h * (sp._matmul(h, ws_ref[i], trunk_dtype) + bs_ref[i]))
            for h in hs
        ]
    outs = [sp._matmul(h, wf_ref[...], trunk_dtype) + bf_ref[0] for h in hs]
    out_ref[0] = jnp.concatenate(outs, axis=0) if interleave > 1 else outs[0]


def fwd_variant_call(kw, hidden, tile, batch, npix, interpret=False, **variant):
    def call(d_pad, a, b0, ws, bs, wf, bf):
        tm = min(tile, npix)
        grid = (batch, npix // tm)
        return pl.pallas_call(
            functools.partial(_fwd_kernel_variant, **kw, **variant),
            interpret=interpret,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, tm, K_PAD), lambda b, p: (0, p, 0), memory_space=pltpu.VMEM),
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
        )(d_pad, a, b0, ws, bs, wf, bf)

    return call


def bwd_variant_call(kernel_kw, hidden, tile, batch, npix, **variant):
    def call(d_pad, a, b0, ws, bs, wf, bf, g):
        tm = min(tile, npix)
        grid = (batch, npix // tm)
        out_shapes = (
            jax.ShapeDtypeStruct(a.shape, jnp.float32),
            jax.ShapeDtypeStruct(b0.shape, jnp.float32),
            jax.ShapeDtypeStruct(ws.shape, jnp.float32),
            jax.ShapeDtypeStruct(bs.shape, jnp.float32),
            jax.ShapeDtypeStruct(wf.shape, jnp.float32),
            jax.ShapeDtypeStruct(bf.shape, jnp.float32),
        )
        return pl.pallas_call(
            functools.partial(_bwd_kernel_variant, **kernel_kw, **variant),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, tm, K_PAD), lambda b, p: (0, p, 0), memory_space=pltpu.VMEM),
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
        )(d_pad, a, b0, ws, bs, wf, bf, g)

    return call


def main():
    from reni_tpu.utils import chiplock

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=400)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--layers", type=int, default=5)
    args = ap.parse_args()

    # serialize against other chip jobs; yield between variants if a
    # preemptor (bench.py) asks — this sweep is cheap to rerun
    with chiplock.hold_chip_lock(chiplock.trainer_lock_path(), what="bwd_anatomy"):
        _run(args, chiplock.trainer_stop_path())


def _run(args, stop_file):
    from reni_tpu.utils import chiplock

    B, H, L = args.batch, args.hidden, args.layers
    npix = args.width * args.width // 2
    rng = np.random.default_rng(0)
    f32 = np.float32
    d_pad = jnp.asarray(rng.normal(size=(1, npix, K_PAD)), f32)
    a = jnp.asarray(rng.normal(size=(B, K_PAD, H)) * 0.02, f32)
    b0 = jnp.asarray(rng.normal(size=(B, 1, H)) * 0.02, f32)
    ws = jnp.asarray(rng.normal(size=(L, H, H)) * 0.01, f32)
    bs = jnp.asarray(rng.normal(size=(L, H)) * 0.01, f32)
    wf = jnp.asarray(rng.normal(size=(H, C_PAD)) * 0.01, f32)
    bf = jnp.asarray(rng.normal(size=(1, C_PAD)) * 0.01, f32)
    g = jnp.asarray(rng.normal(size=(B, npix, C_PAD)), f32)

    fwd_call, bwd_call = sp._siren_calls(
        L, H, 30.0, 30.0, tile=args.tile, fast_sine=True
    )
    kernel_kw = dict(
        n_hidden=L, omega0=30.0, omega_h=30.0,
        trunk_dtype=jnp.bfloat16, sincos=sincos_fns(True),
    )

    samples = B * npix
    results = {"batch": B, "npix": npix, "tile": args.tile}

    def timed(name, fn, args_):
        chiplock.maybe_yield(stop_file, what="bwd_anatomy")
        # dependent chain: thread a scalar of each call's output back into
        # the `a` operand so the tunnel cannot dedupe/pipeline repeats
        rest = args_[2:]

        def step(a_now):
            outs = fn(args_[0], a_now, *rest)
            leaf = jax.tree.leaves(outs)[0]
            return a_now + leaf.reshape(-1)[0] * 1e-30

        jitted = jax.jit(step)
        dt, _ = benchmark_fn(jitted, args_[1], n=10)
        results[name] = {
            "ms": round(dt * 1e3, 3),
            "Msamples_per_s": round(samples / dt / 1e6, 1),
        }
        print(name, results[name], flush=True)

    timed("fwd", fwd_call, (d_pad, a, b0, ws, bs, wf, bf))
    timed("bwd", bwd_call, (d_pad, a, b0, ws, bs, wf, bf, g))

    # NOTE (r5): the r4 interleave A/B measured NO win (bwd_il2 59.8 ms vs
    # 57.4 baseline, anatomy.json) — RENI_TPU_INTERLEAVE was removed from
    # the shipped kernels; the surgical fwd_interleave* variants below
    # remain as anatomy probes only.

    from reni_tpu.core.fastmath import sine_fns

    fwd_kw = dict(
        n_hidden=L, omega0=30.0, omega_h=30.0,
        trunk_dtype=jnp.bfloat16, sine=sine_fns(True)[0],
    )
    fwd_common = (fwd_kw, H, args.tile, B, npix)
    fwd_args = (d_pad, a, b0, ws, bs, wf, bf)
    timed("fwd_no_sine",
          fwd_variant_call(*fwd_common, transcendental=False), fwd_args)
    timed("fwd_interleave2",
          fwd_variant_call(*fwd_common, interleave=2), fwd_args)
    timed("fwd_interleave4",
          fwd_variant_call(*fwd_common, interleave=4), fwd_args)

    common = (kernel_kw, H, args.tile, B, npix)
    timed("bwd_no_accum",
          bwd_variant_call(*common, accum=False), (d_pad, a, b0, ws, bs, wf, bf, g))
    timed("bwd_no_sincos",
          bwd_variant_call(*common, transcendental=False), (d_pad, a, b0, ws, bs, wf, bf, g))
    timed("bwd_no_dw",
          bwd_variant_call(*common, weight_grads=False), (d_pad, a, b0, ws, bs, wf, bf, g))
    timed("bwd_mxu_only",
          bwd_variant_call(*common, transcendental=False, weight_grads=False),
          (d_pad, a, b0, ws, bs, wf, bf, g))

    # roofline context: matmul FLOPs per pass at these shapes
    mm_fwd = 2 * samples * (K_PAD * H + L * H * H + H * C_PAD)
    results["fwd_matmul_TFLOP"] = round(mm_fwd / 1e12, 3)
    results["bwd_matmul_TFLOP"] = round(3 * mm_fwd / 1e12, 3)  # recompute+dW+dX
    print(json.dumps(results))


if __name__ == "__main__":
    main()
