"""Fast transcendental approximations for the SIREN hot path.

``jnp.sin`` lowers to a fully range-safe implementation costing ~26 VPU ops
per element on TPU; at the published workload the decoder forward evaluates
1.26e9 sines per step, which makes the *sine*, not the matmuls, the
bottleneck of both the XLA and the Pallas trunk (measured on-chip: forward
35.3 ms -> 9.0 ms, backward 41.5 ms -> 17.3 ms when switching to the
polynomial below; see PERF.md round-2 table).

``fast_sin`` reduces the argument to [-pi/2, pi/2] with a two-term
Cody-Waite split of pi and evaluates a degree-9 odd polynomial (Cephes
coefficients): ~12 VPU ops. ``fast_cos`` uses the same reduction with a
degree-10 even polynomial (a pre-shift by pi/2 would cost an ulp of the
*unreduced* argument — 3e-5 at |x|~1e3). Measured accuracy: max abs error
3.6e-6 (sin) / 8e-7 (cos) for |x| <= ~1e3 (the SIREN pre-activation range
is |x| < ~200) — three orders of magnitude below the TPU's default
bf16-matmul noise, and far below any training-relevant signal.

Both work identically in plain jnp (XLA fuses the polynomial into the
matmul epilogue) and inside Pallas kernels, in f32. They are NOT suitable
for f64 parity work — selection is by the ``fast_sine`` model knob
(`RENIConfig.fast_sine`, CLI `TPU.FAST_SINE`), default off for bit-parity
with the reference.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_PI_HI = np.float32(3.140625)  # high bits of pi (exact in 12 bits)
_PI_LO = np.float32(9.67653589793e-4)  # pi - _PI_HI
_INV_PI = np.float32(1.0 / np.pi)
# degree-9 odd minimax polynomial for sin on [-pi/2, pi/2] (Cephes sinf)
_S3 = np.float32(-1.6666667e-01)
_S5 = np.float32(8.3333310e-03)
_S7 = np.float32(-1.9840874e-04)
_S9 = np.float32(2.7525562e-06)
# degree-10 even Taylor polynomial for cos on [-pi/2, pi/2]
_C2 = np.float32(-0.5)
_C4 = np.float32(1.0 / 24.0)
_C6 = np.float32(-1.0 / 720.0)
_C8 = np.float32(1.0 / 40320.0)
_C10 = np.float32(-1.0 / 3628800.0)


def _reduce(x):
    """(r, sign): r = x - k*pi in [-pi/2, pi/2], sign = (-1)^k."""
    k = jnp.round(x * _INV_PI)
    r = (x - k * _PI_HI) - k * _PI_LO
    half = k * 0.5
    sign = 1.0 - 4.0 * (half - jnp.floor(half))
    return r, sign


def fast_sin(x):
    """sin(x) to ~3.6e-6 abs error for |x| <= ~1e3, in ~12 VPU ops."""
    r, sign = _reduce(x)
    r2 = r * r
    p = ((_S9 * r2 + _S7) * r2 + _S5) * r2 + _S3
    return (r + r * (r2 * p)) * sign


def fast_cos(x):
    """cos(x) to ~8e-7 abs error for |x| <= ~1e3; own even polynomial (a
    pi/2 pre-shift would cost an ulp of the unreduced argument)."""
    r, sign = _reduce(x)
    r2 = r * r
    p = (((_C10 * r2 + _C8) * r2 + _C6) * r2 + _C4) * r2 + _C2
    return (1.0 + r2 * p) * sign


def fast_sincos(x):
    """(sin(x), cos(x)) sharing one range reduction — the backward kernels
    need both of the SAME pre-activation (activation recompute + the sin'
    chain-rule factor), and the reduction is ~half of each call's ops, so
    the pair costs ~16 VPU ops instead of 22."""
    r, sign = _reduce(x)
    r2 = r * r
    ps = ((_S9 * r2 + _S7) * r2 + _S5) * r2 + _S3
    pc = (((_C10 * r2 + _C8) * r2 + _C6) * r2 + _C4) * r2 + _C2
    return (r + r * (r2 * ps)) * sign, (1.0 + r2 * pc) * sign


def _exact_sincos(x):
    return jnp.sin(x), jnp.cos(x)


def sine_fns(fast: bool):
    """(sin, cos) implementation pair for the ``fast_sine`` knob."""
    return (fast_sin, fast_cos) if fast else (jnp.sin, jnp.cos)


def sincos_fns(fast: bool):
    """Joint (sin, cos) evaluator for the ``fast_sine`` knob."""
    return fast_sincos if fast else _exact_sincos
