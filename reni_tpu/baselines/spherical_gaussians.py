"""Spherical-Gaussian mixture fitting (analytic baseline).

Covers the reference's SG module (reference: src/models/spherical_gaussians.py):
fit a K-lobe spherical-Gaussian mixture to an environment map by gradient
optimisation of the sine-weighted log-domain MSE (:168-198), with the same
parameterisation — tanh-bounded lobe centers on the sphere, exp-domain
amplitudes and sharpness (:168-198) — and lobe initialisation on a 2 x K/2
equirect grid (:149-166). Rendering: L(d) = sum_k a_k exp(lambda_k (d.mu_k - 1))
(:109-137).

TPU-first: the fit is a jit-compiled optax L-BFGS/Adam loop over all lobes at
once (the reference uses torch LBFGS), and a whole batch of environment maps
can be fitted in parallel with vmap.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from reni_tpu.core import sphere


class SGParams(NamedTuple):
    raw_axis: jnp.ndarray  # (K, 3) unconstrained; axis = tanh-bounded + renorm
    log_sharpness: jnp.ndarray  # (K,)
    log_amplitude: jnp.ndarray  # (K, C)


def init_lobes(n_lobes: int = 12, n_channels: int = 3, sharpness: float = 8.0) -> SGParams:
    """Lobe centers on a 2 x (K/2) equirect grid (reference :149-166)."""
    rows = 2
    cols = n_lobes // rows
    axes = []
    for i in range(rows):
        phi = np.pi * (i + 0.5) / rows
        for j in range(cols):
            theta = 2 * np.pi * (j + 0.5) / cols - np.pi
            axes.append(
                [np.sin(phi) * np.sin(theta), np.cos(phi), -np.sin(phi) * np.cos(theta)]
            )
    axes = np.asarray(axes, dtype=np.float32)
    return SGParams(
        raw_axis=jnp.asarray(np.arctanh(np.clip(axes, -0.99, 0.99))),
        log_sharpness=jnp.full((n_lobes,), float(np.log(sharpness))),
        log_amplitude=jnp.zeros((n_lobes, n_channels)),
    )


def lobe_axes(params: SGParams) -> jnp.ndarray:
    a = jnp.tanh(params.raw_axis)
    return a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-6)


def render_sg(params: SGParams, directions: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the mixture at unit directions (P, 3) -> (P, C)."""
    mu = lobe_axes(params)  # (K, 3)
    lam = jnp.exp(params.log_sharpness)  # (K,)
    amp = jnp.exp(params.log_amplitude)  # (K, C)
    cos = directions @ mu.T  # (P, K)
    g = jnp.exp(lam[None, :] * (cos - 1.0))  # (P, K)
    return g @ amp


@functools.partial(jax.jit, static_argnames=("steps", "lr"))
def _fit(params: SGParams, target_log, dirs, sw, steps: int, lr: float):
    import optax

    opt = optax.adam(lr)

    def loss_fn(p):
        out = render_sg(p, dirs)
        out_log = jnp.log(jnp.maximum(out, 1e-8))
        return (((out_log - target_log) ** 2) * sw).mean()

    def body(carry, _):
        p, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = opt.update(grads, opt_state, p)
        p = jax.tree.map(lambda a, u: a + u, p, updates)
        return (p, opt_state), loss

    (params, _), losses = jax.lax.scan(
        body, (params, opt.init(params)), None, length=steps
    )
    return params, losses


def fit_environment(
    envmap: np.ndarray,
    n_lobes: int = 12,
    steps: int = 2000,
    lr: float = 5e-2,
) -> tuple[SGParams, np.ndarray]:
    """Fit a K-lobe SG mixture to an equirect env map (H, W, C).

    Optimises the sine-weighted log-domain MSE (reference :176-178).
    Returns (params, loss history)."""
    h, w, c = envmap.shape
    assert w == 2 * h
    assert n_lobes % 2 == 0, "lobes arranged on a 2-row grid"
    dirs = sphere.get_directions(w)[0]
    sw = sphere.get_sineweight(w)[0]
    target = jnp.asarray(envmap.reshape(-1, c))
    target_log = jnp.log(jnp.maximum(target, 1e-8))
    params = init_lobes(n_lobes, c)
    params, losses = _fit(params, target_log, dirs, sw, steps, lr)
    return params, np.asarray(losses)


def sg_representation(envmap: np.ndarray, n_lobes: int = 12, steps: int = 2000) -> np.ndarray:
    """Fit + re-render at the input resolution (the SG analog of
    get_spherical_harmonic_representation)."""
    h, w, c = envmap.shape
    params, _ = fit_environment(envmap, n_lobes, steps)
    dirs = sphere.get_directions(w)[0]
    return np.asarray(render_sg(params, dirs)).reshape(h, w, c)
