"""Optimisers, LR schedules, and trainable-parameter partitioning.

Matches the reference's optimisation semantics (src/lightning/RENI_module.py):

- Adam with the configured betas and an **exponential per-epoch decay**
  ``gamma = exp(log(lr_end / lr_start) / epochs)`` (RENI_module.py:212-214),
  stepped once per epoch (scheduler interval "epoch").

  Reference quirk: its adam branch ignores the configured betas and uses
  torch defaults (RENI_module.py:191-192 passes no betas); its sgd branch
  would crash (betas kwarg) and "adagrad" is misspelled. We implement the
  *intended* behaviour — the configured betas are honoured and sgd/adagrad
  work.

- Under ``fixed_decoder`` only the latent rows (mu or Z) are optimised
  (RENI_module.py:178-183). We go further than masking: the frozen subtree
  is partitioned out before ``jax.grad``, so no decoder gradients are even
  computed in FIT_LATENT / FIT_INVERSE.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import optax

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Per-task optimisation hyperparameters (configs/default.py:24-52)."""

    lr_start: float = 1e-5
    lr_end: float = 1e-7
    optimizer: str = "adam"
    beta1: float = 0.0
    beta2: float = 0.999
    scheduler_type: str = "exponential"
    scheduler_step_size: int = 1
    scheduler_gamma: float = 1.0
    epochs: int = 2400
    steps_per_epoch: int = 1


def build_schedule(cfg: OptimConfig) -> optax.Schedule:
    """LR as a function of the global step (scheduler stepped per epoch)."""
    if cfg.scheduler_type == "exponential":
        gamma = math.exp(math.log(cfg.lr_end / cfg.lr_start) / cfg.epochs)
        return optax.exponential_decay(
            init_value=cfg.lr_start,
            transition_steps=cfg.steps_per_epoch,
            decay_rate=gamma,
            staircase=True,
        )
    if cfg.scheduler_type == "step":
        return optax.exponential_decay(
            init_value=cfg.lr_start,
            transition_steps=cfg.steps_per_epoch * cfg.scheduler_step_size,
            decay_rate=cfg.scheduler_gamma,
            staircase=True,
        )
    return lambda _: cfg.lr_start  # "none" / plateau fallback: constant


def build_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    schedule = build_schedule(cfg)
    if cfg.optimizer == "adam":
        return optax.adam(schedule, b1=cfg.beta1, b2=cfg.beta2, eps=1e-8)
    if cfg.optimizer == "sgd":
        return optax.sgd(schedule, momentum=cfg.beta1 or None)
    if cfg.optimizer == "adagrad":
        return optax.adagrad(schedule)
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")


# ---------------------------------------------------------------------------
# trainable / frozen partition (pytree surgery on the boolean mask)
# ---------------------------------------------------------------------------


def partition_params(params: Params, mask: Params) -> tuple[Params, Params]:
    """Split params into (trainable, frozen) trees of the same structure,
    with non-selected leaves replaced by None (so jax.grad never sees them)."""
    trainable = jax.tree.map(lambda p, m: p if m else None, params, mask)
    frozen = jax.tree.map(lambda p, m: None if m else p, params, mask)
    return trainable, frozen


def merge_params(trainable: Params, frozen: Params) -> Params:
    return jax.tree.map(
        lambda t, f: t if t is not None else f,
        trainable,
        frozen,
        is_leaf=lambda x: x is None,
    )
