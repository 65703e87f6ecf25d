"""Optimizer and train state.

Reproduces the reference's optimization recipe exactly (ref:
ViT/training/train.py:405-424): AdamW(lr, weight_decay, betas=(0.9, 0.99)),
global-norm gradient clipping at 1.0, label-smoothed cross-entropy — but as a
single optax chain inside one jitted step.

The learning rate is a DONATED STATE SCALAR (via optax.inject_hyperparams),
not a compile-time constant: the host-side ReduceLROnPlateau mutates it
between epochs without triggering recompilation (SURVEY.md §7.3 "host-side
schedulers inside an ahead-of-time-compiled world").
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp
import optax

from vitiq.config import TrainConfig


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """clip-by-global-norm -> AdamW, with injectable learning_rate."""

    def build(learning_rate):
        return optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip_max_norm),
            optax.adamw(
                learning_rate=learning_rate,
                b1=cfg.adam_b1,
                b2=cfg.adam_b2,
                eps=cfg.adam_eps,
                weight_decay=cfg.weight_decay,
            ),
        )

    return optax.inject_hyperparams(build)(learning_rate=cfg.learning_rate)


def create_train_state(params, cfg: TrainConfig) -> TrainState:
    tx = make_optimizer(cfg)
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def get_learning_rate(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Host-side LR mutation between epochs (no recompile: lr is state)."""
    hyper = dict(state.opt_state.hyperparams)
    hyper["learning_rate"] = jnp.asarray(lr, jnp.float32)
    opt_state = state.opt_state._replace(hyperparams=hyper)
    return state._replace(opt_state=opt_state)
