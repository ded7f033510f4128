"""RAdam optimizer + per-iteration LR schedules (optax).

The reference's default optimizer is the RAdam "buffer variant"
(utils/optimizer.py:5-94) with decoupled weight decay applied inside the
step; its LR schedules are applied PER ITERATION (train.py:390-393):
  * stair: x0.1 at 90% of total iterations (helpers.py:183-198)
  * poly:  (1 - t/T)^0.9                    (helpers.py:164-172)
  * const

optax.radam differs from the reference in the early (N_sma < 5) steps: optax
falls back to bias-corrected SGD, the reference (degenerated_to_sgd=False)
applies NO update at all (utils/optimizer.py:75-78, 88-92).  `radam` below
reproduces the reference exactly, including applying weight decay only on
steps that update.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


class RAdamState(NamedTuple):
    step: jnp.ndarray
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates


def radam(learning_rate, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
          weight_decay: float = 0.0, degenerated_to_sgd: bool = False
          ) -> optax.GradientTransformation:
    """Reference-exact RAdam (utils/optimizer.py:28-94).

    `learning_rate` may be a float or a schedule fn(step) -> lr.
    Updates returned are deltas to ADD to params (optax convention), and the
    decoupled weight-decay term (-wd * lr * p) is folded in, so use with
    `optax.apply_updates` — params must be passed to `update`."""

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return RAdamState(jnp.zeros((), jnp.int32), z,
                          jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params):
        step = state.step + 1
        t = step.astype(jnp.float32)
        lr = learning_rate(step) if callable(learning_rate) else learning_rate

        exp_avg = jax.tree_util.tree_map(
            lambda m, g: m * b1 + g * (1 - b1), state.exp_avg, grads)
        exp_avg_sq = jax.tree_util.tree_map(
            lambda v, g: v * b2 + (g * g) * (1 - b2), state.exp_avg_sq, grads)

        # the reference computes these per-step in python float64
        # (utils/optimizer.py:66-70); a naive f32 `b2**t` loses ~1e-7 in
        # beta2_t which amplifies to ~0.04 in n_sma (d n_sma/d beta2_t ~
        # -2t/(1-beta2_t)^2).  expm1 keeps (1 - beta2_t) to full relative
        # precision, matching the reference to ~1e-4 in n_sma.
        one_minus_beta2_t = -jnp.expm1(t * float(np.log(b2)))
        beta2_t = 1.0 - one_minus_beta2_t
        n_sma_max = 2.0 / (1 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * t * beta2_t / one_minus_beta2_t

        rect = jnp.sqrt(one_minus_beta2_t * (n_sma - 4) / (n_sma_max - 4)
                        * (n_sma - 2) / n_sma * n_sma_max / (n_sma_max - 2)
                        ) / (1 - b1 ** t)
        sgd_size = 1.0 / (1 - b1 ** t) if degenerated_to_sgd else -1.0
        use_adam = n_sma >= 5.0

        def upd(p, m, v):
            adam = -rect * lr * m / (jnp.sqrt(v) + eps)
            sgd = -sgd_size * lr * m
            delta = jnp.where(use_adam, adam,
                              sgd if degenerated_to_sgd else jnp.zeros_like(p))
            active = jnp.logical_or(use_adam, jnp.asarray(degenerated_to_sgd))
            wd = jnp.where(active, -weight_decay * lr * p, 0.0)
            return delta + wd

        updates = jax.tree_util.tree_map(upd, params, exp_avg, exp_avg_sq)
        return updates, RAdamState(step, exp_avg, exp_avg_sq)

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# per-iteration LR schedules
# ---------------------------------------------------------------------------

def stair_schedule(base_lr: float, total_iters: int):
    def fn(step):
        progress = (step - 1).astype(jnp.float32) / float(total_iters)
        return jnp.where(progress < 0.9, base_lr, base_lr * 0.1)
    return fn


def poly_schedule(base_lr: float, total_iters: int, power: float = 0.9):
    def fn(step):
        t = (step - 1).astype(jnp.float32) / float(total_iters)
        return base_lr * (1.0 - t) ** power
    return fn


def const_schedule(base_lr: float, total_iters: int = 0):
    return lambda step: jnp.asarray(base_lr)


SCHEDULES = {"stair": stair_schedule, "poly": poly_schedule, "const": const_schedule}


def freeze_masked(tx: optax.GradientTransformation, trainable_mask
                  ) -> optax.GradientTransformation:
    """Zero updates for frozen subtrees (the JAX answer to the reference's
    param-group filters, train.py:146-168).

    NOTE: optax.masked alone is WRONG for freezing — unmasked leaves pass
    their raw gradients through as updates.  multi_transform routes frozen
    leaves to set_to_zero instead."""
    labels = jax.tree_util.tree_map(
        lambda m: "train" if m else "freeze", trainable_mask)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels)
