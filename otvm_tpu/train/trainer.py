"""Stage-wise trainer: one jitted DP train step over a device mesh.

Reference semantics reproduced:
  * stage matrix (train.py:86-168, 305-327):
      s1  alpha alone, GT trimaps every frame (trimap net absent)
      s2  alpha trained, trimap frozen (param filter at train.py:146-168)
      s3  trimap trained, alpha frozen
      s4  everything trained end-to-end
    Freezing = optax.masked zero-updates — gradients still flow THROUGH the
    frozen net (the reference never detaches it either; its CE-trimap loss
    back-propagates into the alpha net through the frozen trimap net).
  * RAdam(lr=1e-5, wd=1e-4) with per-iteration stair LR (x0.1 @ 90%).
  * loss = L_alpha_comp + L_lap + L_grad (+ L_tri for s2+) (train.py:355-366).
  * the DDP gradient all-reduce and the reduce_tensor logging collective
    (helpers.py:76-90) are implicit: batch sharded on the 'data' mesh axis,
    params replicated, jit inserts psums.

Beyond parity: full checkpoint/RESUME (params + optimizer state + step) via
orbax — the reference saves optimizer state but has no resume path at all
(train.py:127, SURVEY §5).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import Config
from ..models.otvm import joint_train_forward, trimap_train_forward
from . import losses as L
from ..data.loader import decode_wire
from ..parallel.mesh import make_mesh, replicate, shard_batch
from .optim import SCHEDULES, radam


@struct.dataclass
class TrainState:
    params: Any            # {'stm': {...}, 'fba': {...}}
    batch_stats: Any       # STM frozen-BN stats (never updated)
    opt_state: Any
    step: jnp.ndarray


def stage_trainable_mask(params, stage: int):
    """train.py:146-168: s2 freezes trimap.*, s3 freezes NET.* (alpha)."""
    def mask_for(top):
        if stage == 2 and top == "stm":
            return False
        if stage == 3 and top == "fba":
            return False
        return True

    return {top: jax.tree_util.tree_map(lambda _: mask_for(top), sub)
            for top, sub in params.items()}


def make_optimizer(cfg: Config, params, iters_per_epoch: int):
    total_iters = cfg.train.total_epochs * iters_per_epoch
    schedule = SCHEDULES[cfg.train.lr_strategy](cfg.train.base_lr, total_iters)
    tx = radam(schedule, weight_decay=cfg.train.weight_decay)
    if cfg.train.stage in (2, 3):
        from .optim import freeze_masked
        tx = freeze_masked(tx, stage_trainable_mask(params, cfg.train.stage))
    return tx


def _stm_vars(state: TrainState):
    v = {"params": state.params["stm"]}
    if state.batch_stats:
        v["batch_stats"] = state.batch_stats
    return v


def _compute_dtype(cfg: Config):
    """cfg.train.bf16 (or OTVM_TRAIN_BF16=1) -> bf16 network compute with
    fp32 master params/optimizer; see joint_train_forward."""
    import os
    if cfg.train.bf16 or os.environ.get("OTVM_TRAIN_BF16", "0") == "1":
        return jnp.bfloat16
    return None


def make_train_step(cfg: Config, tx: optax.GradientTransformation):
    stage = cfg.train.stage
    arch = cfg.alpha.arch
    cdt = _compute_dtype(cfg)

    scale = cfg.model_scale
    stm_norm = cfg.stm_norm

    def loss_fn(params, batch_stats, batch):
        stm_vars = {"params": params["stm"], "batch_stats": batch_stats}
        fba_vars = {"params": params["fba"]}
        total, aux = joint_train_forward(stm_vars, fba_vars, batch, stage,
                                         arch=arch, compute_dtype=cdt,
                                         scale=scale, stm_norm=stm_norm)
        return total, aux

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        batch = decode_wire(batch)     # no-op on float batches
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(loss=loss, L_alpha_comp=aux["L_alpha_comp"],
                       L_lap=aux["L_lap"], L_grad=aux["L_grad"], L_tri=aux["L_tri"])
        return TrainState(params, state.batch_stats, opt_state, state.step + 1), metrics

    return train_step


def make_viz_forward(cfg: Config):
    """Forward-only pass returning visual tensors (alphas/comps) for the
    periodic training-image grids (train.py:255-275).  Compiled separately
    so the hot train step never materializes visuals."""
    stage = cfg.train.stage

    arch = cfg.alpha.arch
    stm_norm = cfg.stm_norm

    @jax.jit
    def viz_forward(state: TrainState, batch):
        batch = decode_wire(batch)
        stm_vars = {"params": state.params["stm"], "batch_stats": state.batch_stats}
        fba_vars = {"params": state.params["fba"]}
        _, aux = joint_train_forward(stm_vars, fba_vars, batch, stage, arch=arch,
                                     stm_norm=stm_norm)
        return dict(alphas=aux["alphas"], comps=aux["comps"])

    return viz_forward


def make_trimap_s1_train_step(cfg: Config, tx: optax.GradientTransformation):
    """train_s1_trimap.py equivalent: STM-only CE training."""
    cdt = _compute_dtype(cfg)
    stm_norm = cfg.stm_norm

    def loss_fn(params, batch_stats, batch):
        stm_vars = {"params": params["stm"], "batch_stats": batch_stats}
        return trimap_train_forward(stm_vars, batch, compute_dtype=cdt,
                                    stm_norm=stm_norm)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch):
        batch = decode_wire(batch)     # no-op on float batches
        if "img" not in batch:
            # composite on-device (models/trimap/model.py:57-60); doing this
            # in numpy cost ~30 MB of page-faulted host allocations per iter
            # on the 1-core host
            batch = dict(batch)
            batch["img"] = (batch["fg"] * batch["alpha"]
                            + batch["bg"] * (1.0 - batch["alpha"]))
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # hard labels of pred/GT for the in-training IoU metric
        # (train_s1_trimap.py:287-303); argmax on-device keeps the
        # host transfer at 1 byte/px instead of the soft trimaps.
        pred_lab = L.argmax_small(aux["pred"]).astype(jnp.uint8)
        gt_lab = L.argmax_small(batch["tri"]).astype(jnp.uint8)
        return (TrainState(params, state.batch_stats, opt_state, state.step + 1),
                dict(loss=loss, pred_lab=pred_lab, gt_lab=gt_lab))

    return train_step


def init_train_state(cfg: Config, rng: jax.Array, tx=None,
                     height: Optional[int] = None, width: Optional[int] = None
                     ) -> TrainState:
    """Random-init both networks for the given stage (shape-driven)."""
    from ..models.fba import FBA
    from ..models.stm import STM

    h, w = height or cfg.train.train_input_size[0], width or cfg.train.train_input_size[1]
    stage = cfg.train.stage
    stm = STM(hdim=16 if stage > 2 else -1, scale=cfg.model_scale,
              norm=cfg.stm_norm)
    fba = FBA(refinement=stage > 2, arch=cfg.alpha.arch, scale=cfg.model_scale)
    r1, r2, r3 = jax.random.split(rng, 3)

    frame = jnp.zeros((1, h, w, 3))
    mask = jnp.zeros((1, h, w))
    kwargs = {}
    if stm.hdim > 0:
        kwargs = dict(alpha=mask, hidden=jnp.zeros((1, h, w, stm.hdim)))
    # inits run under jit: eager op-by-op dispatch costs seconds per op on
    # tunneled hosts (docs/BENCH_NOTES.md), turning every process start into
    # minutes; one cached compile makes restarts (supervisor relaunches,
    # eval loads) near-instant.
    stm_m = jax.jit(lambda r: stm.init(r, frame, mask, mask,
                                       method=STM.memorize, **kwargs))(r1)
    hw16 = (h // 16) * (w // 16)
    stm_s = jax.jit(lambda r: stm.init(
        r, frame, jnp.zeros((1, 1, hw16, stm.key_dim)),
        jnp.zeros((1, 1, hw16, stm.val_dim)), None, method=STM.segment))(r2)

    def merge(a, b):
        out = dict(a)
        for k, v in b.items():
            out[k] = merge(a[k], v) if (k in a and isinstance(v, dict)) else \
                (out.get(k, v))
        return out

    stm_params = merge(dict(stm_m["params"]), dict(stm_s["params"]))
    batch_stats = merge(dict(stm_m.get("batch_stats", {})),
                        dict(stm_s.get("batch_stats", {})))
    fba_v = jax.jit(lambda r: fba.init(r, jnp.zeros((1, h, w, 11)), frame,
                                       jnp.zeros((1, h, w, 2))))(r3)
    params = {"stm": stm_params, "fba": dict(fba_v["params"])}
    opt_state = tx.init(params) if tx is not None else None
    return TrainState(params, batch_stats, opt_state, jnp.zeros((), jnp.int32))


def run_epoch(state: TrainState, train_step, batches, mesh=None):
    """Drive one epoch; batches is any iterable of host pytrees."""
    metrics_acc = None
    n = 0
    for batch in batches:
        if mesh is not None:
            batch = shard_batch(mesh, batch)
        state, metrics = train_step(state, batch)
        metrics_acc = metrics if metrics_acc is None else \
            jax.tree_util.tree_map(lambda a, b: a + b, metrics_acc, metrics)
        n += 1
    if metrics_acc is not None:
        metrics_acc = jax.tree_util.tree_map(lambda a: a / n, metrics_acc)
    return state, metrics_acc
