"""Fixed-shape space-time memory bank (KV ring buffer).

The reference mutates growing `self.this_keys/this_values` tensors and
re-concatenates per frame (models/trimap/model.py:193-225,
models/alpha/model.py:472-493) — every bank size is a new shape.  Here the
bank has a static capacity and a traced `count`; eviction is expressed as
fixed-shape slot moves + a validity mask, so the streaming step compiles
exactly once per resolution bucket.

Reference policy reproduced exactly (flags are traced -> one compiled step
serves every frame):
  * first_frame                  -> bank = {new}, count = 1
  * max_num == 0                 -> keep the first-frame memory forever
  * max_num == 1                 -> bank = {new}
  * else:
      memorize (every Nth frame) -> append
      otherwise                  -> replace the last slot (the rolling
                                    "previous frame" slot); if the bank only
                                    holds the first frame, append instead
      overflow (count > max_num) -> evict slot 1, keeping slot 0 = the
                                    ground-truth first frame (or evict slot 0
                                    when keep_first=False, the `memorize_gt`
                                    variant of trimap-only eval,
                                    models/trimap/model.py:215-221)
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .stm import KEY_DIM, VAL_DIM


@struct.dataclass
class MemoryBank:
    keys: jnp.ndarray    # [B, CAP, HW, KEY_DIM]
    values: jnp.ndarray  # [B, CAP, HW, VAL_DIM]
    count: jnp.ndarray   # [] int32 — number of valid slots

    @property
    def capacity(self) -> int:
        return self.keys.shape[1]

    @property
    def slot_mask(self) -> jnp.ndarray:
        """[B, CAP] bool — True for valid slots."""
        b, cap = self.keys.shape[:2]
        m = jnp.arange(cap) < self.count
        return jnp.broadcast_to(m[None, :], (b, cap))


def init_bank(batch: int, hw: int, max_memory_num: int,
              dtype=jnp.float32, key_dim: int = KEY_DIM,
              val_dim: int = VAL_DIM) -> MemoryBank:
    """Capacity = max_memory_num + 1: one transient slot for the
    append-then-evict sequence the reference performs on overflow.
    key_dim/val_dim only deviate for the width-scaled dryrun model."""
    cap = max(max_memory_num, 1) + 1
    return MemoryBank(
        keys=jnp.zeros((batch, cap, hw, key_dim), dtype),
        values=jnp.zeros((batch, cap, hw, val_dim), dtype),
        count=jnp.zeros((), jnp.int32),
    )


def _write_slot(bank_arr: jnp.ndarray, new: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """bank_arr [B, CAP, HW, C], new [B, HW, C], idx [] int32."""
    return jax.lax.dynamic_update_slice(
        bank_arr, new[:, None], (0, idx, 0, 0))


def _drop_slot(bank_arr: jnp.ndarray, slot: int) -> jnp.ndarray:
    """Remove `slot`, shifting later slots left; stale data parks at the end
    (masked out by count)."""
    parts = [bank_arr[:, :slot], bank_arr[:, slot + 1:], bank_arr[:, slot:slot + 1]]
    return jnp.concatenate(parts, axis=1)


def update_bank(bank: MemoryBank, new_k: jnp.ndarray, new_v: jnp.ndarray,
                first_frame: jnp.ndarray, memorize: jnp.ndarray,
                max_memory_num: int, keep_first: bool = True) -> MemoryBank:
    """One streaming-eval bank update.  first_frame/memorize are traced bools;
    max_memory_num and keep_first are static (recompile per eval protocol,
    not per frame)."""
    if max_memory_num <= 1:
        # max_num==1: always replace; max_num==0: only write the first frame.
        def reset(b):
            k = _write_slot(jnp.zeros_like(b.keys), new_k, jnp.int32(0))
            v = _write_slot(jnp.zeros_like(b.values), new_v, jnp.int32(0))
            return MemoryBank(k, v, jnp.int32(1))
        if max_memory_num == 1:
            return reset(bank)
        return jax.lax.cond(first_frame, reset, lambda b: b, bank)

    def on_first(b: MemoryBank) -> MemoryBank:
        k = _write_slot(jnp.zeros_like(b.keys), new_k, jnp.int32(0))
        v = _write_slot(jnp.zeros_like(b.values), new_v, jnp.int32(0))
        return MemoryBank(k, v, jnp.int32(1))

    def on_rest(b: MemoryBank) -> MemoryBank:
        append = jnp.logical_or(memorize, b.count == 1)
        idx = jnp.where(append, b.count, b.count - 1)
        cnt = jnp.where(append, b.count + 1, b.count)
        k = _write_slot(b.keys, new_k, idx)
        v = _write_slot(b.values, new_v, idx)

        def evict(args):
            k, v, cnt = args
            slot = 1 if keep_first else 0
            return _drop_slot(k, slot), _drop_slot(v, slot), cnt - 1

        k, v, cnt = jax.lax.cond(cnt > max_memory_num, evict,
                                 lambda a: a, (k, v, cnt))
        return MemoryBank(k, v, cnt)

    return jax.lax.cond(first_frame, on_first, on_rest, bank)


def read_inputs(bank: MemoryBank) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(mem_keys, mem_values, slot_mask) for STM.segment / memory_read."""
    return bank.keys, bank.values, bank.slot_mask
