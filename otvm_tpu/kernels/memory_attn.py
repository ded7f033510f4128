"""Space-time memory read — THE hot kernel of trimap propagation.

Reference semantics (models/trimap/STM.py:140-163):
    p   = softmax_over_memory( K_mem^T @ K_query / sqrt(D_key) )
    out = V_mem @ p
i.e. standard cross-attention with queries = query-frame key pixels,
keys/values = all memorized pixels (T * H/16 * W/16 slots).

Two implementations:
  * `memory_read_xla`    — jnp einsum/softmax.  Used on CPU (tests) and as
    the autodiff path during training (XLA fuses it well at train sizes).
  * `memory_read_pallas` — flash-attention style Pallas TPU kernel: tiles
    queries over the grid, streams the KV bank through VMEM with an online
    (running-max) softmax, never materializing the [THW, HW] score matrix.
    At 1088p eval the score matrix alone would be ~1.3 GB fp32 — the kernel
    keeps it in tiles.

The KV bank is a fixed-capacity ring buffer (otvm_tpu.models.memory); slots
beyond the currently-valid count are masked out via `slot_mask`, so the
kernel compiles ONCE per resolution bucket regardless of video length.

`memory_read` dispatches: Pallas on TPU backends, XLA elsewhere.
"""
from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

# flash tile sizes, sweepable without code edits (read once at import;
# the kernel is re-jitted per process anyway)
_BLOCK_Q = int(os.environ.get("OTVM_FLASH_BQ", "512"))
_BLOCK_KV = int(os.environ.get("OTVM_FLASH_BKV", "512"))


def _flatten_bank(m_k: jnp.ndarray, m_v: jnp.ndarray, slot_mask: Optional[jnp.ndarray]):
    """[B, T, HW, C] bank -> [B, T*HW, C] (+ per-position mask)."""
    b, t, hw, ck = m_k.shape
    cv = m_v.shape[-1]
    k = m_k.reshape(b, t * hw, ck)
    v = m_v.reshape(b, t * hw, cv)
    if slot_mask is None:
        mask = None
    else:
        mask = jnp.repeat(slot_mask.astype(jnp.bool_), hw, axis=-1)  # [B, T*HW]
    return k, v, mask


def memory_read_xla(q_k: jnp.ndarray, m_k: jnp.ndarray, m_v: jnp.ndarray,
                    slot_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """q_k: [B, HW, Ck]; m_k: [B, T, HW, Ck]; m_v: [B, T, HW, Cv];
    slot_mask: [B, T] bool (True = valid memory slot).  -> [B, HW, Cv]."""
    ck = q_k.shape[-1]
    k, v, mask = _flatten_bank(m_k, m_v, slot_mask)
    scores = jnp.einsum("bqc,bkc->bqk", q_k, k,
                        preferred_element_type=jnp.float32) / math.sqrt(ck)
    if mask is not None:
        scores = jnp.where(mask[:, None, :], scores, _NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bqk,bkv->bqv", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q_k.dtype)


# ---------------------------------------------------------------------------
# Pallas flash kernel
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, acc_ref, m_ref, l_ref,
                  *, scale: float, kv_blocks: int):
    """Grid = (B, Q_blocks, KV_blocks); KV axis innermost (sequential).

    q_ref:   [1, BQ, Ck]     (same Q tile for every kv step)
    k_ref:   [1, BK, Ck]     v_ref: [1, BK, Cv]
    mask_ref:[1, 1, BK]      bool validity per memory position
    o_ref:   [1, BQ, Cv]     written on the last kv step
    scratch: acc [BQ, Cv] f32, m [BQ, 128] f32 running max, l [BQ, 128] f32.
    """
    kv_i = pl.program_id(2)

    @pl.when(kv_i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]                                    # [BQ, Ck]
    k = k_ref[0]                                    # [BK, Ck]
    v = v_ref[0]                                    # [BK, Cv]
    # bf16 inputs: precision pinned to DEFAULT — this is a hand-written MXU
    # kernel that accumulates in f32 via preferred_element_type; a GLOBAL
    # jax_default_matmul_precision="highest" (e.g. the parity-test conftest)
    # would otherwise inject contract_precision<fp32> into a bf16 tpu.matmul,
    # which Mosaic rejects ("Bad lhs type").  f32 inputs keep the ambient
    # precision so pallas-vs-XLA parity tests stay exact.
    prec = (jax.lax.Precision.DEFAULT if q.dtype == jnp.bfloat16 else None)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec) * scale  # [BQ, BK]
    valid = mask_ref[0, 0]                           # [BK]
    s = jnp.where(valid[None, :], s, _NEG_INF)

    m_prev = m_ref[:, :1]                            # [BQ, 1]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_cur)                  # [BQ, 1]
    p = jnp.exp(s - m_cur)                           # [BQ, BK]
    p = jnp.where(valid[None, :], p, 0.0)            # kill -inf--inf artifacts
    l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:, :1] = m_cur
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.DEFAULT
                   if v.dtype == jnp.bfloat16 else None))

    @pl.when(kv_i == kv_blocks - 1)
    def _finish():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("block_q", "block_kv", "interpret"))
def memory_read_pallas(q_k: jnp.ndarray, m_k: jnp.ndarray, m_v: jnp.ndarray,
                       slot_mask: Optional[jnp.ndarray] = None,
                       block_q: int = _BLOCK_Q, block_kv: int = _BLOCK_KV,
                       interpret: bool = False) -> jnp.ndarray:
    b, hw, ck = q_k.shape
    t = m_k.shape[1]
    cv = m_v.shape[-1]
    k, v, mask = _flatten_bank(m_k, m_v, slot_mask)
    kv_len = k.shape[1]
    if mask is None:
        mask = jnp.ones((b, kv_len), dtype=jnp.bool_)

    # pad Q and KV axes up to tile multiples; padded KV is masked out,
    # padded Q rows are dropped after the call.
    q_pad = _round_up(hw, block_q)
    kv_pad = _round_up(kv_len, block_kv)
    qk = jnp.pad(q_k, ((0, 0), (0, q_pad - hw), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, kv_pad - kv_len), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, kv_pad - kv_len), (0, 0)))
    # [B, 1, KV]: the singleton keeps the (sublane, lane) block dims legal
    # for any batch size (last-two-dims rule of the TPU lowering)
    mp = jnp.pad(mask, ((0, 0), (0, kv_pad - kv_len)))[:, None, :]

    q_blocks = q_pad // block_q
    kv_blocks = kv_pad // block_kv
    scale = 1.0 / math.sqrt(ck)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_blocks=kv_blocks),
        grid=(b, q_blocks, kv_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, ck), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, block_kv, ck), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, block_kv, cv), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, 1, block_kv), lambda ib, iq, ik: (ib, 0, ik)),
        ],
        out_specs=pl.BlockSpec((1, block_q, cv), lambda ib, iq, ik: (ib, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, q_pad, cv), q_k.dtype),
        scratch_shapes=[
            # acc / running max / running sum live across the kv axis
            pltpu.VMEM((block_q, cv), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        interpret=interpret,
    )(qk, kp, vp, mp)
    return out[:, :hw, :]


# ---------------------------------------------------------------------------
# differentiable wrapper: flash forward, einsum backward
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _memory_read_flash(q_k, m_k, m_v, slot_mask):
    return memory_read_pallas(q_k, m_k, m_v, slot_mask)


def _flash_fwd(q_k, m_k, m_v, slot_mask):
    return memory_read_pallas(q_k, m_k, m_v, slot_mask), (q_k, m_k, m_v, slot_mask)


def _flash_bwd(res, g):
    """Exact softmax-attention VJP via the einsum formulation.  Training
    shapes are small (HW/256 of 320p crops, T <= 2), so materializing the
    score matrix in the backward pass is cheap; the flash kernel still runs
    the forward."""
    q_k, m_k, m_v, slot_mask = res
    ck = q_k.shape[-1]
    k, v, mask = _flatten_bank(m_k, m_v, slot_mask)
    scale = 1.0 / math.sqrt(ck)
    s = jnp.einsum("bqc,bkc->bqk", q_k, k,
                   preferred_element_type=jnp.float32) * scale
    if mask is not None:
        s = jnp.where(mask[:, None, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bqk,bqv->bkv", p, g32)
    dp = jnp.einsum("bqv,bkv->bqk", g32, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bqk,bkc->bqc", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bqk,bqc->bkc", ds, q_k.astype(jnp.float32)) * scale
    b, t, hw, _ = m_k.shape
    d_mask = None
    if slot_mask is not None:
        import numpy as np

        d_mask = np.zeros(slot_mask.shape, dtype=jax.dtypes.float0)
    return (dq.astype(q_k.dtype),
            dk.reshape(m_k.shape).astype(m_k.dtype),
            dv.reshape(m_v.shape).astype(m_v.dtype),
            d_mask)


_memory_read_flash.defvjp(_flash_fwd, _flash_bwd)


def memory_read(q_k: jnp.ndarray, m_k: jnp.ndarray, m_v: jnp.ndarray,
                slot_mask: Optional[jnp.ndarray] = None,
                use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """Dispatching entry point: Pallas on TPU, XLA einsum elsewhere.
    Differentiable either way (the flash path carries a custom einsum VJP)."""
    if use_pallas is None:
        use_pallas = jax.default_backend().startswith("tpu")
    if use_pallas:
        return _memory_read_flash(q_k, m_k, m_v, slot_mask)
    return memory_read_xla(q_k, m_k, m_v, slot_mask)
