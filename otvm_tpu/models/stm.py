"""STM trimap-propagation network (TPU-native re-design).

Capability parity with models/trimap/STM.py:
  * Encoder_M (STM.py:32-74): ResNet-50 trunk whose stem conv is summed with
    parallel 7x7/s2 convs over the extra mask channels — unknown-region (m),
    foreground (o), and for the joint stages alpha (a) + 16-ch decoder hidden
    state (h).  The bg channel of the trimap is NOT fed (STM.py:211-215).
  * Encoder_Q (STM.py:76-102): plain trunk on the query frame.
  * KeyValue heads (STM.py:166-174): 3x3 convs 1024 -> (128 key, 512 value),
    separate for memory and query.
  * Memory read (STM.py:140-163): see otvm_tpu.kernels.memory_attn.
  * Decoder (STM.py:105-137): ResBlock + two Refine stages + 3-class head,
    x4 bilinear upsample.

Re-design notes (vs the reference, deliberately different):
  * No rank-based forward dispatch (STM.py:259-263) — `memorize` / `segment`
    are explicit methods, both pure functions of (params, inputs).
  * No per-object python batching (num_objects == 1 always in OTVM); batch is
    a real batch dimension, vmap-friendly.
  * KV tensors are [B, HW, C] channels-last; the memory bank stacks them as
    [B, T, HW, C] (see otvm_tpu.models.memory).
  * /16 padding is handled by the caller (one pad for the whole joint step)
    so the trimap and alpha nets see identically padded frames.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..kernels.memory_attn import memory_read
from ..nn.layers import Conv
from ..nn.ops import resize_bilinear, upsample_x2
from ..nn.resnet import ResNet50Trunk

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

KEY_DIM = 128
VAL_DIM = 512


def normalize_image(x: jnp.ndarray) -> jnp.ndarray:
    """(img01 - imagenet_mean) / imagenet_std on NHWC."""
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


class ResBlockSTM(nn.Module):
    """STM.py:9-30 — pre-activation residual block, convs have bias."""
    outdim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        r = Conv(self.outdim, 3, 1, 1, dtype=self.dtype, name="conv1")(nn.relu(x))
        r = Conv(self.outdim, 3, 1, 1, dtype=self.dtype, name="conv2")(nn.relu(r))
        if x.shape[-1] != self.outdim:
            x = Conv(self.outdim, 3, 1, 1, dtype=self.dtype, name="downsample")(x)
        return x + r


class Refine(nn.Module):
    """STM.py:105-117 — skip fusion + x2 upsample."""
    planes: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, f, pm):
        s = Conv(self.planes, 3, 1, 1, dtype=self.dtype, name="convFS")(f)
        s = ResBlockSTM(self.planes, dtype=self.dtype, name="ResFS")(s)
        m = s + upsample_x2(pm)
        return ResBlockSTM(self.planes, dtype=self.dtype, name="ResMM")(m)


class Decoder(nn.Module):
    """STM.py:119-137 — memory readout -> 3-class trimap logits at full res."""
    mdim: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, m4, r3, r2):
        m = Conv(self.mdim, 3, 1, 1, dtype=self.dtype, name="convFM")(m4)
        m4 = ResBlockSTM(self.mdim, dtype=self.dtype, name="ResMM")(m)
        m3 = Refine(self.mdim, dtype=self.dtype, name="RF3")(r3, m4)
        m2 = Refine(self.mdim, dtype=self.dtype, name="RF2")(r2, m3)
        p2 = Conv(3, 3, 1, 1, dtype=self.dtype, name="pred")(nn.relu(m2))
        return resize_bilinear(p2, (p2.shape[1] * 4, p2.shape[2] * 4))


class KeyValue(nn.Module):
    """STM.py:166-174."""
    dtype: Optional[jnp.dtype] = None
    key_dim: int = KEY_DIM
    val_dim: int = VAL_DIM

    @nn.compact
    def __call__(self, x):
        k = Conv(self.key_dim, 3, 1, 1, dtype=self.dtype, name="Key")(x)
        v = Conv(self.val_dim, 3, 1, 1, dtype=self.dtype, name="Value")(x)
        return k, v


class STM(nn.Module):
    """hdim <= 0: stage-1/2 variant (trimap-only memory);
    hdim == 16: joint variant fed with alpha + decoder hidden state.

    scale > 1 builds the width/depth-scaled dryrun variant: every module,
    method, and dataflow edge is identical (same param-tree structure),
    channels are divided by `scale` and the trunks use 1 bottleneck per
    layer — used only to validate multi-chip sharding on CPU hosts where
    the full graph cannot compile in budget (VERDICT r3 #1)."""
    hdim: int = -1
    dtype: Optional[jnp.dtype] = None
    scale: int = 1
    # 'gn': GroupNorm trunk for from-scratch training (frozen BN at random
    # init is the identity — round-3 s1t never learned; nn/resnet._norm).
    norm: str = "frozen_bn"

    @property
    def key_dim(self) -> int:
        return KEY_DIM // self.scale

    @property
    def val_dim(self) -> int:
        return VAL_DIM // self.scale

    def setup(self):
        s = self.scale
        w = 64 // s
        blocks = (3, 4, 6) if s == 1 else (1, 1, 1)
        self.enc_m_trunk = ResNet50Trunk(dtype=self.dtype, width=w, blocks=blocks,
                                         norm=self.norm, name="Encoder_M")
        self.enc_q_trunk = ResNet50Trunk(dtype=self.dtype, width=w, blocks=blocks,
                                         norm=self.norm, name="Encoder_Q")
        self.conv1_m = Conv(w, 7, 2, 3, use_bias=False, dtype=self.dtype, name="conv1_m")
        self.conv1_o = Conv(w, 7, 2, 3, use_bias=False, dtype=self.dtype, name="conv1_o")
        if self.hdim > 0:
            self.conv1_a = Conv(w, 7, 2, 3, use_bias=False, dtype=self.dtype, name="conv1_a")
            self.conv1_h = Conv(w, 7, 2, 3, use_bias=False, dtype=self.dtype, name="conv1_h")
        self.kv_m = KeyValue(dtype=self.dtype, key_dim=self.key_dim,
                             val_dim=self.val_dim, name="KV_M_r4")
        self.kv_q = KeyValue(dtype=self.dtype, key_dim=self.key_dim,
                             val_dim=self.val_dim, name="KV_Q_r4")
        self.decoder = Decoder(mdim=256 // s, dtype=self.dtype, name="Decoder")

    def memorize(self, frame: jnp.ndarray, unknown: jnp.ndarray, fg: jnp.ndarray,
                 alpha: Optional[jnp.ndarray] = None,
                 hidden: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Encode one past frame into (key, value).

        frame:   [B, H, W, 3] in [0, 1]; H, W multiples of 16 (caller pads).
        unknown: [B, H, W]  trimap unknown-region probability
        fg:      [B, H, W]  trimap foreground probability
        alpha:   [B, H, W]       (hdim > 0 only)
        hidden:  [B, H, W, hdim] (hdim > 0 only)
        returns key [B, HW/256, 128], value [B, HW/256, 512].
        """
        f = normalize_image(frame)
        x = self.conv1_m(unknown[..., None]) + self.conv1_o(fg[..., None])
        if self.hdim > 0:
            x = x + self.conv1_a(alpha[..., None]) + self.conv1_h(hidden)
        x = x + self.enc_m_trunk.stem_conv(f)
        r4, _, _, _ = self.enc_m_trunk.stages(x)
        k, v = self.kv_m(r4)
        b, h, w, _ = k.shape
        return k.reshape(b, h * w, self.key_dim), v.reshape(b, h * w, self.val_dim)

    def segment(self, frame: jnp.ndarray, mem_keys: jnp.ndarray, mem_values: jnp.ndarray,
                slot_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Propagate: attend over the memory bank, decode 3-class logits.

        frame: [B, H, W, 3] in [0, 1], H, W multiples of 16.
        mem_keys [B, T, HW16, 128], mem_values [B, T, HW16, 512],
        slot_mask [B, T] bool.  returns logits [B, H, W, 3].
        """
        f = normalize_image(frame)
        r4, r3, r2, _ = self.enc_q_trunk(f)
        k4, v4 = self.kv_q(r4)
        b, h, w, _ = k4.shape
        q_k = k4.reshape(b, h * w, self.key_dim)
        mem = memory_read(q_k, mem_keys, mem_values, slot_mask)
        m4 = jnp.concatenate([mem.reshape(b, h, w, self.val_dim), v4], axis=-1)
        return self.decoder(m4, r3, r2)
