"""FBA matting network (alpha + foreground/background prediction).

Capability parity with models/alpha/FBA/models.py:
  * encoder: dilated ResNet-50-GN-WS, 11-channel input (3 normalized image +
    6 click transform + 2 soft trimap), output-stride 8 (models.py:48-92,
    208-269) — see otvm_tpu.nn.resnet_gn_ws.
  * fba_decoder (models.py:291-392): pyramid pooling (1,2,3,6) on conv5,
    conv_up1..4 with skip concats and x2 bilinear upsamples, 7-ch head
    (1 alpha + 3 F + 3 B) fused by the closed-form `fba_fusion`
    (models.py:279-288).  Returns the 16-ch penultimate features ("hid")
    consumed by the trimap memory encoder in the joint stages.
  * RefinementModule (models.py:395-435, stages 3-4): two GN-WS BasicBlocks
    over decoder features + trimap + alpha; re-predicts the 7-ch output
    (re-fused) AND 3-ch trimap logits.

All NHWC.  fba_fusion's sequential F-then-B update order and clamp placement
are load-bearing for parity and preserved exactly.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import Conv, GroupNorm32, WSConv, leaky_relu
from ..nn.ops import adaptive_avg_pool, resize_bilinear, upsample_x2
from ..nn.resnet_bn import ResNet50DilatedBN
from ..nn.resnet_gn_ws import BasicBlockGN, ResNet50DilatedGNWS

ENCODER_ARCHS = {
    # build_encoder archs (models.py:49-66).  resnet18/34_GN_WS exist in
    # the reference but are never selected anywhere and would change the
    # skip-channel contract; selecting them raises KeyError here by design.
    "resnet50_GN_WS": ResNet50DilatedGNWS,
    "resnet50_BN": ResNet50DilatedBN,
}

FEAT_DIM = 2048
DEC_DIM = 256
POOL_SCALES = (1, 2, 3, 6)


def fba_fusion(alpha, img, F, B):
    """models.py:279-288 — closed-form alpha/F/B consistency update.

    NOTE: B's update consumes the UPDATED F (sequential torch assignment);
    clamps happen before the alpha solve; la = 0.1.
    """
    F = alpha * img + (1 - alpha ** 2) * F - alpha * (1 - alpha) * B
    B = (1 - alpha) * img + (2 * alpha - alpha ** 2) * B - alpha * (1 - alpha) * F
    F = jnp.clip(F, 0, 1)
    B = jnp.clip(B, 0, 1)
    la = 0.1
    alpha = (alpha * la + jnp.sum((img - B) * (F - B), axis=-1, keepdims=True)) / (
        jnp.sum((F - B) * (F - B), axis=-1, keepdims=True) + la)
    alpha = jnp.clip(alpha, 0, 1)
    return alpha, F, B


class _ConvGNLRelu(nn.Module):
    features: int
    kernel: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = WSConv(self.features, self.kernel, 1, pad, dtype=self.dtype, name="conv")(x)
        x = GroupNorm32(name="norm")(x)
        return leaky_relu(x)


class FBADecoder(nn.Module):
    dtype: Optional[jnp.dtype] = None
    dec_dim: int = DEC_DIM

    @nn.compact
    def __call__(self, conv_out, img, two_chan_trimap):
        conv5 = conv_out[-1]
        hw = (conv5.shape[1], conv5.shape[2])
        ppm_out = [conv5]
        for i, scale in enumerate(POOL_SCALES):
            p = adaptive_avg_pool(conv5, (scale, scale))
            p = _ConvGNLRelu(self.dec_dim, 1, dtype=self.dtype, name=f"ppm{i}")(p)
            ppm_out.append(resize_bilinear(p, hw))
        x = jnp.concatenate(ppm_out, axis=-1)

        x = _ConvGNLRelu(self.dec_dim, 3, dtype=self.dtype, name="up1_0")(x)
        x = _ConvGNLRelu(self.dec_dim, 3, dtype=self.dtype, name="up1_1")(x)

        x = upsample_x2(x)
        x = jnp.concatenate([x, conv_out[-4]], axis=-1)       # + l1 (256, 1/4)
        x = _ConvGNLRelu(self.dec_dim, 3, dtype=self.dtype, name="up2")(x)

        x = upsample_x2(x)
        x = jnp.concatenate([x, conv_out[-5]], axis=-1)       # + c1 (64, 1/2)
        x = _ConvGNLRelu(64, 3, dtype=self.dtype, name="up3")(x)

        x = upsample_x2(x)
        # + first 3 channels of the 11-ch network input (normalized image)
        # and the [0,1] image (models.py:377)
        x = jnp.concatenate([x, conv_out[0][..., :3], img], axis=-1)
        x_dec = x                                              # 70ch, for refine
        x2 = jnp.concatenate([x, two_chan_trimap], axis=-1)    # 72ch

        h = Conv(32, 3, 1, 1, dtype=self.dtype, name="up4_0")(x2)
        h = leaky_relu(h)
        h = Conv(16, 3, 1, 1, dtype=self.dtype, name="up4_1")(h)
        hid = leaky_relu(h)                                    # 16ch "hid"
        output = Conv(7, 1, 1, 0, dtype=self.dtype, name="up4_2")(hid)

        alpha = jnp.clip(output[..., 0:1], 0, 1)
        F = nn.sigmoid(output[..., 1:4])
        B = nn.sigmoid(output[..., 4:7])
        alpha, F, B = fba_fusion(alpha, img, F, B)
        output = jnp.concatenate([alpha, F, B], axis=-1)
        return hid, output, x_dec


class RefinementModule(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_dec, img, two_chan_trimap, pred_alpha):
        x = jnp.concatenate([x_dec, two_chan_trimap, pred_alpha], axis=-1)  # 73ch
        x = _ConvGNLRelu(64, 3, dtype=self.dtype, name="conv1")(x)
        x = BasicBlockGN(64, dtype=self.dtype, name="layer1")(x)
        x = BasicBlockGN(64, dtype=self.dtype, name="layer2")(x)
        h = Conv(32, 3, 1, 1, dtype=self.dtype, name="pred_0")(x)
        h = leaky_relu(h)
        h = Conv(16, 3, 1, 1, dtype=self.dtype, name="pred_1")(h)
        hid = leaky_relu(h)                                    # 16ch, replaces decoder hid
        output = Conv(10, 1, 1, 0, dtype=self.dtype, name="pred_2")(hid)

        a = output[..., :7]
        alpha = jnp.clip(a[..., 0:1], 0, 1)
        F = nn.sigmoid(a[..., 1:4])
        B = nn.sigmoid(a[..., 4:7])
        alpha, F, B = fba_fusion(alpha, img, F, B)
        refined = jnp.concatenate([alpha, F, B], axis=-1)
        trimap_logits = output[..., 7:10]
        return hid, refined, trimap_logits


class FBA(nn.Module):
    """MattingModule (models.py:21-45): encoder -> decoder -> optional refine.

    __call__(x, img, two_chan_trimap):
      x: [B, H, W, 11] (normalized img + 6 clicks + 2 soft trimap), H, W
         multiples of 8 at least (reference pads the joint step to /32).
      img: [B, H, W, 3] in [0, 1].
      two_chan_trimap: [B, H, W, 2].
    Returns (output7, hid16, refine_output7, refine_trimap3); the refine
    outputs are None when refinement=False (stages 1-2).
    """
    refinement: bool = False
    arch: str = "resnet50_GN_WS"     # Config.alpha.arch (models.py:13)
    dtype: Optional[jnp.dtype] = None
    # scale > 1: width/depth-scaled dryrun variant (see STM.scale) — same
    # module tree, encoder channels / scale, 1 bottleneck per layer.
    scale: int = 1

    def setup(self):
        kw = {}
        if self.scale > 1:
            kw = dict(width=64 // self.scale, blocks=(1, 1, 1, 1))
        self.encoder = ENCODER_ARCHS[self.arch](dtype=self.dtype, name="encoder", **kw)
        self.decoder = FBADecoder(dtype=self.dtype, dec_dim=DEC_DIM // self.scale,
                                  name="decoder")
        if self.refinement:
            self.refine = RefinementModule(dtype=self.dtype, name="refine")

    def __call__(self, x, img, two_chan_trimap
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        conv_out = self.encoder(x)
        hid, output, x_dec = self.decoder(conv_out, img, two_chan_trimap)
        pred_alpha = output[..., 0:1]
        if self.refinement:
            hid, refine_output, refine_trimap = self.refine(
                x_dec, img, two_chan_trimap, pred_alpha)
        else:
            refine_output, refine_trimap = None, None
        return output, hid, refine_output, refine_trimap
