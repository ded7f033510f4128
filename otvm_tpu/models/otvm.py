"""Joint OTVM model: trimap propagation x alpha prediction, cross-feeding.

Capability parity:
  * `make_trimap_features`  == alpha FullModel.make_trimap
    (models/alpha/model.py:40-53): 3-ch soft trimap -> 8-ch FBA input
    (6 distance-transform "clicks" + soft bg/fg probabilities).
  * `eval_frame_step`       == alpha EvalModel.forward streaming path
    (models/alpha/model.py:391-512): segment -> FBA -> refine -> memorize,
    with the reference memory policy (first/rolling/every-Nth, keep slot 0).
    ONE jitted function per resolution bucket; flags are traced booleans.
  * `joint_train_forward`   == alpha FullModel.forward
    (models/alpha/model.py:189-312): S-frame temporal loop with alpha->trimap
    memory cross-feeding, FBA loss stack + trimap CE.
  * `trimap_train_forward`  == trimap FullModel._forward stage-1
    (models/trimap/model.py:75-131), vmap-free batched rewrite.

Design notes (TPU-first, deliberately different from the reference):
  * all state is explicit: params dicts + MemoryBank pytree; no nn.Module
    mutation, no growing tensors at eval (fixed-capacity bank + masks).
  * the reference's CPU round-trip for distance transforms
    (utils/utils.py:12-23) is an on-device JFA EDT (otvm_tpu.nn.edt).
  * frames arrive RGB in [0,1] (the reference flips BGR and scales by 1/255
    inside the model; our data layer does it on the host once).
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.edt import trimap_clicks
from ..train import losses as L
from .fba import FBA
from .memory import MemoryBank, init_bank, update_bank
from .stm import STM, normalize_image


def make_trimap_features(tri3: jnp.ndarray, exact_edt: bool = False
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """tri3 [B,H,W,3] soft trimap -> (feats8 [B,H,W,8], trimask [B,H,W,1]).

    feats8 = [bg clicks x3, fg clicks x3, soft bg prob, soft fg prob];
    trimask = hard unknown region (argmax == 1)."""
    am = L.argmax_small(tri3)
    t2b = (am == 0).astype(jnp.float32)
    t2f = (am == 2).astype(jnp.float32)
    # clicks are gradient-free by construction (binarized inputs; the
    # reference computes them in cv2 on the host, utils/utils.py:12-23);
    # stop_gradient keeps the EDT out of the backward graph entirely.
    clicks = jax.lax.stop_gradient(
        trimap_clicks(jnp.stack([t2b, t2f], axis=-1), exact=exact_edt))
    soft = jnp.stack([tri3[..., 0], tri3[..., 2]], axis=-1)
    feats = jnp.concatenate([clicks.astype(tri3.dtype), soft], axis=-1)
    trimask = (am == 1).astype(tri3.dtype)[..., None]
    return feats, trimask


def _models(stage: int, arch: str = "resnet50_GN_WS", scale: int = 1,
            stm_norm: str = "frozen_bn"):
    refinement = stage > 2
    stm = STM(hdim=16 if stage > 2 else -1, scale=scale, norm=stm_norm)
    fba = FBA(refinement=refinement, arch=arch, scale=scale)
    return stm, fba, refinement


# ---------------------------------------------------------------------------
# streaming eval (serve path)
# ---------------------------------------------------------------------------

class EvalOutput(NamedTuple):
    bank: MemoryBank
    alpha: jnp.ndarray     # [B, H, W, 1]
    trimap: jnp.ndarray    # [B, H, W, 3]


def _eval_frame_core(stm_vars, fba_vars, bank: MemoryBank,
                     frame01: jnp.ndarray, first_trimap3: jnp.ndarray,
                     first_frame: jnp.ndarray, memorize: jnp.ndarray,
                     last_frame: jnp.ndarray,
                     stage: int, max_memory_num: int,
                     exact_edt: bool, arch: str, scale: int = 1,
                     stm_norm: str = "frozen_bn",
                     wire_u8_out: bool = False) -> EvalOutput:
    """One frame of streaming joint inference (traced body shared by the
    per-frame jit and the chunked lax.scan).

    frame01 [B,H,W,3] in [0,1], H,W multiples of 32 (caller pads — the
    reference pads to /32 at models/alpha/model.py:408-410).
    first_trimap3 [B,H,W,3]: GT trimap, consumed only when first_frame.
    Flags are traced; shapes compile once per resolution bucket.

    frame01 may arrive as uint8 (0..255): decoded images ARE uint8, so the
    runner ships them raw over the host->device link (4-6 MB/s on tunneled
    hosts — see docs/BENCH_NOTES.md) and the /255 happens here, exactly.
    """
    if frame01.dtype == jnp.uint8:
        # decode in f32 (exact /255), then drop to the serving dtype so the
        # wire path computes in the SAME precision as the device-resident
        # path (bf16 serving: an f32 decode left lax.cond's trimap branches
        # with mismatched dtypes — bf16 GT vs f32 segment — and broke compile)
        frame01 = (frame01.astype(jnp.float32) / 255.0).astype(
            first_trimap3.dtype)
    stm, fba, refinement = _models(stage, arch, scale, stm_norm)

    def use_gt(_):
        return first_trimap3

    def do_segment(_):
        logits = stm.apply(stm_vars, frame01, bank.keys, bank.values,
                           bank.slot_mask, method=STM.segment)
        return jax.nn.softmax(logits, axis=-1)

    trimap3 = jax.lax.cond(first_frame, use_gt, do_segment, None)

    feats8, _ = make_trimap_features(trimap3, exact_edt)
    x11 = jnp.concatenate([normalize_image(frame01), feats8], axis=-1)
    out7, hid, rout7, rtri = fba.apply(fba_vars, x11, frame01, feats8[..., -2:])

    alpha = (rout7 if refinement else out7)[..., 0:1]
    # the refinement's re-predicted trimap replaces the propagated one for
    # BOTH output and memorization — including on the first frame
    # (models/alpha/model.py:459-460)
    out_trimap = jax.nn.softmax(rtri, axis=-1) if refinement else trimap3

    def do_memorize(b: MemoryBank) -> MemoryBank:
        kwargs = {}
        if stm.hdim > 0:
            kwargs = dict(alpha=alpha[..., 0], hidden=hid)
        k, v = stm.apply(stm_vars, frame01, out_trimap[..., 1], out_trimap[..., 2],
                         method=STM.memorize, **kwargs)
        return update_bank(b, k, v, first_frame, memorize, max_memory_num)

    bank = jax.lax.cond(last_frame, lambda b: b, do_memorize, bank)
    if wire_u8_out:
        # serving wire mode: shrink the per-frame device->host fetch to the
        # bytes serving actually consumes (the tunnel/PCIe link, not the
        # chip, bounds the wire protocol — docs/BENCH_NOTES.md):
        #   alpha  -> uint8 [B,H,W,1]: protocol-faithful, not an
        #     approximation — the reference writes alpha as uint8 PNGs
        #     before any metric reads it (eval.py:136-144), so /255-decoded
        #     wire alphas are bit-identical to its pipeline;
        #   trimap -> uint8 LABEL [B,H,W] (argmax): the reference's eval
        #     never persists trimap probabilities at all (eval.py:136-144
        #     writes only alpha), and nothing metric-bearing reads predicted
        #     probs — label is enough for viz/window mode at 1/12 the bytes.
        # The bank update above stays in serving precision: the stream's
        # trajectory is IDENTICAL to the non-wire protocol.
        alpha_u8 = jnp.round(
            jnp.clip(alpha.astype(jnp.float32), 0.0, 1.0) * 255.0
        ).astype(jnp.uint8)
        tri_label = jnp.argmax(out_trimap, axis=-1).astype(jnp.uint8)
        return EvalOutput(bank, alpha_u8, tri_label)
    return EvalOutput(bank, alpha, out_trimap)


@functools.partial(jax.jit,
                   static_argnames=("stage", "max_memory_num", "exact_edt",
                                    "arch", "scale", "stm_norm", "wire_u8_out"),
                   donate_argnums=(2,))
def eval_frame_step(stm_vars, fba_vars, bank: MemoryBank,
                    frame01: jnp.ndarray, first_trimap3: jnp.ndarray,
                    first_frame: jnp.ndarray, memorize: jnp.ndarray,
                    last_frame: jnp.ndarray,
                    stage: int = 4, max_memory_num: int = 5,
                    exact_edt: bool = False,
                    arch: str = "resnet50_GN_WS", scale: int = 1,
                    stm_norm: str = "frozen_bn",
                    wire_u8_out: bool = False) -> EvalOutput:
    """Single-frame dispatch (lowest latency; one device round trip per
    frame).  See _eval_frame_core for semantics."""
    return _eval_frame_core(stm_vars, fba_vars, bank, frame01, first_trimap3,
                            first_frame, memorize, last_frame,
                            stage, max_memory_num, exact_edt, arch, scale,
                            stm_norm, wire_u8_out)


@functools.partial(jax.jit,
                   static_argnames=("stage", "max_memory_num", "exact_edt",
                                    "arch", "stm_norm"),
                   donate_argnums=(2,))
def eval_chunk_step(stm_vars, fba_vars, bank: MemoryBank,
                    frames01: jnp.ndarray, first_trimap3: jnp.ndarray,
                    first_flags: jnp.ndarray, memorize_flags: jnp.ndarray,
                    last_flags: jnp.ndarray,
                    stage: int = 4, max_memory_num: int = 5,
                    exact_edt: bool = False,
                    arch: str = "resnet50_GN_WS", stm_norm: str = "frozen_bn"):
    """T frames in ONE dispatch via lax.scan over _eval_frame_core —
    byte-for-byte the per-frame protocol (same flags per frame), but the
    host->device round trip is amortized T-fold.  For buffered/offline
    streams (the reference's eval protocol IS offline, eval.py:157); use
    eval_frame_step when per-frame latency matters.

    frames01 [T,B,H,W,3]; flags [T] bool arrays.
    Returns (bank, alphas [T,B,H,W,1], trimaps [T,B,H,W,3])."""
    def body(b, inp):
        frame, first, mem, last = inp
        out = _eval_frame_core(stm_vars, fba_vars, b, frame, first_trimap3,
                               first, mem, last,
                               stage, max_memory_num, exact_edt, arch,
                               1, stm_norm)
        return out.bank, (out.alpha, out.trimap)

    bank, (alphas, trimaps) = jax.lax.scan(
        body, bank, (frames01, first_flags, memorize_flags, last_flags))
    return bank, alphas, trimaps


def make_eval_bank(batch: int, height: int, width: int, max_memory_num: int = 5,
                   dtype=jnp.float32, scale: int = 1) -> MemoryBank:
    """Bank sized for /16 feature maps of a (padded) H x W frame.
    scale > 1 sizes it for the width-scaled dryrun/test model."""
    assert height % 16 == 0 and width % 16 == 0
    return init_bank(batch, (height // 16) * (width // 16), max_memory_num,
                     dtype, key_dim=128 // scale, val_dim=512 // scale)


@functools.partial(jax.jit, static_argnames=("stage", "exact_edt", "arch"))
def alpha_predict(fba_vars, frame01: jnp.ndarray, trimap3: jnp.ndarray,
                  stage: int = 1, exact_edt: bool = False,
                  arch: str = "resnet50_GN_WS"):
    """Single-frame FBA alpha prediction with a GIVEN trimap — the stage-1/2
    eval path (alpha EvalModel with trimap=None, models/alpha/model.py:419,
    456-457) and BASELINE config[0].  Returns (alpha [B,H,W,1], fba7).
    frame01 may be uint8 (see _eval_frame_core)."""
    if frame01.dtype == jnp.uint8:
        # serving-dtype decode, see _eval_frame_core
        frame01 = (frame01.astype(jnp.float32) / 255.0).astype(trimap3.dtype)
    _, fba, refinement = _models(stage, arch)
    feats8, _ = make_trimap_features(trimap3, exact_edt)
    x11 = jnp.concatenate([normalize_image(frame01), feats8], axis=-1)
    out7, hid, rout7, _ = fba.apply(fba_vars, x11, frame01, feats8[..., -2:])
    pred = rout7 if refinement else out7
    return pred[..., 0:1], pred


@functools.partial(jax.jit, static_argnames=("max_memory_num", "memorize_gt",
                                             "stm_norm"),
                   donate_argnums=(1,))
def trimap_eval_step(stm_vars, bank: MemoryBank, frame01: jnp.ndarray,
                     first_trimap3: jnp.ndarray, first_frame: jnp.ndarray,
                     memorize: jnp.ndarray, max_memory_num: int = 5,
                     memorize_gt: bool = False, stm_norm: str = "frozen_bn"):
    """Trimap-propagation-only streaming eval (trimap FullModel_eval stage 1,
    models/trimap/model.py:173-281): segment with the current bank, then
    memorize the PREDICTED (or GT when memorize_gt) trimap of this frame.

    Returns (bank, trimap3).  With memorize_gt the overflow eviction drops
    slot 0 instead of keeping it (model.py:215-221)."""
    stm = STM(hdim=-1, norm=stm_norm)

    def use_gt(_):
        return first_trimap3

    def do_segment(_):
        logits = stm.apply(stm_vars, frame01, bank.keys, bank.values,
                           bank.slot_mask, method=STM.segment)
        return jax.nn.softmax(logits, axis=-1)

    pred = jax.lax.cond(first_frame, use_gt, do_segment, None)
    mem_tri = first_trimap3 if memorize_gt else pred
    k, v = stm.apply(stm_vars, frame01, mem_tri[..., 1], mem_tri[..., 2],
                     method=STM.memorize)
    bank = update_bank(bank, k, v, first_frame, memorize, max_memory_num,
                       keep_first=not memorize_gt)
    return bank, pred


# ---------------------------------------------------------------------------
# joint training forward (stages 1-4 of train.py)
# ---------------------------------------------------------------------------

def joint_train_forward(stm_vars, fba_vars, batch: Dict[str, jnp.ndarray],
                        stage: int, exact_edt: bool = False,
                        arch: str = "resnet50_GN_WS",
                        compute_dtype=None, scale: int = 1,
                        stm_norm: str = "frozen_bn"):
    """Training forward + loss, == alpha FullModel.forward.

    batch (all NHWC, S = frames per clip):
      fg, bg: [B,S,H,W,3] RGB in [0,1]
      alpha:  [B,S,H,W,1]
      tri:    [B,S,H,W,3] one-hot GT trimap (data-side synthesis)
    Returns (total_loss, aux dict with sub-losses and visuals).
    Loss composition per train.py:355-366: L_alpha_comp + L_lap + L_grad
    (+ L_tri when stage > 1).

    compute_dtype=jnp.bfloat16 runs the network forward/backward (and the
    temporal cross-feed) in bf16 — params are cast at entry (grads flow back
    to the caller's fp32 masters through the cast), while GT tensors and all
    loss arithmetic stay fp32 (network outputs are upcast before the loss).
    Beyond reference parity: the reference has no AMP.
    scale > 1 builds the width/depth-scaled dryrun variant (see STM.scale).
    """
    stm, fba, refinement = _models(stage, arch, scale, stm_norm)
    use_trimap_net = stage > 1

    if compute_dtype is not None:
        _c = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
        stm_vars, fba_vars = _c(stm_vars), _c(fba_vars)

    # OTVM_REMAT=1: rematerialize each frame's FBA forward in the backward
    # pass (jax.checkpoint).  The S-frame cross-feeding loop otherwise keeps
    # every frame's full-resolution FBA activations live simultaneously —
    # per-chip batch 4 at 320px OOMs a 16 GB v5e without this
    # (docs/BENCH_NOTES.md).  Off by default: at per-chip batch 1 the
    # recompute costs more than it saves.
    import os
    remat = os.environ.get("OTVM_REMAT", "0") == "1"
    ckpt = jax.checkpoint if remat else (lambda f: f)
    fba_call = ckpt(lambda v, x, im, t2: fba.apply(v, x, im, t2))
    if stm.hdim > 0:
        stm_memorize = ckpt(lambda sv, im, u, f, a, h: stm.apply(
            sv, im, u, f, method=STM.memorize, alpha=a, hidden=h))
    else:
        stm_memorize = ckpt(lambda sv, im, u, f: stm.apply(
            sv, im, u, f, method=STM.memorize))
    stm_segment = ckpt(lambda sv, im, ks, vs: stm.apply(
        sv, im, ks, vs, None, method=STM.segment))
    frame_loss = ckpt(lambda *a: L.fba_frame_loss(*a, include_lap=False))

    fg, bg, gt_alpha, tri = batch["fg"], batch["bg"], batch["alpha"], batch["tri"]
    B, S = fg.shape[:2]
    img = fg * gt_alpha + bg * (1.0 - gt_alpha)
    # `img` stays fp32 for the loss (composition targets); `img_c` feeds the
    # networks in the compute dtype.
    img_c = img.astype(compute_dtype) if compute_dtype is not None else img

    # trimask for the loss comes from the GT trimap (preprocess path,
    # models/alpha/model.py:55-64); clicks are not needed for the GT.
    gt_trimask = (L.argmax_small(tri) == 1).astype(jnp.float32)[..., None]

    preds_trimap = [None] * S
    preds_trimap_refine = [None] * S
    logit_trimap = [None] * (S - 1)
    logit_trimap_refine = [None] * S
    outs, routs, hids = [None] * S, [None] * S, [None] * S

    preds_trimap[0] = tri[:, 0].astype(img_c.dtype)
    preds_trimap_refine[0] = preds_trimap[0]
    mem_k, mem_v = [], []

    for t in range(S):
        feats8, _ = make_trimap_features(preds_trimap[t], exact_edt)
        x11 = jnp.concatenate([normalize_image(img_c[:, t]), feats8], axis=-1)
        out7, hid, rout7, rtri = fba_call(fba_vars, x11, img_c[:, t], feats8[..., -2:])
        outs[t], routs[t], hids[t] = out7, rout7, hid
        if refinement:
            logit_trimap_refine[t] = rtri
            if t > 0:
                preds_trimap_refine[t] = jax.nn.softmax(rtri, axis=-1)
        if t < S - 1:
            if not use_trimap_net:
                preds_trimap[t + 1] = tri[:, t + 1].astype(img_c.dtype)
            else:
                if refinement:
                    input_alpha = rout7[..., 0:1]
                    input_trimap = preds_trimap_refine[t]
                else:
                    input_alpha = out7[..., 0:1]
                    input_trimap = preds_trimap[t]
                if stm.hdim > 0:
                    k, v = stm_memorize(stm_vars, img_c[:, t],
                                        input_trimap[..., 1],
                                        input_trimap[..., 2],
                                        input_alpha[..., 0], hid)
                else:
                    k, v = stm_memorize(stm_vars, img_c[:, t],
                                        input_trimap[..., 1],
                                        input_trimap[..., 2])
                mem_k.append(k)
                mem_v.append(v)
                logit = stm_segment(stm_vars, img_c[:, t + 1],
                                    jnp.stack(mem_k, axis=1),
                                    jnp.stack(mem_v, axis=1))
                logit_trimap[t] = logit
                preds_trimap[t + 1] = jax.nn.softmax(logit, axis=-1)

    def seq_loss(preds):
        # loss arithmetic is always fp32 (network outputs upcast here).
        # include_lap=False: the Laplacian term is computed ONCE for the whole
        # sequence (both heads stacked) by lap_loss_diff7 below — the r5 fix
        # for the r4 trace's dominant cost (docs/perf_r4/train_trace_top_bf16.txt).
        terms = [frame_loss(preds[t].astype(jnp.float32), gt_trimask[:, t],
                            gt_alpha[:, t],
                            fg[:, t], bg[:, t], img[:, t]) for t in range(S)]
        L_ac = sum(x[0] for x in terms) / S
        L_gr = sum(x[1] for x in terms) / S
        alphas = jnp.stack([x[3] for x in terms], axis=1)
        comps = jnp.stack([x[4] for x in terms], axis=1)
        Fs = jnp.stack([x[5] for x in terms], axis=1)
        Bs = jnp.stack([x[6] for x in terms], axis=1)
        L_gr = L_gr + L.temporal_coherence_loss(alphas, Fs, Bs, gt_alpha, fg, bg)
        return L_ac, L_gr, alphas, comps, Fs, Bs

    def diff7(alphas, Fs, Bs):
        # [B,S,H,W,7] difference stack -> [B*S,H,W,7] for the fused pyramid
        d = jnp.concatenate([alphas - gt_alpha, Fs - fg, Bs - bg], axis=-1)
        return d.reshape((B * S,) + d.shape[2:])

    L1 = seq_loss(outs)
    if refinement:
        L2 = seq_loss(routs)
        L_alpha_comp, L_grad = L1[0] + L2[0], L1[1] + L2[1]
        # heads are SUMMED (models/alpha/model.py head weighting), so the
        # stacked 2*B*S diff normalizes by B*S
        lap_in = jnp.concatenate([diff7(L1[2], L1[4], L1[5]),
                                  diff7(L2[2], L2[4], L2[5])], axis=0)
        alphas, comps = L2[2], L2[3]
    else:
        L_alpha_comp, L_grad = L1[0], L1[1]
        lap_in = diff7(L1[2], L1[4], L1[5])
        alphas, comps = L1[2], L1[3]
    L_lap = ckpt(L.lap_loss_diff7)(lap_in, B * S)

    if use_trimap_net:
        gt_labels = L.argmax_small(tri[:, 1:])          # [B, S-1, H, W]
        lt = jnp.stack(logit_trimap, axis=1).astype(jnp.float32)
        loss_trimap = L.cross_entropy(lt, gt_labels)
        if refinement:
            gt_all = L.argmax_small(tri)
            ltr = jnp.stack(logit_trimap_refine, axis=1).astype(jnp.float32)
            loss_trimap = loss_trimap + L.cross_entropy(ltr, gt_all)
    else:
        loss_trimap = jnp.zeros(())

    total = L_alpha_comp + L_lap + L_grad
    if stage > 1:
        total = total + loss_trimap
    aux = dict(L_alpha_comp=L_alpha_comp, L_lap=L_lap, L_grad=L_grad,
               L_tri=loss_trimap, alphas=alphas, comps=comps)
    if use_trimap_net:
        aux["logit_trimap"] = jnp.stack(logit_trimap, axis=1)
        if refinement:
            aux["logit_trimap_refine"] = jnp.stack(logit_trimap_refine, axis=1)
    return total, aux


# ---------------------------------------------------------------------------
# stage-1 trimap training forward (train_s1_trimap.py)
# ---------------------------------------------------------------------------

def trimap_train_forward(stm_vars, batch: Dict[str, jnp.ndarray],
                         ignore_label: int = 255, compute_dtype=None,
                         stm_norm: str = "frozen_bn"):
    """== trimap FullModel._forward stage 1 (models/trimap/model.py:75-131).

    batch: img [B,S,H,W,3] in [0,1], tri [B,S,H,W,3] one-hot float.
    The reference's per-item python loop (b=1 only, model.py:87) is replaced
    by real batching.  Returns (loss, aux with stacked predictions).
    compute_dtype: see joint_train_forward (CE stays fp32)."""
    stm = STM(hdim=-1, norm=stm_norm)
    img, tri = batch["img"], batch["tri"]
    if compute_dtype is not None:
        stm_vars = jax.tree_util.tree_map(
            lambda x: x.astype(compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, stm_vars)
        img = img.astype(compute_dtype)
        tri = tri.astype(compute_dtype)
    B, S = img.shape[:2]

    Es = [tri[:, 0]] + [None] * (S - 1)
    logits_list = []
    mem_k, mem_v = [], []
    for t in range(1, S):
        k, v = stm.apply(stm_vars, img[:, t - 1], Es[t - 1][..., 1],
                         Es[t - 1][..., 2], method=STM.memorize)
        mem_k.append(k)
        mem_v.append(v)
        logit = stm.apply(stm_vars, img[:, t],
                          jnp.stack(mem_k, axis=1), jnp.stack(mem_v, axis=1),
                          None, method=STM.segment)
        logits_list.append(logit)
        Es[t] = jax.nn.softmax(logit, axis=-1)

    gt = L.argmax_small(tri)                       # [B, S, H, W]
    loss = sum(L.cross_entropy(logits_list[t - 1].astype(jnp.float32),
                               gt[:, t], ignore_label)
               for t in range(1, S)) / float(S - 1)
    preds = jnp.stack([Es[t] for t in range(S)], axis=1)
    return loss, dict(pred=preds)
