"""PyTorch .pth -> JAX params converters for the OTVM released checkpoints.

The reference ships 6 checkpoints consumed by its stage loader matrix
(train.py:90-121, eval.py:77-79):
    STM_weights.pth      bare STM, 'module.'-prefixed        (stage-1 trimap init)
    FBA.pth              bare FBA matting module             (stage-1 alpha init)
    s1_OTVM_trimap.pth   bare STM state_dict
    s1_OTVM_alpha.pth /  alpha FullModel.NET state_dict      ('encoder.*', ...)
    s2_OTVM_alpha.pth
    s3_OTVM.pth /        joint state_dict: 'NET.*' (alpha) +
    s4_OTVM.pth          'trimap.model.*' (STM)

Conversion = pure name mapping + layout transpose:
    conv weight  OIHW -> HWIO
    GN/BN weight/bias -> scale/bias params
    BN running_mean/var -> 'batch_stats' collection (FrozenBatchNorm)
Non-parameter buffers (IMG_MEAN/STD, LapLoss KERNEL, CE weights) are
regenerated in code and skipped here.

The maps are explicit tables (built programmatically per architecture) so a
missing/unexpected key is a hard error — the converter doubles as a schema
check, mirroring the reference's missing/unexpected-key logging
(train.py:95-117).
"""
from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

# map entries: torch_key -> (collection, jax_path_tuple, kind)
# kind: 'conv' (OIHW->HWIO), 'vec' (1-D copy)
MapT = Dict[str, Tuple[str, Tuple[str, ...], str]]


# ---------------------------------------------------------------------------
# table builders
# ---------------------------------------------------------------------------

def _conv(m: MapT, tk: str, path: Tuple[str, ...], bias: bool = False):
    m[tk + ".weight"] = ("params", path + ("kernel",), "conv")
    if bias:
        m[tk + ".bias"] = ("params", path + ("bias",), "vec")


def _linen_conv(m: MapT, tk: str, path: Tuple[str, ...], bias: bool = False):
    """my layers.Conv wraps nn.Conv under child name 'conv'."""
    _conv(m, tk, path + ("conv",), bias)


def _gn(m: MapT, tk: str, path: Tuple[str, ...]):
    m[tk + ".weight"] = ("params", path + ("gn", "scale"), "vec")
    m[tk + ".bias"] = ("params", path + ("gn", "bias"), "vec")


def _frozen_bn(m: MapT, tk: str, path: Tuple[str, ...]):
    m[tk + ".weight"] = ("params", path + ("scale",), "vec")
    m[tk + ".bias"] = ("params", path + ("bias",), "vec")
    m[tk + ".running_mean"] = ("batch_stats", path + ("mean",), "vec")
    m[tk + ".running_var"] = ("batch_stats", path + ("var",), "vec")
    # torch BN tracks num_batches_tracked; meaningless here
    m[tk + ".num_batches_tracked"] = ("skip", (), "vec")


def _bn_bottleneck(m: MapT, tk: str, path: Tuple[str, ...], downsample: bool):
    """torchvision Bottleneck (frozen BN) -> otvm_tpu.nn.resnet.Bottleneck."""
    for j in (1, 2, 3):
        _linen_conv(m, f"{tk}.conv{j}", path + (f"conv{j}",))
        _frozen_bn(m, f"{tk}.bn{j}", path + (f"bn{j}",))
    if downsample:
        _linen_conv(m, f"{tk}.downsample.0", path + ("downsample_conv",))
        _frozen_bn(m, f"{tk}.downsample.1", path + ("downsample_bn",))


def _gn_bottleneck(m: MapT, tk: str, path: Tuple[str, ...], downsample: bool):
    for j in (1, 2, 3):
        _conv(m, f"{tk}.conv{j}", path + (f"conv{j}",))       # WSConv: direct kernel
        _gn(m, f"{tk}.bn{j}", path + (f"bn{j}",))
    if downsample:
        _conv(m, f"{tk}.downsample.0", path + ("downsample_conv",))
        _gn(m, f"{tk}.downsample.1", path + ("downsample_bn",))


def _resnet50_trunk(m: MapT, tk: str, path: Tuple[str, ...],
                    layer_names=("res2", "res3", "res4"),
                    blocks=(3, 4, 6)):
    """torchvision conv1..layer3 with frozen BN (STM trunks).

    STM names the stages res2/res3/res4 (STM.py:49-51); torchvision-prefixed
    checkpoints (if fed directly) use layer1/2/3 — callers pass layer_names.
    """
    _linen_conv(m, f"{tk}.conv1", path + ("conv1",))
    _frozen_bn(m, f"{tk}.bn1", path + ("bn1",))
    for li, (lname, nb) in enumerate(zip(layer_names, blocks), start=1):
        for i in range(nb):
            _bn_bottleneck(m, f"{tk}.{lname}.{i}", path + (f"layer{li}", str(i)),
                           downsample=(i == 0))


def stm_map(hdim: int, torch_prefix: str = "") -> MapT:
    """STM(hdim) state_dict -> otvm_tpu.models.stm.STM variables."""
    m: MapT = {}
    p = torch_prefix
    _linen_conv(m, p + "Encoder_M.conv1_m", ("conv1_m",))
    _linen_conv(m, p + "Encoder_M.conv1_o", ("conv1_o",))
    if hdim > 0:
        _linen_conv(m, p + "Encoder_M.conv1_a", ("conv1_a",))
        _linen_conv(m, p + "Encoder_M.conv1_h", ("conv1_h",))
    _resnet50_trunk(m, p + "Encoder_M", ("Encoder_M",))
    _resnet50_trunk(m, p + "Encoder_Q", ("Encoder_Q",))
    for side in ("KV_M_r4", "KV_Q_r4"):
        _linen_conv(m, f"{p}{side}.Key", (side, "Key"), bias=True)
        _linen_conv(m, f"{p}{side}.Value", (side, "Value"), bias=True)
    # decoder
    d = ("Decoder",)
    _linen_conv(m, p + "Decoder.convFM", d + ("convFM",), bias=True)
    for rb in ("ResMM",):
        for c in ("conv1", "conv2"):
            _linen_conv(m, f"{p}Decoder.{rb}.{c}", d + (rb, c), bias=True)
    for rf in ("RF3", "RF2"):
        _linen_conv(m, f"{p}Decoder.{rf}.convFS", d + (rf, "convFS"), bias=True)
        for rb in ("ResFS", "ResMM"):
            for c in ("conv1", "conv2"):
                _linen_conv(m, f"{p}Decoder.{rf}.{rb}.{c}", d + (rf, rb, c), bias=True)
    _linen_conv(m, p + "Decoder.pred", d + ("pred",), bias=True)
    # normalization buffers regenerated in code
    for buf in ("Encoder_M.mean", "Encoder_M.std", "Encoder_Q.mean", "Encoder_Q.std"):
        m[p + buf] = ("skip", (), "vec")
    return m


def fba_map(refinement: bool, torch_prefix: str = "") -> MapT:
    """FBA MattingModule state_dict -> otvm_tpu.models.fba.FBA variables."""
    m: MapT = {}
    p = torch_prefix
    # encoder (ResnetDilated over resnet_GN_WS.l_resnet50)
    e = ("encoder",)
    _conv(m, p + "encoder.conv1", e + ("conv1",))
    _gn(m, p + "encoder.bn1", e + ("bn1",))
    for li, nb in zip((1, 2, 3, 4), (3, 4, 6, 3)):
        for i in range(nb):
            _gn_bottleneck(m, f"{p}encoder.layer{li}.{i}",
                           e + (f"layer{li}", str(i)), downsample=(i == 0))
    # decoder
    d = ("decoder",)
    for i in range(4):
        _conv(m, f"{p}decoder.ppm.{i}.1", d + (f"ppm{i}", "conv"), bias=True)
        _gn(m, f"{p}decoder.ppm.{i}.2", d + (f"ppm{i}", "norm"))
    _conv(m, p + "decoder.conv_up1.0", d + ("up1_0", "conv"), bias=True)
    _gn(m, p + "decoder.conv_up1.1", d + ("up1_0", "norm"))
    _conv(m, p + "decoder.conv_up1.3", d + ("up1_1", "conv"), bias=True)
    _gn(m, p + "decoder.conv_up1.4", d + ("up1_1", "norm"))
    _conv(m, p + "decoder.conv_up2.0", d + ("up2", "conv"), bias=True)
    _gn(m, p + "decoder.conv_up2.1", d + ("up2", "norm"))
    _conv(m, p + "decoder.conv_up3.0", d + ("up3", "conv"), bias=True)
    _gn(m, p + "decoder.conv_up3.1", d + ("up3", "norm"))
    _linen_conv(m, p + "decoder.conv_up4.0", d + ("up4_0",), bias=True)
    _linen_conv(m, p + "decoder.conv_up4.2", d + ("up4_1",), bias=True)
    _linen_conv(m, p + "decoder.conv_up4.4", d + ("up4_2",), bias=True)
    if refinement:
        r = ("refine",)
        _conv(m, p + "refine.conv1.0", r + ("conv1", "conv"), bias=True)
        _gn(m, p + "refine.conv1.1", r + ("conv1", "norm"))
        for lb in ("layer1", "layer2"):
            for c in ("conv1", "conv2"):
                _conv(m, f"{p}refine.{lb}.{c}", r + (lb, c))
            for b in ("bn1", "bn2"):
                _gn(m, f"{p}refine.{lb}.{b}", r + (lb, b))
        _linen_conv(m, p + "refine.pred.0", r + ("pred_0",), bias=True)
        _linen_conv(m, p + "refine.pred.2", r + ("pred_1",), bias=True)
        _linen_conv(m, p + "refine.pred.4", r + ("pred_2",), bias=True)
    return m


# ---------------------------------------------------------------------------
# conversion driver
# ---------------------------------------------------------------------------

def _to_np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _insert(tree: dict, path: Tuple[str, ...], value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def apply_map(state_dict: Mapping[str, "np.ndarray"], table: MapT,
              strict: bool = True) -> Dict[str, dict]:
    """Translate a torch state dict into {'params': ..., 'batch_stats': ...}."""
    out: Dict[str, dict] = {"params": {}, "batch_stats": {}}
    used = set()
    for tk, (coll, path, kind) in table.items():
        if tk not in state_dict:
            if coll == "skip":
                continue
            if strict:
                raise KeyError(f"checkpoint missing key: {tk}")
            continue
        used.add(tk)
        if coll == "skip":
            continue
        w = _to_np(state_dict[tk]).astype(np.float32)
        if kind == "conv":
            w = np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
        _insert(out[coll], path, w)
    if strict:
        extra = set(state_dict) - used
        if extra:
            raise KeyError(f"unexpected checkpoint keys ({len(extra)}): "
                           f"{sorted(extra)[:8]} ...")
    if not out["batch_stats"]:
        out.pop("batch_stats")
    return out


def load_torch_state_dict(path: str, strip_module: bool = True) -> Dict[str, "np.ndarray"]:
    """torch.load a checkpoint, unwrap {'state_dict': ...} and 'module.'."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd and not any(
            hasattr(v, "shape") for v in sd.values()):
        sd = sd["state_dict"]
    if strip_module:
        sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
    return sd


def convert_stm(state_dict, hdim: int, torch_prefix: str = "", strict: bool = True):
    return apply_map(state_dict, stm_map(hdim, torch_prefix), strict)


def convert_fba(state_dict, refinement: bool, torch_prefix: str = "", strict: bool = True):
    return apply_map(state_dict, fba_map(refinement, torch_prefix), strict)


def convert_joint(state_dict, stage: int = 4, strict: bool = True):
    """s3/s4 joint checkpoints: NET.* (alpha) + trimap.model.* (STM hdim=16).

    Returns {'alpha': vars, 'trimap': vars}.  Loss/normalization buffers
    (IMG_MEAN, LAPLOSS.KERNEL, LOSS_TRIMAP.weight, trimap.IMG_*) are skipped.
    """
    refinement = stage > 2
    hdim = 16 if stage > 2 else -1
    table: MapT = {}
    table.update(fba_map(refinement, "NET."))
    table.update(stm_map(hdim, "trimap.model."))
    for buf in ("IMG_MEAN", "IMG_STD", "LAPLOSS.KERNEL", "LOSS_TRIMAP.weight",
                "trimap.IMG_MEAN", "trimap.IMG_STD", "trimap.LOSS.weight"):
        table[buf] = ("skip", (), "vec")
    merged = apply_map(state_dict, table, strict)

    def split(tree, top):
        a, t = {}, {}
        for k, v in tree.items():
            (a if k in ("encoder", "decoder", "refine") else t)[k] = v
        return a, t

    alpha_p, trimap_p = split(merged["params"], None)
    out = {"alpha": {"params": alpha_p}, "trimap": {"params": trimap_p}}
    if "batch_stats" in merged:  # BN stats only exist in the STM trunks
        out["trimap"]["batch_stats"] = merged["batch_stats"]
    return out
