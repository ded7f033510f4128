"""Streaming eval driver — the reference eval.py re-designed for TPU.

Protocol parity (eval.py:117-242):
  * per-video streaming with the jitted `eval_frame_step` (one compile per
    resolution bucket — the bank is fixed-shape, flags are traced);
  * memory policy flags: memorize every MEMORY_SKIP_FRAME-th frame, bank
    capped at MEMORY_MAX_NUM; >1100 px inputs halve the bank and double the
    skip (eval.py:178-190);
  * frames padded to /32 (models/alpha/model.py:408-410), trimap bg-padded;
  * trimap widths narrow/medium/wide -> dilation radius 5/12/20;
  * alpha PNGs written per frame; quality metrics via eval.metrics.

Re-design: decode + trimap synthesis + padding happen host-side while the
previous frame computes on-device (simple software pipelining: we enqueue
the device step, then prepare the next frame before blocking on results).
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TRIMAP_WIDTH_KERNELS
from ..data.trimap import trimap_from_alpha, trimap_from_png
from ..models.otvm import (alpha_predict, eval_chunk_step, eval_frame_step,
                           make_eval_bank, trimap_eval_step)
from ..nn.ops import divide_pad_amounts


@dataclasses.dataclass
class EvalProtocol:
    memory_max_num: int = 5
    memory_skip_frame: int = 10
    trimap_width: str = "medium"
    stage: int = 4
    arch: str = "resnet50_GN_WS"     # FBA trunk of the checkpoint being run
    large_input_edge: int = 1100     # eval.py:184
    chunk: int = 1                   # frames per device dispatch (lax.scan);
                                     # >1 amortizes dispatch for offline
                                     # streams, identical per-frame protocol
    scale: int = 1                   # width/depth divisor of the model being
                                     # served (1 = real model; >1 only for
                                     # scaled-dryrun/CPU tests, chunk==1 path)
    dtype: str = "fp32"              # "bf16": serve the network + memory bank
                                     # in bfloat16 (the production/bench
                                     # serving precision — oracle parity is
                                     # measured in fp32, the protocol is
                                     # unchanged).  Outputs are returned fp32.
    wire_u8_out: bool = False        # quantize alpha/trimap to uint8 ON
                                     # DEVICE before the per-frame fetch
                                     # (8.0/4.0x fewer D2H bytes).  Exactly
                                     # the reference's output quantization —
                                     # it writes alpha as uint8 PNGs before
                                     # metrics read them (eval.py:136-144) —
                                     # so this is the serving default-safe
                                     # mode; oracle-parity runs keep f32 to
                                     # compare pre-quantization numerics.
    pad_multiple: int = 32           # pad H,W up to this multiple.  32 is
                                     # the reference protocol
                                     # (models/alpha/model.py:408-410); on a
                                     # mixed-resolution set (VM108 has
                                     # heterogeneous per-video sizes,
                                     # dataset.py:880-957) raise to 64/128
                                     # to BOUND the number of resolution
                                     # buckets (= jit compiles): each unique
                                     # padded (H,W) compiles once.  Outputs
                                     # are unpadded back, so only conv
                                     # border context changes (zero-pad /
                                     # bg-pad region grows).

    def flags(self, n_frames: int, height: int, width: int):
        """Per-frame (first, memorize, last) + effective bank size."""
        skip = self.memory_skip_frame
        max_num = self.memory_max_num
        large = min(height, width) > self.large_input_edge
        if large:
            skip *= 2
            max_num = int(max_num / 2)
        out = []
        for i in range(n_frames):
            memorize = (i % skip == 0) if skip > 2 else False
            out.append((i == 0, memorize, i == n_frames - 1))
        return out, max_num, large


def _wire_u8(frame: np.ndarray) -> np.ndarray:
    """Device-boundary recompression: decoded video frames are uint8, so
    ship them as uint8 (the /255 runs inside the jit, exactly — see
    _eval_frame_core).  On tunneled hosts (4-6 MB/s H2D) this is 4x less
    wire traffic per streamed frame."""
    return np.rint(frame * 255.0).astype(np.uint8)


def _pad_frame(frame: np.ndarray, tri: Optional[np.ndarray], multiple: int = 32):
    h, w = frame.shape[:2]
    lw, uw, lh, uh = divide_pad_amounts(h, w, multiple)
    pad = ((lh, uh), (lw, uw))
    f = np.pad(frame, (*pad, (0, 0)))
    t = None
    if tri is not None:
        t = np.stack([
            np.pad(tri[..., 0], pad, constant_values=1.0),   # bg-pad
            np.pad(tri[..., 1], pad),
            np.pad(tri[..., 2], pad),
        ], axis=-1)
    return f, t, (lw, uw, lh, uh)


def _unpad(x: np.ndarray, pad):
    lw, uw, lh, uh = pad
    h, w = x.shape[:2]
    return x[lh:h - uh if uh else h, lw:w - uw if uw else w]


class StreamingEvaluator:
    """Holds converted params; call `run_video` per clip."""

    def __init__(self, trimap_vars, alpha_vars, protocol: EvalProtocol):
        if protocol.dtype == "bf16":
            cast = lambda t: jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, t)
            trimap_vars = cast(trimap_vars) if trimap_vars else trimap_vars
            alpha_vars = cast(alpha_vars)
        self.trimap_vars = trimap_vars
        self.alpha_vars = alpha_vars
        self.protocol = protocol
        self.bank_dtype = (jnp.bfloat16 if protocol.dtype == "bf16"
                           else jnp.float32)
        # GN-trunk checkpoints (from-scratch recipe) carry no BN stats —
        # that absence selects the matching model variant automatically.
        self.stm_norm = ("frozen_bn" if (trimap_vars or {}).get("batch_stats")
                         else "gn")

    def run_video(self, frames01: Sequence[np.ndarray],
                  first_trimap3: np.ndarray,
                  out_dir: Optional[str] = None,
                  filenames: Optional[Sequence[str]] = None,
                  viz_dir: Optional[str] = None,
                  gt_trimaps: Optional[Sequence[np.ndarray]] = None
                  ) -> Tuple[List[np.ndarray], List[np.ndarray], float]:
        """frames01: RGB [H,W,3] float in [0,1]; first_trimap3 [H,W,3]
        one-hot.  Returns (alphas, trimaps, fps).

        protocol.stage <= 2 routes to the trimap-GIVEN path (no trimap net
        in those checkpoints): per-frame `alpha_predict` with `gt_trimaps`
        (reference stage-1/2 eval feeds the GT trimap every frame)."""
        if self.protocol.stage <= 2:
            return self._run_given_trimaps(frames01, first_trimap3, gt_trimaps,
                                           out_dir, filenames, viz_dir)
        n = len(frames01)
        h, w = frames01[0].shape[:2]
        flags, max_num, _ = self.protocol.flags(n, h, w)

        f0, t0, pad = _pad_frame(frames01[0], first_trimap3,
                                 self.protocol.pad_multiple)
        ph, pw = f0.shape[:2]
        bank = make_eval_bank(1, ph, pw, max_num, dtype=self.bank_dtype,
                              scale=self.protocol.scale)
        first_tri_dev = jnp.asarray(t0[None], self.bank_dtype)

        alphas, trimaps = [], []
        t_start = time.perf_counter()

        if self.protocol.chunk > 1:
            assert self.protocol.scale == 1, "chunked path serves the real model"
            bank = self._run_chunked(bank, frames01, first_tri_dev, flags,
                                     max_num, pad, f0, alphas, trimaps)
        else:
            pending = None  # (EvalOutput, pad) — overlap host prep with device
            _T, _F = jnp.asarray(True), jnp.asarray(False)  # staged once: the
            # tunnel pays ~1 RPC per device_put, so per-frame flag uploads cost
            # real latency; reusing two resident scalars makes flags free.
            for i in range(n):
                f, _, pad = (_pad_frame(frames01[i], None,
                                        self.protocol.pad_multiple)
                             if i else (f0, t0, pad))
                first, memorize, last = flags[i]
                out = eval_frame_step(
                    self.trimap_vars, self.alpha_vars, bank,
                    jnp.asarray(_wire_u8(f)[None]), first_tri_dev,
                    (_T if first else _F), (_T if memorize else _F),
                    (_T if last else _F),
                    stage=self.protocol.stage, max_memory_num=max_num,
                    arch=self.protocol.arch, scale=self.protocol.scale,
                    stm_norm=self.stm_norm,
                    wire_u8_out=self.protocol.wire_u8_out)
                bank = out.bank
                if pending is not None:
                    self._collect(pending, alphas, trimaps)
                pending = (self._prefetch(out), pad)
            self._collect(pending, alphas, trimaps)
        fps = n / (time.perf_counter() - t_start)

        if out_dir is not None:
            import cv2
            os.makedirs(out_dir, exist_ok=True)
            for i, a in enumerate(alphas):
                name = (os.path.splitext(filenames[i])[0] + ".png"
                        if filenames else f"{i:05d}.png")
                cv2.imwrite(os.path.join(out_dir, name),
                            (np.clip(a, 0, 1) * 255).astype(np.uint8))
        if viz_dir is not None:
            write_viz(viz_dir, frames01, trimaps, alphas)
        return alphas, trimaps, fps

    @staticmethod
    def _prefetch(out):
        """Start the device->host copy of this dispatch's outputs NOW, so
        the blocking np.asarray in _collect (one frame later) reads an
        already-landed host buffer instead of paying a full D2H round trip
        per frame.  On the tunneled chip each synchronous fetch is ~tens of
        ms of pure latency; measured on the 4-stream serving path this was
        the difference between 6.2 and >40 fps aggregate (docs/BENCH_NOTES).
        No-op on backends whose arrays lack copy_to_host_async (CPU)."""
        for a in (out.alpha, out.trimap):
            fn = getattr(a, "copy_to_host_async", None)
            if fn is not None:
                fn()
        return out

    @staticmethod
    def _collect(pending, alphas, trimaps):
        out, pad = pending
        # fetch the WHOLE arrays (prefetched above), slice in numpy: a
        # device-side out.alpha[0,:,:,0] would be one more dispatch+fetch
        a = np.asarray(out.alpha)[0, :, :, 0]
        t = np.asarray(out.trimap)[0]
        if a.dtype == np.uint8:          # wire_u8_out mode: alpha /255,
            a = a.astype(np.float32) / 255.0   # trimap label -> one-hot
            t = np.eye(3, dtype=np.float32)[t]
        alphas.append(_unpad(a.astype(np.float32, copy=False), pad))
        trimaps.append(_unpad(t.astype(np.float32, copy=False), pad))

    def _run_chunked(self, bank, frames01, first_tri_dev, flags, max_num,
                     pad, f0, alphas, trimaps):
        """Dispatch `chunk` frames per device call (eval_chunk_step);
        the tail chunk is padded with repeats of the last frame under
        last=True flags — last_frame is the only flag that genuinely skips
        the bank update in _eval_frame_core (memorize=False alone still
        takes the rolling-replace path), so the returned bank is unchanged
        by padding and safe to reuse mid-stream.  Padded outputs dropped."""
        n = len(frames01)
        C = self.protocol.chunk
        for lo in range(0, n, C):
            hi = min(lo + C, n)
            fs = [f0 if i == 0 else
                  _pad_frame(frames01[i], None, self.protocol.pad_multiple)[0]
                  for i in range(lo, hi)]
            fl = list(flags[lo:hi])
            while len(fs) < C:                      # tail padding
                fs.append(fs[-1])
                fl.append((False, False, True))
            frames_dev = jnp.asarray(_wire_u8(np.stack(fs))[:, None])  # [C,1,H,W,3] u8
            firsts, mems, lasts = (jnp.asarray([f[k] for f in fl])
                                   for k in range(3))
            bank, a, t = eval_chunk_step(
                self.trimap_vars, self.alpha_vars, bank,
                frames_dev, first_tri_dev, firsts, mems, lasts,
                stage=self.protocol.stage, max_memory_num=max_num,
                arch=self.protocol.arch, stm_norm=self.stm_norm)
            a, t = np.asarray(a), np.asarray(t)
            for j in range(hi - lo):
                alphas.append(_unpad(a[j, 0, :, :, 0], pad))
                trimaps.append(_unpad(t[j, 0], pad))
        return bank

    def _run_given_trimaps(self, frames01, first_trimap3, gt_trimaps,
                           out_dir, filenames, viz_dir):
        """Stage-1/2 eval: alpha from a GIVEN per-frame trimap
        (models/alpha/model.py:419,456-457 with trimap net bypassed;
        BASELINE config[0]).  Without per-frame trimaps only frame 0 (whose
        trimap we have) is evaluated."""
        tris = list(gt_trimaps) if gt_trimaps is not None else [first_trimap3]
        n = min(len(frames01), len(tris))
        alphas, trimaps = [], []
        t_start = time.perf_counter()
        for i in range(n):
            f, t, pad = _pad_frame(frames01[i], tris[i],
                                   self.protocol.pad_multiple)
            alpha, _ = alpha_predict(self.alpha_vars,
                                     jnp.asarray(_wire_u8(f)[None]),
                                     jnp.asarray(t[None]),
                                     stage=self.protocol.stage,
                                     arch=self.protocol.arch)
            alphas.append(_unpad(np.asarray(alpha)[0, :, :, 0], pad))
            trimaps.append(tris[i])
        fps = n / (time.perf_counter() - t_start)
        if out_dir is not None:
            import cv2
            os.makedirs(out_dir, exist_ok=True)
            for i, a in enumerate(alphas):
                name = (os.path.splitext(filenames[i])[0] + ".png"
                        if filenames else f"{i:05d}.png")
                cv2.imwrite(os.path.join(out_dir, name),
                            (np.clip(a, 0, 1) * 255).astype(np.uint8))
        if viz_dir is not None:
            write_viz(viz_dir, frames01[:n], trimaps, alphas)
        return alphas, trimaps, fps


class MultiStreamEvaluator(StreamingEvaluator):
    """N concurrent video streams on ONE chip: round-robin B=1 dispatches
    through the single compiled `eval_frame_step` executable, one memory
    bank per stream.

    Why not batch the streams (B=N)?  Measured on-chip (docs/BENCH_NOTES.md,
    docs/perf_r4/b4_serialize.json): XLA picks worse conv tilings with a
    batch dim present — B=4 inflates per-stream HBM bytes 1.6x, and since
    the step runs at ~90% of the HBM roofline, one B=4 dispatch aggregates
    28.5 fps while 4 round-robin B=1 dispatches aggregate 53.9 fps (1.9x).
    Round-robin reuses the B=1 executable and its good tilings.

    Each stream carries its OWN MemoryBank pytree (keys/values/count), so
    the bank's single scalar slot-count is per-stream by construction and
    the eval protocol (memorize cadence, keep-slot-0 eviction, large-input
    halving — /root/reference/eval.py:157-190) applies to each stream
    independently, exactly as the reference's serial per-video loop does.
    Streams may differ in length; different resolutions each compile once
    (same bucketing as single-stream).  Multi-chip serving instead puts one
    stream per chip over the data mesh (__graft_entry__.dryrun_multichip_eval).
    """

    def run_videos(self, videos: Sequence[Dict],
                   out_root: Optional[str] = None,
                   viz_root: Optional[str] = None):
        """videos: dicts with keys `frames` (list of [H,W,3] float RGB in
        [0,1]), `first_trimap` ([H,W,3] one-hot), optional `seq_name`,
        `filenames`.  Returns (results, aggregate_fps) where results[i] =
        (alphas, trimaps) for stream i and aggregate_fps counts ALL frames
        over the wall-clock of the interleaved run."""
        assert self.protocol.stage > 2, "multi-stream serving is the joint path"
        sessions = []
        for v in videos:
            frames = v["frames"]
            n = len(frames)
            h, w = frames[0].shape[:2]
            flags, max_num, _ = self.protocol.flags(n, h, w)
            f0, t0, pad = _pad_frame(frames[0], v["first_trimap"],
                                     self.protocol.pad_multiple)
            ph, pw = f0.shape[:2]
            sessions.append(dict(
                frames=frames, flags=flags, max_num=max_num, pad=pad, f0=f0,
                bank=make_eval_bank(1, ph, pw, max_num, dtype=self.bank_dtype,
                                    scale=self.protocol.scale),
                first_tri=jnp.asarray(t0[None], self.bank_dtype),
                alphas=[], trimaps=[], pending=None,
                seq_name=v.get("seq_name"), filenames=v.get("filenames")))

        _T, _F = jnp.asarray(True), jnp.asarray(False)  # staged once
        total_frames = sum(len(s["frames"]) for s in sessions)
        t_start = time.perf_counter()
        step = 0
        while any(step < len(s["frames"]) for s in sessions):
            for s in sessions:
                if step >= len(s["frames"]):
                    continue
                f = (s["f0"] if step == 0 else
                     _pad_frame(s["frames"][step], None,
                                self.protocol.pad_multiple)[0])
                first, memorize, last = s["flags"][step]
                out = eval_frame_step(
                    self.trimap_vars, self.alpha_vars, s["bank"],
                    jnp.asarray(_wire_u8(f)[None]), s["first_tri"],
                    (_T if first else _F), (_T if memorize else _F),
                    (_T if last else _F),
                    stage=self.protocol.stage, max_memory_num=s["max_num"],
                    arch=self.protocol.arch, scale=self.protocol.scale,
                    stm_norm=self.stm_norm,
                    wire_u8_out=self.protocol.wire_u8_out)
                s["bank"] = out.bank
                # collect the PREVIOUS dispatch's outputs while this one
                # computes (same software pipelining as run_video); the
                # async prefetch means the copy lands during the other
                # streams' dispatches, a full round before it is read
                if s["pending"] is not None:
                    self._collect(s["pending"], s["alphas"], s["trimaps"])
                s["pending"] = (self._prefetch(out), s["pad"])
            step += 1
        for s in sessions:
            if s["pending"] is not None:
                self._collect(s["pending"], s["alphas"], s["trimaps"])
        agg_fps = total_frames / (time.perf_counter() - t_start)

        results = []
        for k, s in enumerate(sessions):
            if out_root is not None:
                import cv2
                d = os.path.join(out_root, s["seq_name"] or f"stream{k}")
                os.makedirs(d, exist_ok=True)
                for i, a in enumerate(s["alphas"]):
                    name = (os.path.splitext(s["filenames"][i])[0] + ".png"
                            if s["filenames"] else f"{i:05d}.png")
                    cv2.imwrite(os.path.join(d, name),
                                (np.clip(a, 0, 1) * 255).astype(np.uint8))
            if viz_root is not None:
                write_viz(os.path.join(viz_root, s["seq_name"] or f"stream{k}"),
                          s["frames"], s["trimaps"], s["alphas"])
            results.append((s["alphas"], s["trimaps"]))
        return results, agg_fps


class TrimapEvaluator:
    """Trimap-propagation-only streaming eval (s1_OTVM_trimap checkpoints;
    trimap FullModel_eval, models/trimap/model.py:173-281)."""

    def __init__(self, stm_vars, protocol: EvalProtocol):
        self.stm_vars = stm_vars
        self.protocol = protocol
        self.stm_norm = ("frozen_bn" if (stm_vars or {}).get("batch_stats")
                         else "gn")

    def run_video(self, frames01: Sequence[np.ndarray],
                  first_trimap3: np.ndarray,
                  out_dir: Optional[str] = None,
                  filenames: Optional[Sequence[str]] = None
                  ) -> Tuple[List[np.ndarray], float]:
        n = len(frames01)
        h, w = frames01[0].shape[:2]
        flags, max_num, _ = self.protocol.flags(n, h, w)
        f0, t0, pad = _pad_frame(frames01[0], first_trimap3,
                                 self.protocol.pad_multiple)
        ph, pw = f0.shape[:2]
        bank = make_eval_bank(1, ph, pw, max_num)
        first_tri_dev = jnp.asarray(t0[None])
        trimaps = []
        t_start = time.perf_counter()
        _T, _F = jnp.asarray(True), jnp.asarray(False)  # staged once (see above)
        for i in range(n):
            f, _, pad = (_pad_frame(frames01[i], None,
                                    self.protocol.pad_multiple)
                         if i else (f0, t0, pad))
            first, memorize, _ = flags[i]
            bank, pred = trimap_eval_step(
                self.stm_vars, bank, jnp.asarray(f[None]), first_tri_dev,
                (_T if first else _F), (_T if memorize else _F),
                max_memory_num=max_num, stm_norm=self.stm_norm)
            trimaps.append(_unpad(np.asarray(pred)[0], pad))
        fps = n / (time.perf_counter() - t_start)
        if out_dir is not None:
            import cv2
            os.makedirs(out_dir, exist_ok=True)
            for i, t in enumerate(trimaps):
                name = (os.path.splitext(filenames[i])[0] + ".png"
                        if filenames else f"{i:05d}.png")
                lbl = np.argmax(t, axis=-1).astype(np.uint8) * 127
                cv2.imwrite(os.path.join(out_dir, name), lbl)
        return trimaps, fps


def write_viz(viz_dir: str, frames01, trimaps, alphas, fps: int = 10) -> None:
    """Per-frame [image | trimap | alpha | green-screen composite] strips +
    an mp4 if ffmpeg exists (eval.py:96-115, 201-242 viz path)."""
    import cv2

    os.makedirs(viz_dir, exist_ok=True)
    for i, (f, t, a) in enumerate(zip(frames01, trimaps, alphas)):
        a3 = np.repeat(a[..., None], 3, axis=-1)
        green = np.zeros_like(f)
        green[..., 1] = 1.0
        comp = f * a3 + green * (1 - a3)
        strip = np.concatenate([f, t, a3, comp], axis=1)
        cv2.imwrite(os.path.join(viz_dir, f"f{i:05d}.jpg"),
                    (np.clip(strip[..., ::-1], 0, 1) * 255).astype(np.uint8))
    import shutil
    import subprocess
    if shutil.which("ffmpeg"):
        subprocess.run(
            ["ffmpeg", "-framerate", str(fps), "-i",
             os.path.join(viz_dir, "f%05d.jpg"),
             os.path.join(viz_dir, "viz.mp4"), "-nostats", "-loglevel", "0", "-y"],
            check=False)


def frame_window_indices(idx: int, num_frames: int, total: int) -> np.ndarray:
    """EvalDataset num_frames>1 window mode (dataset.py:922-957): a centered,
    edge-clipped window of frame indices around idx (exact arange+0.5
    truncation semantics of the reference).  Unused by the shipped eval
    protocol (eval.py constructs EvalDataset with the default num_frames=1)
    but part of the dataset API surface."""
    fi = (np.arange(idx - num_frames / 2, idx + num_frames / 2, 1.0)
          + 0.5).astype(np.int32)
    return np.clip(fi, 0, total - 1)


def load_frame_window(frames: Sequence[np.ndarray], idx: int, num_frames: int
                      ) -> Tuple[np.ndarray, int]:
    """Stack the centered window [num_frames, H, W, C] and return it with
    the center index (the reference keys the output filename on the center
    frame, dataset.py:956)."""
    wi = frame_window_indices(idx, num_frames, len(frames))
    return np.stack([frames[i] for i in wi]), int(wi[num_frames // 2])


# ---------------------------------------------------------------------------
# video sources (demo + VM108 layouts, dataset.py:959-1070)
# ---------------------------------------------------------------------------

def iter_demo_videos(data_root: str) -> Iterator[Dict]:
    """demo layout: <root>/<seq>/frames/*.jpg + <root>/<seq>/trimap/*.png;
    only the first frame needs a trimap (Demo_Test, dataset.py:1019-1070)."""
    import cv2

    for seq in sorted(os.listdir(data_root)):
        fdir = os.path.join(data_root, seq, "frames")
        tdir = os.path.join(data_root, seq, "trimap")
        if not os.path.isdir(fdir):
            continue
        names = sorted(os.listdir(fdir))
        frames = []
        for nm in names:
            bgr = cv2.imread(os.path.join(fdir, nm), cv2.IMREAD_COLOR)
            frames.append(bgr[..., ::-1].astype(np.float32) / 255.0)
        tri_name = os.path.splitext(names[0])[0] + ".png"
        tri_img = cv2.imread(os.path.join(tdir, tri_name), cv2.IMREAD_UNCHANGED)
        tri = trimap_from_png(tri_img)
        yield dict(seq_name=seq, frames=frames, first_trimap=tri,
                   filenames=names, gt_alpha=None)


def iter_vm108_videos(data_root: str, mode: str = "val",
                      dilate_radius: int = 12) -> Iterator[Dict]:
    """VideoMatting108 layout (VideoMatting108_Test, dataset.py:959-1017):
    FG_done/<seq>/*.png with alpha in the 4th channel, BG_done2 via
    frame_corr.json; GT trimap synthesized from alpha with a fixed radius."""
    import json

    import cv2

    root = os.path.join(data_root, "VideoMatting108")
    with open(os.path.join(root, "frame_corr.json")) as f:
        frame_corr = json.load(f)
    with open(os.path.join(root, f"{mode}_videos.txt")) as f:
        seqs = [v.strip() for v in f if v.strip()]

    for seq in seqs:
        fns = [k for k in sorted(frame_corr.keys()) if os.path.dirname(k) == seq]
        frames, gt_alphas = [], []
        for fn in fns:
            fgp = os.path.join(root, "FG_done", fn)
            raw = cv2.imread(fgp, cv2.IMREAD_UNCHANGED)
            fg = raw[..., :3].astype(np.float32)
            a = raw[..., 3:4].astype(np.float32) / 255.0
            bgp = os.path.join(root, "BG_done2", frame_corr[fn])
            if not os.path.exists(bgp):
                bgp = os.path.splitext(bgp)[0] + ".png"
            bg = cv2.imread(bgp, cv2.IMREAD_COLOR).astype(np.float32)
            comp = (fg * a + bg * (1 - a))[..., ::-1] / 255.0  # BGR->RGB, [0,1]
            frames.append(comp.astype(np.float32))
            gt_alphas.append(a[..., 0])
        tri = trimap_from_alpha(gt_alphas[0], dilate_radius)
        yield dict(seq_name=seq, frames=frames, first_trimap=tri,
                   filenames=[os.path.basename(f) for f in fns],
                   gt_alpha=gt_alphas, dilate_radius=dilate_radius)


def _score_vm108_video(vid: Dict, alphas, radius: int,
                       totals: Dict[str, float]) -> None:
    """Accumulate the 7 VM108 metrics for one clip into `totals` (the
    unknown-region trimask protocol, utils/tmp/metric.py:114-119)."""
    from .metrics import video_metrics

    pred = np.stack(alphas) * 255.0
    gt = np.stack(vid["gt_alpha"]) * 255.0
    mask = np.stack([trimap_from_alpha(a, radius)[..., 1]
                     for a in vid["gt_alpha"]]) * 128.0
    m = video_metrics(pred, gt, mask)
    for k, v in m.items():
        totals[k] = totals.get(k, 0.0) + v


def evaluate_vm108(evaluator: StreamingEvaluator, data_root: str,
                   out_dir: Optional[str] = None, mode: str = "val",
                   max_videos: Optional[int] = None,
                   streams: int = 1) -> Dict[str, float]:
    """Full VM108 protocol: run every clip, score SAD/MSE/... against GT
    alpha with the trimask from the per-frame GT trimap (metric masks are
    the unknown regions, utils/tmp/metric.py:114-119).

    streams > 1 serves clips in groups of `streams` through a
    MultiStreamEvaluator (round-robin B=1, per-stream banks) — identical
    per-clip outputs (pinned by tests/test_multistream.py), higher
    aggregate throughput on one chip; `fps` is then the mean AGGREGATE
    fps over groups (all frames in a group / its wall-clock)."""
    radius = TRIMAP_WIDTH_KERNELS[evaluator.protocol.trimap_width]
    totals: Dict[str, float] = {}
    count = 0
    fps_all = []
    if streams > 1:
        assert isinstance(evaluator, MultiStreamEvaluator), \
            "streams > 1 needs a MultiStreamEvaluator"
        group: list = []

        def _flush():
            results, agg_fps = evaluator.run_videos(group, out_root=out_dir)
            fps_all.append(agg_fps)
            for vid, (alphas, _) in zip(group, results):
                _score_vm108_video(vid, alphas, radius, totals)
            group.clear()

        for vid in iter_vm108_videos(data_root, mode, radius):
            group.append(vid)
            count += 1
            if len(group) == streams:
                _flush()
            if max_videos and count >= max_videos:
                break
        if group:
            _flush()
    else:
        for vid in iter_vm108_videos(data_root, mode, radius):
            gt_tris = None
            if evaluator.protocol.stage <= 2:   # trimap-given protocol
                gt_tris = [trimap_from_alpha(a, radius)
                           for a in vid["gt_alpha"]]
            alphas, _, fps = evaluator.run_video(
                vid["frames"], vid["first_trimap"],
                out_dir=(os.path.join(out_dir, vid["seq_name"])
                         if out_dir else None),
                filenames=vid["filenames"], gt_trimaps=gt_tris)
            fps_all.append(fps)
            _score_vm108_video(vid, alphas, radius, totals)
            count += 1
            if max_videos and count >= max_videos:
                break
    out = {k: v / max(count, 1) for k, v in totals.items()}
    out["fps"] = float(np.mean(fps_all)) if fps_all else 0.0
    out["videos"] = count
    return out


def evaluate_vm108_trimap(evaluator: TrimapEvaluator, data_root: str,
                          out_dir: Optional[str] = None, mode: str = "val",
                          max_videos: Optional[int] = None) -> Dict[str, float]:
    """Trimap-propagation quality: mean IoU of predicted vs GT trimaps
    (the s1-trimap metric, train_s1_trimap.py:287-303)."""
    from .metrics import trimap_iou

    radius = TRIMAP_WIDTH_KERNELS[evaluator.protocol.trimap_width]
    ious, fps_all = [], []
    count = 0
    for vid in iter_vm108_videos(data_root, mode, radius):
        trimaps, fps = evaluator.run_video(
            vid["frames"], vid["first_trimap"],
            out_dir=os.path.join(out_dir, vid["seq_name"]) if out_dir else None,
            filenames=vid["filenames"])
        fps_all.append(fps)
        gts = [trimap_from_alpha(a, radius) for a in vid["gt_alpha"]]
        ious.append(float(np.mean([trimap_iou(p, g)
                                   for p, g in zip(trimaps, gts)])))
        count += 1
        if max_videos and count >= max_videos:
            break
    return dict(iou=float(np.mean(ious)) if ious else 0.0,
                fps=float(np.mean(fps_all)) if fps_all else 0.0,
                videos=count)
