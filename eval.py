"""Streaming inference entry point (parity with reference eval.py).

Usage:
  python eval.py --demo [--data-root ./demo] --weights s4_OTVM.pth
  python eval.py --trimap medium --data-root <VM108 root> --weights ...

Weights may be a released PyTorch .pth (converted on the fly) or an orbax
train-state directory produced by train.py.  Without --weights, random
weights are used (pipeline smoke runs).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate OTVM-TPU")
    p.add_argument("--trimap", default="medium", choices=["narrow", "medium", "wide"])
    p.add_argument("--stage", type=int, default=4, choices=[1, 2, 3, 4],
                   help="checkpoint stage: 1/2 = alpha with GIVEN trimaps "
                        "(no trimap net), 3/4 = joint streaming")
    p.add_argument("--trimap-net", action="store_true",
                   help="evaluate trimap propagation only "
                        "(s1_OTVM_trimap checkpoints); reports IoU on VM108")
    p.add_argument("--demo", action="store_true")
    p.add_argument("--viz", action="store_true")
    p.add_argument("--data-root", type=str, default=None)
    p.add_argument("--weights", type=str, default=None)
    p.add_argument("--outdir", type=str, default=None)
    p.add_argument("--max-videos", type=int, default=None)
    p.add_argument("--testmode", action="store_true")
    p.add_argument("--max-edge", type=int, default=None,
                   help="downscale frames so min(H,W) <= this (testmode: 256)")
    p.add_argument("--arch", default="resnet50_GN_WS",
                   choices=["resnet50_GN_WS", "resnet50_BN"],
                   help="FBA trunk the checkpoint was trained with "
                        "(Config.alpha.arch); must match for param restore")
    p.add_argument("--streams", type=int, default=1,
                   help="serve N videos concurrently on one chip "
                        "(round-robin B=1 dispatches, one memory bank per "
                        "stream; joint stages 3/4 only).  Per-video outputs "
                        "are identical to --streams 1; aggregate throughput "
                        "is higher (docs/BENCH_NOTES.md)")
    p.add_argument("--wire-u8", action="store_true",
                   help="serving wire mode: quantize alpha/trimap to uint8 "
                        "on device before the per-frame fetch (4-8x fewer "
                        "device->host bytes; equals the reference's uint8 "
                        "PNG output quantization, eval.py:136-144)")
    return p.parse_args()


def load_weights(path, stage=4, arch="resnet50_GN_WS"):
    import jax

    from otvm_tpu.config import get_cfg_defaults
    from otvm_tpu.train.trainer import init_train_state
    from otvm_tpu.utils.checkpoint import (has_batch_stats,
                                           import_torch_checkpoint,
                                           restore_params_only)

    cfg = get_cfg_defaults()
    cfg.train.stage = stage
    cfg.alpha.arch = arch
    if path is not None and not path.endswith(".pth"):
        # GN-trunk checkpoints (from-scratch recipe) carry no BN stats;
        # pick the matching template BEFORE restoring so the tolerant merge
        # doesn't backfill identity stats over a GN model.  Metadata-only
        # probe (has_batch_stats) — no double full-tree restore.  NOTE: a
        # BN-trained checkpoint that somehow lost its batch_stats key would
        # be misread as GN (param names intentionally coincide), hence the
        # loud warning.
        if not has_batch_stats(path):
            print("[eval] checkpoint has no batch_stats -> serving the "
                  "GN-trunk STM template (stm_norm=gn); if this checkpoint "
                  "was BN-trained, its stats are missing and results will "
                  "be wrong")
            cfg.stm_norm = "gn"
    state = init_train_state(cfg, jax.random.PRNGKey(0), None, 64, 64)
    if path is None:
        print("WARNING: no --weights given; using random weights")
    elif path.endswith(".pth"):
        imported = import_torch_checkpoint(path, stage)
        trimap_vars = imported["trimap"]
        alpha_vars = imported["alpha"]
        return trimap_vars, alpha_vars
    else:
        # train-state checkpoint: params only (opt_state irrelevant for eval)
        state = restore_params_only(path, state)
    trimap_vars = {"params": state.params["stm"]}
    if state.batch_stats:
        trimap_vars["batch_stats"] = state.batch_stats
    alpha_vars = {"params": state.params["fba"]}
    return trimap_vars, alpha_vars


def main():
    from otvm_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from otvm_tpu.config import MODEL_NAMES, get_cfg_defaults
    from otvm_tpu.eval.runner import (EvalProtocol, MultiStreamEvaluator,
                                      StreamingEvaluator, TrimapEvaluator,
                                      evaluate_vm108, evaluate_vm108_trimap,
                                      iter_demo_videos)

    args = parse_args()
    cfg = get_cfg_defaults()
    data_root = args.data_root or ("./demo" if args.demo else cfg.dataset.path)
    model_name = ("s1_OTVM_trimap" if args.trimap_net
                  else MODEL_NAMES[args.stage])
    outdir = args.outdir or ("./demo_results" if args.demo else
                             os.path.join(cfg.system.outdir, "alpha", "test",
                                          args.trimap, model_name))

    trimap_vars, alpha_vars = load_weights(
        args.weights, stage=(1 if args.trimap_net else args.stage),
        arch=args.arch)
    protocol = EvalProtocol(memory_max_num=cfg.test.memory_max_num,
                            memory_skip_frame=cfg.test.memory_skip_frame,
                            trimap_width=args.trimap, stage=args.stage,
                            arch=args.arch, wire_u8_out=args.wire_u8)
    if args.streams > 1 and (args.trimap_net or args.stage <= 2):
        raise SystemExit("--streams > 1 is the joint serving path "
                         "(stages 3/4, not --trimap-net)")
    if args.trimap_net:
        tev = TrimapEvaluator(trimap_vars, protocol)
        if args.demo:
            for vid in iter_demo_videos(data_root):
                frames = vid["frames"][:4] if args.testmode else vid["frames"]
                trimaps, fps = tev.run_video(
                    frames, vid["first_trimap"],
                    out_dir=os.path.join(outdir, "pred_trimap", vid["seq_name"]),
                    filenames=vid["filenames"])
                print(f"{vid['seq_name']}: {len(trimaps)} trimaps @ {fps:.2f} fps")
        else:
            results = evaluate_vm108_trimap(
                tev, data_root, out_dir=os.path.join(outdir, "pred_trimap"),
                max_videos=(2 if args.testmode else args.max_videos))
            print(json.dumps(results, indent=2))
        return
    ev = (MultiStreamEvaluator(trimap_vars, alpha_vars, protocol)
          if args.streams > 1 else
          StreamingEvaluator(trimap_vars, alpha_vars, protocol))

    max_edge = args.max_edge or (256 if args.testmode else None)

    def downscale(frames, tri):
        if max_edge is None:
            return frames, tri
        import cv2
        h, w = frames[0].shape[:2]
        s = max_edge / min(h, w)
        if s >= 1:
            return frames, tri
        size = (int(w * s), int(h * s))
        frames = [cv2.resize(f, size) for f in frames]
        lbl = cv2.resize(tri.argmax(-1).astype("uint8"), size,
                         interpolation=cv2.INTER_NEAREST)
        import numpy as np
        return frames, np.eye(3, dtype=np.float32)[lbl]

    if args.demo:
        if args.streams > 1:
            vids = []
            for vid in iter_demo_videos(data_root):
                frames = vid["frames"][:4] if args.testmode else vid["frames"]
                vid["frames"], vid["first_trimap"] = downscale(
                    frames, vid["first_trimap"])
                vids.append(vid)
            for i in range(0, len(vids), args.streams):
                group = vids[i:i + args.streams]
                results, agg_fps = ev.run_videos(
                    group, out_root=os.path.join(outdir, "pred"),
                    viz_root=(os.path.join(outdir, "viz")
                              if args.viz else None))
                names = ", ".join(v["seq_name"] for v in group)
                n = sum(len(a) for a, _ in results)
                print(f"[{names}]: {n} frames @ {agg_fps:.2f} fps aggregate")
        else:
            for vid in iter_demo_videos(data_root):
                frames = vid["frames"]
                if args.testmode:
                    frames = frames[:4]
                frames, vid["first_trimap"] = downscale(frames, vid["first_trimap"])
                alphas, trimaps, fps = ev.run_video(
                    frames, vid["first_trimap"],
                    out_dir=os.path.join(outdir, "pred", vid["seq_name"]),
                    filenames=vid["filenames"],
                    viz_dir=(os.path.join(outdir, "viz", vid["seq_name"])
                             if args.viz else None))
                print(f"{vid['seq_name']}: {len(alphas)} frames @ {fps:.2f} fps")
    else:
        results = evaluate_vm108(ev, data_root, out_dir=os.path.join(outdir, "pred"),
                                 max_videos=(2 if args.testmode else args.max_videos),
                                 streams=args.streams)
        print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
