"""Measured quality evidence for the BASELINE north star ("SAD/MSE within
1% of the PyTorch reference").  Produces QUALITY_r<N>.json at the repo root.

Sections (each optional, controlled by flags):
  oracle   -- reference-vs-rebuild parity measured through the in-test torch
              oracle: both frameworks run the SAME random-weight s4 joint
              model on the SAME synthetic clip; we score both predictions
              with the VM108 SAD/MSE/dtSSD metrics against a synthetic GT
              and report the relative difference (plus raw per-pixel alpha
              deltas).  This turns "within 1%" into a measured number
              without the unreleased .pth files.  (Protocol mirrors
              tests/test_eval_joint.py; metrics utils/tmp/metric.py:177-302.)
  trained  -- full eval protocol (evaluate_vm108) on the synthetic VM108
              fixture + dove demo with a TRAINED checkpoint (weights dir).
  edt      -- dove eval twice (approximate JFA EDT vs exact EDT) with the
              trained checkpoint; records max/mean alpha delta of the real
              pipeline (VERDICT r1 weak #5; utils/utils.py:25-39).
  bf16     -- dove eval fp32 vs bf16 params/activations with the trained
              checkpoint; records alpha delta + SAD drift (weak #7).

Usage:
  python scripts/quality_check.py --out QUALITY_r2.json \
      [--oracle] [--trained --weights weights/s4_OTVM --synth /tmp/synth_data] \
      [--edt] [--bf16] [--dove /root/reference/demo] [--max-edge 256]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sad(pred, gt, mask):
    from otvm_tpu.eval.metrics import video_metrics
    return video_metrics(np.stack(pred) * 255.0, np.stack(gt) * 255.0, mask)


def run_oracle(n_frames=8, h=64, w=96, seed=0):
    """Both implementations, same weights, same clip, same metrics."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    import jax.numpy as jnp
    import torch

    from otvm_tpu.convert import convert_joint
    from otvm_tpu.data.trimap import trimap_from_alpha
    from otvm_tpu.eval.metrics import video_metrics
    from otvm_tpu.models.otvm import eval_frame_step, make_eval_bank
    from torch_ref.refload import load_reference, seeded_torch_model

    ref = load_reference()

    def build():
        trimap = ref["trimap_model"].FullModel_eval(stage=4, hdim=16,
                                                    dilate_kernel=12)
        return ref["alpha_model"].EvalModel(dilate_kernel=12, trimap=trimap,
                                            stage=4)

    tmodel = seeded_torch_model(build, seed=seed)

    # synthetic "video": a moving soft disc over noise; GT alpha = the disc
    rng = np.random.RandomState(seed + 1)
    yy, xx = np.mgrid[:h, :w]
    frames, gts = [], []
    for i in range(n_frames):
        cy, cx = h / 2 + 2 * i, w / 3 + 3 * i
        d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        a = np.clip((14 - d) / 6 + 0.5, 0, 1).astype(np.float32)
        fgc = np.stack([np.full((h, w), c, np.float32) for c in (0.8, 0.4, 0.2)], -1)
        bgc = rng.rand(h, w, 3).astype(np.float32) * 0.5
        frames.append(fgc * a[..., None] + bgc * (1 - a[..., None]))
        gts.append(a)
    tri0 = trimap_from_alpha(gts[0], 6)

    skip, max_mem = 3, 2
    # ---- torch reference stream
    t_alphas = []
    with torch.no_grad():
        for i in range(n_frames):
            fg = torch.from_numpy(
                frames[i][None, None].transpose(0, 1, 4, 2, 3)[:, :, ::-1].copy() * 255.0)
            a1 = torch.ones(1, 1, 1, h, w)
            tri_gt = torch.from_numpy(tri0[None, None].transpose(0, 1, 4, 2, 3).copy())
            out = tmodel(a1, fg, fg, tri=None, tri_gt=tri_gt,
                         first_frame=(i == 0), last_frame=(i == n_frames - 1),
                         memorize=(i % skip == 0), max_memory_num=max_mem,
                         large_input=False)
            t_alphas.append(out[3].squeeze().numpy())

    # ---- rebuild stream (exact EDT to isolate framework-vs-framework)
    variables = convert_joint(tmodel.state_dict(), stage=4)
    bank = make_eval_bank(1, h, w, max_mem)
    first_tri = jnp.asarray(tri0[None])
    j_alphas = []
    for i in range(n_frames):
        out = eval_frame_step(
            variables["trimap"], variables["alpha"], bank,
            jnp.asarray(frames[i][None]), first_tri,
            jnp.asarray(i == 0), jnp.asarray(i % skip == 0),
            jnp.asarray(i == n_frames - 1),
            stage=4, max_memory_num=max_mem, exact_edt=True)
        bank = out.bank
        j_alphas.append(np.asarray(out.alpha[0, :, :, 0]))

    mask = np.stack([trimap_from_alpha(a, 6)[..., 1] for a in gts]) * 128.0
    m_ref = video_metrics(np.stack(t_alphas) * 255.0, np.stack(gts) * 255.0, mask)
    m_jax = video_metrics(np.stack(j_alphas) * 255.0, np.stack(gts) * 255.0, mask)
    deltas = np.abs(np.stack(t_alphas) - np.stack(j_alphas))
    rel = {k: (abs(m_jax[k] - m_ref[k]) / abs(m_ref[k]) * 100 if m_ref[k] else 0.0)
           for k in ("SAD", "MSE", "dtSSD")}
    return dict(
        protocol=f"{n_frames}f {h}x{w} joint s4, same random weights, exact EDT",
        torch=dict((k, float(m_ref[k])) for k in m_ref),
        rebuild=dict((k, float(m_jax[k])) for k in m_jax),
        rel_diff_pct=dict((k, float(v)) for k, v in rel.items()),
        alpha_delta=dict(max=float(deltas.max()), mean=float(deltas.mean())),
    )


def _dove_frames(dove_root, max_edge=None, n=None):
    from otvm_tpu.eval.runner import iter_demo_videos
    vid = next(iter_demo_videos(dove_root))
    frames, tri = vid["frames"], vid["first_trimap"]
    if n:
        frames = frames[:n]
    if max_edge:
        import cv2
        hh, ww = frames[0].shape[:2]
        s = max_edge / min(hh, ww)
        if s < 1:
            size = (int(ww * s), int(hh * s))
            frames = [cv2.resize(f, size) for f in frames]
            lbl = cv2.resize(tri.argmax(-1).astype("uint8"), size,
                             interpolation=cv2.INTER_NEAREST)
            tri = np.eye(3, dtype=np.float32)[lbl]
    return frames, tri


def _save_strip(path, frames, alphas, gt_alphas=None, n=6):
    """One committed PNG: n evenly-spaced frames as columns, rows = [image,
    (gt alpha,) pred alpha, green-screen composite].  The visual half of the
    VERDICT-r2 #1 deliverable (demo protocol, /root/reference/eval.py:96-115)."""
    import cv2

    from otvm_tpu.utils.viz import make_grid

    idx = np.linspace(0, len(frames) - 1, min(n, len(frames))).astype(int)
    rows = [[np.asarray(frames[i], np.float32) for i in idx]]
    if gt_alphas is not None:
        rows.append([np.repeat(np.asarray(gt_alphas[i], np.float32)[..., None],
                               3, -1) for i in idx])
    rows.append([np.repeat(np.clip(alphas[i], 0, 1)[..., None], 3, -1)
                 for i in idx])
    green = np.zeros_like(rows[0][0])
    green[..., 1] = 1.0
    rows.append([frames[i] * rows[-1][j] + green * (1 - rows[-1][j])
                 for j, i in enumerate(idx)])
    tiles = [t for row in rows for t in row]
    # keep the committed artifact small
    scale = 320.0 / max(tiles[0].shape[:2])
    if scale < 1:
        size = (int(tiles[0].shape[1] * scale), int(tiles[0].shape[0] * scale))
        tiles = [cv2.resize(t, size) for t in tiles]
    grid = make_grid(tiles, nrow=len(idx))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, (np.clip(grid[..., ::-1], 0, 1) * 255).astype(np.uint8))
    print("viz strip ->", path)


def _stream(trimap_vars, alpha_vars, frames, tri, exact_edt=False,
            dtype=None, trimaps_out=None):
    import jax
    import jax.numpy as jnp

    from otvm_tpu.eval.runner import EvalProtocol, _pad_frame, _unpad
    from otvm_tpu.models.otvm import eval_frame_step, make_eval_bank

    if dtype is not None:
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if hasattr(x, "astype") and
            np.issubdtype(np.asarray(x).dtype, np.floating) else x, t)
        trimap_vars, alpha_vars = cast(trimap_vars), cast(alpha_vars)
    proto = EvalProtocol()
    n = len(frames)
    flags, max_num, _ = proto.flags(n, *frames[0].shape[:2])
    f0, t0, pad0 = _pad_frame(frames[0], tri)
    bank = make_eval_bank(1, f0.shape[0], f0.shape[1], max_num,
                          dtype or np.float32)
    first_tri = jnp.asarray(t0[None], dtype or jnp.float32)
    alphas = []
    for i in range(n):
        f, _, pad = _pad_frame(frames[i], None) if i else (f0, t0, pad0)
        first, memorize, last = flags[i]
        out = eval_frame_step(
            trimap_vars, alpha_vars, bank,
            jnp.asarray(f[None], dtype or jnp.float32), first_tri,
            jnp.asarray(first), jnp.asarray(memorize), jnp.asarray(last),
            stage=4, max_memory_num=max_num, exact_edt=exact_edt,
            stm_norm=("frozen_bn" if (trimap_vars or {}).get("batch_stats")
                      else "gn"))
        bank = out.bank
        alphas.append(_unpad(np.asarray(out.alpha[0, :, :, 0], np.float32), pad))
        if trimaps_out is not None:
            trimaps_out.append(
                _unpad(np.asarray(out.trimap[0], np.float32), pad))
    return alphas


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="QUALITY_r2.json")
    p.add_argument("--oracle", action="store_true")
    p.add_argument("--oracle-hw", default=None,
                   help="HxW[,frames] for a hi-res oracle run recorded as "
                        "oracle_parity_<H>x<W> (VERDICT r2 #5: show the "
                        "within-1%% parity holds at protocol-like "
                        "resolution, not just 64x96)")
    p.add_argument("--trained", action="store_true")
    p.add_argument("--edt", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--onsynth", action="store_true")
    p.add_argument("--dim-overfit", action="store_true")
    p.add_argument("--dim-weights", default="weights/s1_OTVM_alpha")
    p.add_argument("--tag", default="")
    p.add_argument("--weights", default="weights/s4_OTVM")
    p.add_argument("--synth", default="/tmp/synth_data")
    p.add_argument("--dove", default="/root/reference/demo")
    p.add_argument("--max-edge", type=int, default=256)
    p.add_argument("--max-frames", type=int, default=None)
    args = p.parse_args()

    report = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            report = json.load(f)
    report["context"] = (
        "oracle_parity is the framework-vs-framework number (same weights, "
        "same clip, torch reference vs rebuild) and is the evidence for the "
        "'within 1%' north star.  trained_* / edt / bf16 sections use the "
        "best checkpoint available in this image: a stage-chained overfit of "
        "the synthetic fixture (the paper's released .pth files are not "
        "present), so dove (off-distribution) numbers are directional only; "
        "onsynth_variants is the on-distribution version of the EDT/bf16 "
        "comparison.")

    def _save():
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)

    if args.oracle:
        report["oracle_parity"] = run_oracle()
        print(json.dumps(report["oracle_parity"], indent=2))
        _save()

    if args.oracle_hw:
        hw, _, nf = args.oracle_hw.partition(",")
        h, w = (int(v) for v in hw.split("x"))
        n = int(nf) if nf else 6
        report[f"oracle_parity_{h}x{w}"] = run_oracle(n_frames=n, h=h, w=w)
        print(json.dumps(report[f"oracle_parity_{h}x{w}"], indent=2))
        _save()

    need_weights = args.trained or args.edt or args.bf16 or args.onsynth
    if need_weights:
        # import the REPO's eval.py by path: run_oracle's reference loader
        # prepends /root/reference to sys.path, which shadows the name `eval`
        import importlib.util
        repo_eval = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "eval.py")
        spec = importlib.util.spec_from_file_location("otvm_repo_eval", repo_eval)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        trimap_vars, alpha_vars = mod.load_weights(args.weights, stage=4)

    if args.trained:
        from otvm_tpu.eval.runner import EvalProtocol, StreamingEvaluator, evaluate_vm108
        sfx = f"_{args.tag}" if args.tag else ""
        ev = StreamingEvaluator(trimap_vars, alpha_vars, EvalProtocol())
        res = evaluate_vm108(ev, args.synth, mode="val")
        res["weights"] = args.weights
        report["trained_vm108_synth" + sfx] = {
            k: (float(v) if not isinstance(v, str) else v)
            for k, v in res.items()}
        _save()
        # dove has no GT alpha; record fps + that the stream completes
        frames, tri = _dove_frames(args.dove, args.max_edge, args.max_frames)
        tris = []
        alphas = _stream(trimap_vars, alpha_vars, frames, tri,
                         trimaps_out=tris)
        # trimap diagnostics: if alpha degenerates, the per-class fractions
        # of the PROPAGATED trimaps say whether the collapse happened in the
        # trimap net (propagation) or the alpha net (matting)
        lbl = [t.argmax(-1) for t in tris[1:]]   # frame 0 is the GT trimap
        report["trained_dove" + sfx] = dict(
            frames=len(alphas),
            alpha_mean=float(np.mean([a.mean() for a in alphas])),
            alpha_fg_frac=float(np.mean([(a > 0.5).mean() for a in alphas])),
            pred_trimap_fg_frac=float(np.mean([(l == 2).mean() for l in lbl])),
            pred_trimap_unk_frac=float(np.mean([(l == 1).mean() for l in lbl])))
        _save_strip(os.path.join("docs", "viz", f"dove{sfx}.png"),
                    frames, alphas)
        # held-out synth val clip with GT alpha for visual comparison
        from otvm_tpu.eval.runner import iter_vm108_videos
        vid = next(iter_vm108_videos(args.synth, mode="val"))
        val_alphas = _stream(trimap_vars, alpha_vars,
                             vid["frames"], vid["first_trimap"])
        _save_strip(os.path.join("docs", "viz", f"synth_val{sfx}.png"),
                    vid["frames"], val_alphas, gt_alphas=vid["gt_alpha"])
        print(json.dumps({k: report[k] for k in
                          ("trained_vm108_synth" + sfx, "trained_dove" + sfx)},
                         indent=2))

    if args.edt:
        frames, tri = _dove_frames(args.dove, args.max_edge, args.max_frames)
        a_jfa = _stream(trimap_vars, alpha_vars, frames, tri, exact_edt=False)
        a_ex = _stream(trimap_vars, alpha_vars, frames, tri, exact_edt=True)
        d = np.abs(np.stack(a_jfa) - np.stack(a_ex))
        report["edt_jfa_vs_exact_dove"] = dict(
            max_alpha_delta=float(d.max()), mean_alpha_delta=float(d.mean()),
            frames=len(frames),
            note="production JFA EDT vs exact EDT, trained s4 weights")
        print(json.dumps(report["edt_jfa_vs_exact_dove"], indent=2))
        _save()

    if args.dim_overfit:
        # VERDICT r1 weak #8's exact suggestion: overfit the DIM images and
        # show SAD dropping toward zero on THOSE images with the trimap
        # GIVEN (stage-1 protocol, no propagation compounding).  Run once
        # before and once after a stage-1 overfit continuation; the key is
        # recorded with a caller-chosen tag.
        import cv2
        import jax.numpy as jnp

        from otvm_tpu.data.trimap import trimap_from_alpha
        from otvm_tpu.eval.metrics import video_metrics
        from otvm_tpu.models.otvm import alpha_predict, make_trimap_features
        from otvm_tpu.nn.ops import pad_divide_by

        import importlib.util as _ilu
        repo_eval = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "eval.py")
        spec1 = _ilu.spec_from_file_location("otvm_repo_eval1", repo_eval)
        mod1 = _ilu.module_from_spec(spec1)
        spec1.loader.exec_module(mod1)
        _, s1_vars = mod1.load_weights(args.dim_weights, stage=1)

        root = os.path.join(args.synth, "Combined_Dataset", "Training_set")
        fg_dir = os.path.join(root, "Adobe-licensed images", "fg")
        a_dir = os.path.join(root, "Adobe-licensed images", "alpha")
        bg_dir = os.path.join(root, "train2014")
        fgs = sorted(os.listdir(fg_dir))
        bgs = sorted(os.listdir(bg_dir))
        preds, gts, masks = [], [], []
        for i, nm in enumerate(fgs):
            fg = cv2.imread(os.path.join(fg_dir, nm))[..., ::-1] / 255.0
            a = cv2.imread(os.path.join(a_dir, nm), cv2.IMREAD_GRAYSCALE) / 255.0
            bg = cv2.imread(os.path.join(bg_dir, bgs[i % len(bgs)]))[..., ::-1] / 255.0
            bg = cv2.resize(bg, (fg.shape[1], fg.shape[0]))
            comp = (fg * a[..., None] + bg * (1 - a[..., None])).astype(np.float32)
            tri = trimap_from_alpha(a.astype(np.float32), 12)
            f_p, _ = pad_divide_by(jnp.asarray(comp[None], jnp.float32), 32)
            t_p, _ = pad_divide_by(jnp.asarray(tri[None], jnp.float32), 32)
            alpha, _ = alpha_predict(s1_vars, f_p, t_p, stage=1)
            h, w = comp.shape[:2]
            ph = (f_p.shape[1] - h) // 2
            pw = (f_p.shape[2] - w) // 2
            preds.append(np.asarray(alpha[0, ph:ph + h, pw:pw + w, 0]))
            gts.append(a.astype(np.float32))
            masks.append(tri[..., 1])
        m = video_metrics(np.stack(preds) * 255.0, np.stack(gts) * 255.0,
                          np.stack(masks) * 128.0)
        key = f"dim_overfit_{args.tag}" if args.tag else "dim_overfit"
        report[key] = dict(
            note="stage-1 alpha on the 4 DIM fixture images, trimap given "
                 "(protocol of BASELINE config[0]); weights="
                 + args.dim_weights,
            images=len(fgs),
            SAD=float(m["SAD"]), MSE=float(m["MSE"]),
            mean_abs_err_unknown=float(np.mean([
                np.abs(p - g)[mk > 0.5].mean()
                for p, g, mk in zip(preds, gts, masks)])),
        )
        print(json.dumps(report[key], indent=2))
        _save()

    if args.onsynth:
        # on-distribution EDT + bf16 deltas: the dove numbers above are noisy
        # because the available checkpoint is a small synthetic overfit (the
        # paper's released .pth weights are not in this image) and dove is
        # off-distribution for it.  Here we stream the synth VM108 clip the
        # checkpoint was actually fit to, where its alpha is meaningful.
        import jax.numpy as jnp

        from otvm_tpu.data.trimap import trimap_from_alpha
        from otvm_tpu.eval.metrics import video_metrics
        from otvm_tpu.eval.runner import iter_vm108_videos
        vid = next(iter_vm108_videos(args.synth, "val", 12))
        frames, tri = vid["frames"], vid["first_trimap"]
        gt = np.stack(vid["gt_alpha"]) * 255.0
        mask = np.stack([trimap_from_alpha(a, 12)[..., 1]
                         for a in vid["gt_alpha"]]) * 128.0

        def score(alphas):
            m = video_metrics(np.stack(alphas) * 255.0, gt, mask)
            return dict(SAD=float(m["SAD"]), MSE=float(m["MSE"]))

        a_base = _stream(trimap_vars, alpha_vars, frames, tri)           # JFA fp32
        a_ex = _stream(trimap_vars, alpha_vars, frames, tri, exact_edt=True)
        a_b16 = _stream(trimap_vars, alpha_vars, frames, tri, dtype=jnp.bfloat16)
        d_edt = np.abs(np.stack(a_base) - np.stack(a_ex))
        d_b16 = np.abs(np.stack(a_base) - np.stack(a_b16))
        s_base, s_ex, s_b16 = score(a_base), score(a_ex), score(a_b16)
        report["onsynth_variants"] = dict(
            note="synth VM108 clip (on-distribution for the trained ckpt); "
                 "baseline = production JFA EDT, fp32",
            frames=len(frames),
            sad=dict(jfa_fp32=s_base["SAD"], exact_fp32=s_ex["SAD"],
                     jfa_bf16=s_b16["SAD"]),
            mse=dict(jfa_fp32=s_base["MSE"], exact_fp32=s_ex["MSE"],
                     jfa_bf16=s_b16["MSE"]),
            edt_sad_rel_diff_pct=float(abs(s_ex["SAD"] - s_base["SAD"])
                                       / max(s_base["SAD"], 1e-9) * 100),
            bf16_sad_rel_diff_pct=float(abs(s_b16["SAD"] - s_base["SAD"])
                                        / max(s_base["SAD"], 1e-9) * 100),
            edt_alpha_delta=dict(max=float(d_edt.max()), mean=float(d_edt.mean())),
            bf16_alpha_delta=dict(max=float(d_b16.max()), mean=float(d_b16.mean())),
        )
        print(json.dumps(report["onsynth_variants"], indent=2))
        _save()

    if args.bf16:
        import jax.numpy as jnp
        frames, tri = _dove_frames(args.dove, args.max_edge, args.max_frames)
        a32 = _stream(trimap_vars, alpha_vars, frames, tri)
        a16 = _stream(trimap_vars, alpha_vars, frames, tri, dtype=jnp.bfloat16)
        d = np.abs(np.stack(a32) - np.stack(a16))
        s32, s16 = np.stack(a32).sum(), np.stack(a16).sum()
        report["bf16_vs_fp32_dove"] = dict(
            max_alpha_delta=float(d.max()), mean_alpha_delta=float(d.mean()),
            alpha_mass_rel_drift_pct=float(abs(s16 - s32) / max(s32, 1e-6) * 100),
            frames=len(frames),
            note="bf16 params+activations vs fp32, trained s4 weights")
        print(json.dumps(report["bf16_vs_fp32_dove"], indent=2))

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
