"""Stage-1 trimap (STM) pretraining entry point (parity with reference
train_s1_trimap.py: STM-only CE training on DIM clips, optional
STM_weights.pth init)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def parse_args():
    p = argparse.ArgumentParser(description="Train OTVM-TPU stage-1 trimap")
    p.add_argument("--data-root", type=str, default=None)
    p.add_argument("--testmode", action="store_true")
    p.add_argument("--init", type=str, default=None,
                   help="STM_weights.pth (module.-prefixed) or orbax dir")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--repeats", type=int, default=20)
    p.add_argument("--input-size", type=int, default=None,
                   help="square train crop override (default 320)")
    p.add_argument("--workers", type=int, default=None,
                   help="loader threads (cfg.system.num_workers); on a "
                        "1-core host 2 is measured-best, 8 threads "
                        "HALVE the feed rate (docs/BENCH_NOTES.md)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 network compute, fp32 master params/optimizer")
    p.add_argument("--lr", type=float, default=None,
                   help="base LR override (default 1e-5)")
    p.add_argument("--stm-gn", action="store_true",
                   help="GroupNorm STM trunk (from-scratch recipe; frozen BN "
                        "at random init is the identity and does not train)")
    p.add_argument("--resume", type=str, default=None,
                   help="orbax train-state dir (params+opt+step)")
    p.add_argument("--max-iters", type=int, default=None,
                   help="hard cap on iterations per epoch (LR probes)")
    return p.parse_args()


def main():
    import jax

    from otvm_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from otvm_tpu.config import get_cfg_defaults
    from otvm_tpu.data.datasets import DIMTrain
    from otvm_tpu.data.loader import Loader, encode_wire, epoch_indices
    from otvm_tpu.parallel.mesh import (host_local, init_distributed,
                                        make_mesh, shard_batch)
    from otvm_tpu.train.trainer import (init_train_state, make_optimizer,
                                        make_trimap_s1_train_step)
    from otvm_tpu.utils.checkpoint import (import_torch_checkpoint,
                                           restore_train_state, save_train_state)
    from otvm_tpu.utils.logging import AverageMeter, create_logger

    args = parse_args()
    cfg = get_cfg_defaults()
    cfg.train.stage = 1
    if args.data_root:
        cfg.dataset.path = args.data_root
    if args.testmode:
        cfg.system.testmode = True
    if args.epochs:
        cfg.train.total_epochs = args.epochs
    if args.batch_size:
        cfg.train.batch_size = args.batch_size
    if args.input_size:
        cfg.train.train_input_size = (args.input_size, args.input_size)
    if args.bf16:
        cfg.train.bf16 = True
    if args.lr:
        cfg.train.base_lr = args.lr
    if args.workers is not None:
        cfg.system.num_workers = args.workers
    if args.stm_gn:
        cfg.stm_norm = "gn"

    init_distributed()
    mesh = make_mesh()
    logger, run_dir = create_logger(cfg.system.outdir, "s1_OTVM_trimap")

    dataset = DIMTrain.from_adobe_layout(cfg.dataset.path,
                                         image_shape=cfg.train.train_input_size,
                                         sample_length=cfg.train.frame_num)
    iters_per_epoch = max(len(dataset) * args.repeats // cfg.train.batch_size, 1)

    state = init_train_state(cfg, jax.random.PRNGKey(cfg.system.random_seed))
    tx = make_optimizer(cfg, state.params, iters_per_epoch)
    state = state.replace(opt_state=tx.init(state.params))
    if args.init and args.init.endswith(".pth"):
        imported = import_torch_checkpoint(args.init, 1)
        params = dict(state.params)
        params["stm"] = imported["trimap"]["params"]
        state = state.replace(params=params,
                              batch_stats=imported["trimap"].get(
                                  "batch_stats", state.batch_stats),
                              opt_state=tx.init(params))
    start_epoch = 0
    if args.resume and not os.path.isdir(args.resume):
        logger.info(f"--resume {args.resume}: no checkpoint yet, fresh start")
        args.resume = None
    if args.resume:
        state = restore_train_state(args.resume, state)
        start_epoch = min(int(state.step) // iters_per_epoch,
                          cfg.train.total_epochs)
        logger.info(f"resumed at step {int(state.step)} (epoch {start_epoch})")

    train_step = make_trimap_s1_train_step(cfg, tx)
    meter = AverageMeter()
    iou_meter = AverageMeter()
    per_proc_batch = cfg.train.batch_size // jax.process_count()
    total_epochs = 1 if cfg.system.testmode else cfg.train.total_epochs

    from otvm_tpu.eval.metrics import reference_iou

    for epoch in range(start_epoch, total_epochs):
        idx = epoch_indices(len(dataset), epoch, args.repeats,
                            cfg.system.random_seed,
                            jax.process_index(), jax.process_count())
        loader = Loader(dataset, idx, per_proc_batch,
                        seed=cfg.system.random_seed + epoch,
                        num_threads=cfg.system.num_workers)
        # device-side loss accumulation + IoU only at log steps: the
        # per-step float()/host_local() sync serialized dispatch against
        # compute (the reference syncs per PRINT_FREQ, train.py:379-386)
        loss_acc, n_acc = None, 0
        for i, sample in enumerate(loader):
            if cfg.system.testmode and i > 20:
                break
            if args.max_iters and i >= args.max_iters:
                break
            # uint8 wire format (the TPU tunnel moves ~4-6 MB/s; float32
            # batches cost seconds per iteration) + on-device composite
            batch = shard_batch(mesh, encode_wire(
                dict(fg=sample["fg"], bg=sample["bg"],
                     alpha=sample["alpha"], tri=sample["tri"])))
            state, metrics = train_step(state, batch)
            loss_acc = metrics["loss"] if loss_acc is None \
                else loss_acc + metrics["loss"]
            n_acc += 1
            if i % 50 == 0:
                meter.update(float(loss_acc) / n_acc, n_acc)
                loss_acc, n_acc = None, 0
                # trimap IoU on THIS batch, the reference's exact
                # per-sample macro smoothed x100 aggregation
                # (train_s1_trimap.py:287-303); frame 0 is the GT first
                # trimap so only propagated frames are scored
                pred_lab = host_local(metrics["pred_lab"])[:, 1:]
                gt_lab = host_local(metrics["gt_lab"])[:, 1:]
                iou_meter.update(reference_iou(pred_lab, gt_lab))
                if jax.process_index() == 0:
                    logger.info(f"E{epoch} I{i} CE {meter.val:.4f} "
                                f"({meter.avg:.4f}) IoU {iou_meter.val:.2f} "
                                f"({iou_meter.avg:.2f})")
        if jax.process_index() == 0:
            save_train_state(os.path.join("weights", "s1_OTVM_trimap"), state)


if __name__ == "__main__":
    main()
