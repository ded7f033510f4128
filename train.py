"""Stage-wise training entry point (parity with reference train.py).

Usage:
  python train.py --stage {1,2,3,4} [--data-root PATH] [--testmode]
                  [--init CKPT.pth|orbax_dir] [--resume orbax_dir]
                  [--epochs N] [--batch-size B]

Stages (train.py:86-168 semantics):
  1  alpha net alone on DIM (GT trimaps every frame)
  2  alpha trained / trimap frozen, on DIM
  3  trimap trained / alpha frozen, on DIM
  4  joint end-to-end on VideoMatting108 with the max_skip curriculum

Parallelism: 1-D data mesh over all visible devices (DDP equivalent); run
one process per host for multi-host (JAX_COORDINATOR_ADDRESS set).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def parse_args():
    p = argparse.ArgumentParser(description="Train OTVM-TPU")
    p.add_argument("--stage", type=int, required=True, choices=[1, 2, 3, 4])
    p.add_argument("--data-root", type=str, default=None)
    p.add_argument("--testmode", action="store_true",
                   help="smoke test: ~20 iters, 1 epoch (cfg.SYSTEM.TESTMODE)")
    p.add_argument("--init", type=str, default=None,
                   help="prior-stage weights (.pth via converter, or orbax dir)")
    p.add_argument("--init-trimap", type=str, default=None,
                   help="separate trimap-net init (s1_OTVM_trimap checkpoint "
                        "or STM_weights.pth) — the stage-2 load matrix loads "
                        "alpha and trimap from different artifacts "
                        "(train.py:96-104)")
    p.add_argument("--resume", type=str, default=None, help="orbax train-state dir")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--repeats", type=int, default=20,
                   help="dataset x20 per epoch (train.py:283)")
    p.add_argument("--input-size", type=int, default=None,
                   help="square train crop override (default 320)")
    p.add_argument("--lr", type=float, default=None,
                   help="base LR override (default 1e-5)")
    p.add_argument("--workers", type=int, default=None,
                   help="loader threads (cfg.system.num_workers); on a "
                        "1-core host 2 is measured-best, 8 threads "
                        "HALVE the feed rate (docs/BENCH_NOTES.md)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 network compute, fp32 master params/optimizer")
    p.add_argument("--stm-gn", action="store_true",
                   help="GroupNorm STM trunk (from-scratch recipe; frozen BN "
                        "at random init is the identity and does not train)")
    p.add_argument("--save-every", type=int, default=None,
                   help="checkpoint every N epochs (default 20; use 1 for "
                        "interruption-proof chains)")
    return p.parse_args()


def main():
    import jax

    from otvm_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np

    from otvm_tpu.config import get_cfg_defaults, get_model_name
    from otvm_tpu.data.datasets import DIMTrain, VM108Train, vm108_max_skip_for_epoch
    from otvm_tpu.data.loader import Loader, encode_wire, epoch_indices
    from otvm_tpu.parallel.mesh import init_distributed, make_mesh, shard_batch
    from otvm_tpu.train.trainer import (init_train_state, make_optimizer,
                                        make_train_step, run_epoch)
    from otvm_tpu.utils.checkpoint import (import_torch_checkpoint,
                                           restore_params_only,
                                           restore_train_state, save_train_state)
    from otvm_tpu.utils.logging import AverageMeter, StepTimer, create_logger

    args = parse_args()
    cfg = get_cfg_defaults()
    cfg.train.stage = args.stage
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
    if args.lr:
        cfg.train.base_lr = args.lr
    if args.workers is not None:
        cfg.system.num_workers = args.workers
    if args.bf16:
        cfg.train.bf16 = True
    if args.stm_gn:
        cfg.stm_norm = "gn"
    if args.save_every:
        cfg.train.save_every_epoch = args.save_every

    init_distributed()
    mesh = make_mesh()
    model_name = get_model_name(cfg)
    logger, run_dir = create_logger(cfg.system.outdir, model_name)
    logger.info(f"stage {args.stage} | devices {jax.device_count()} "
                f"| global batch {cfg.train.batch_size}")
    # cfg snapshot in the run dir (train.py:76-77)
    import dataclasses

    import yaml
    with open(os.path.join(run_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg), f)

    # dataset
    hw = cfg.train.train_input_size
    if args.stage == 4:
        dataset = VM108Train(cfg.dataset.path, hw, cfg.train.frame_num)
    else:
        dataset = DIMTrain.from_adobe_layout(cfg.dataset.path, image_shape=hw,
                                             sample_length=cfg.train.frame_num)
    iters_per_epoch = max(len(dataset) * args.repeats // cfg.train.batch_size, 1)

    # state init / stage chaining
    state = init_train_state(cfg, jax.random.PRNGKey(cfg.system.random_seed))
    tx = make_optimizer(cfg, state.params, iters_per_epoch)
    state = state.replace(opt_state=tx.init(state.params))
    if args.init:
        if args.init.endswith(".pth"):
            imported = import_torch_checkpoint(args.init, args.stage)
            params = dict(state.params)
            if "alpha" in imported:
                params["fba"] = imported["alpha"]["params"]
            if "trimap" in imported:
                params["stm"] = imported["trimap"]["params"]
                bs = imported["trimap"].get("batch_stats", state.batch_stats)
                state = state.replace(batch_stats=bs)
            state = state.replace(params=params, opt_state=tx.init(params))
        else:
            # prior-stage orbax checkpoint: params only, fresh optimizer
            state = restore_params_only(args.init, state)
            state = state.replace(opt_state=tx.init(state.params))
    if args.init_trimap:
        if args.init_trimap.endswith(".pth"):
            imported = import_torch_checkpoint(args.init_trimap, args.stage)
            params = dict(state.params)
            params["stm"] = imported["trimap"]["params"]
            state = state.replace(
                params=params,
                batch_stats=imported["trimap"].get("batch_stats",
                                                   state.batch_stats),
                opt_state=tx.init(params))
        else:
            # merge only the stm subtree from the given train-state dir
            donor = restore_params_only(args.init_trimap, state)
            params = dict(state.params)
            params["stm"] = donor.params["stm"]
            state = state.replace(params=params,
                                  batch_stats=donor.batch_stats,
                                  opt_state=tx.init(params))
    start_epoch = 0
    if args.resume and not os.path.isdir(args.resume):
        logger.info(f"--resume {args.resume}: no checkpoint yet, fresh start")
        args.resume = None
    if args.resume:
        state = restore_train_state(args.resume, state)
        # epoch position follows the restored step so a relaunched chain
        # continues instead of replaying from epoch 0 (the reference has no
        # resume at all: start_epoch=0 hardcoded, train.py:127)
        start_epoch = min(int(state.step) // iters_per_epoch,
                          cfg.train.total_epochs)
        logger.info(f"resumed at step {int(state.step)} (epoch {start_epoch})")

    train_step = make_train_step(cfg, tx)
    per_proc_batch = cfg.train.batch_size // jax.process_count()
    loss_meter = AverageMeter()
    timer = StepTimer()

    total_epochs = 1 if cfg.system.testmode else cfg.train.total_epochs
    for epoch in range(start_epoch, total_epochs):
        if args.stage == 4:
            dataset.max_skip = vm108_max_skip_for_epoch(epoch, cfg.train.total_epochs)
        idx = epoch_indices(len(dataset), epoch, args.repeats,
                            cfg.system.random_seed,
                            jax.process_index(), jax.process_count())
        loader = Loader(dataset, idx, per_proc_batch,
                        seed=cfg.system.random_seed + epoch,
                        num_threads=cfg.system.num_workers)
        image_freq = cfg.train.image_freq if cfg.train.image_freq > 0 else None
        # loss stays a device array between log lines: float() every step
        # forces a host sync per iteration, serializing dispatch against
        # compute (the reference also only syncs at PRINT_FREQ,
        # train.py:379-386).  We accumulate lazily on device and pay ONE
        # sync per 50 steps.
        loss_acc, n_acc = None, 0
        for i, batch in enumerate(loader):
            if cfg.system.testmode and i > 20:
                break
            host_batch = batch
            # uint8 wire format: the TPU tunnel moves ~4-6 MB/s, so the
            # float32 batch (~25 MB at b=2) would cost seconds per iteration;
            # decode_wire reconstructs inside the jitted step
            batch = shard_batch(mesh, encode_wire(batch))
            state, metrics = train_step(state, batch)
            loss_acc = metrics["loss"] if loss_acc is None \
                else loss_acc + metrics["loss"]
            n_acc += 1
            if image_freq and i % image_freq == 0 and jax.process_index() == 0:
                from otvm_tpu.train.trainer import make_viz_forward
                from otvm_tpu.utils.viz import save_train_grid
                if not hasattr(main, "_viz_fwd"):
                    main._viz_fwd = make_viz_forward(cfg)
                save_train_grid(os.path.join(run_dir, "images",
                                             f"e{epoch}_i{i}.jpg"),
                                host_batch, main._viz_fwd(state, batch))
            dt = timer.tick()
            if i % 50 == 0:
                loss = float(metrics["loss"])                 # one sync
                loss_meter.update(float(loss_acc) / n_acc, n_acc)
                loss_acc, n_acc = None, 0
                if jax.process_index() == 0:
                    # component losses: one extra sync per log line, but
                    # without them stage behavior is uninterpretable (the r4
                    # s3 "loss rise" could not be attributed to CE vs the
                    # frozen alpha terms — VERDICT r4 weak #4)
                    comps = " ".join(
                        f"{k}={float(metrics[k]):.4f}"
                        for k in ("L_alpha_comp", "L_lap", "L_grad", "L_tri")
                        if k in metrics)
                    logger.info(f"E{epoch} I{i} loss {loss:.4f} "
                                f"({loss_meter.avg:.4f}) {comps} "
                                f"{dt*1000:.0f} ms/it")
        if jax.process_index() == 0 and (
                (epoch + 1) % cfg.train.save_every_epoch == 0
                or epoch == total_epochs - 1):
            save_train_state(os.path.join(run_dir, f"ckpt_e{epoch + 1}"), state)
            save_train_state(os.path.join("weights", model_name), state)
            logger.info(f"saved checkpoint at epoch {epoch + 1}")


if __name__ == "__main__":
    main()
