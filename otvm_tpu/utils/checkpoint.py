"""Checkpoint save/restore (orbax) — strict upgrade over the reference.

The reference only ever SAVES (train.py:229-246); `start_epoch = 0` is
hardcoded (train.py:127) and optimizer state, though written, is never read
back — there is no resume at all (SURVEY §5).  Here:

  * save_train_state / restore_train_state round-trip params + frozen BN
    stats + optimizer state + step, so preempted runs resume exactly;
  * per-stage artifact contract mirrors the reference loader matrix
    (train.py:90-121): stage checkpoints are written under
    weights/<model_name>/ and the next stage's init loads them;
  * import_torch_checkpoint bridges the released .pth files via
    otvm_tpu.convert.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _ckpt(path: str):
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer(), os.path.abspath(path)


def save_pytree(path: str, tree: Any) -> None:
    ckptr, path = _ckpt(path)
    ckptr.save(path, jax.tree_util.tree_map(np.asarray, tree), force=True)


def restore_pytree(path: str, target: Optional[Any] = None) -> Any:
    ckptr, path = _ckpt(path)
    if target is not None:
        return ckptr.restore(path, item=jax.tree_util.tree_map(np.asarray, target))
    return ckptr.restore(path)


def has_batch_stats(path: str) -> bool:
    """True iff the checkpoint carries a non-empty batch_stats subtree —
    the GN-vs-frozen-BN template probe (eval.py).  Reads only the
    checkpoint's METADATA (tree structure), not the tensors: a full
    restore_pytree just to inspect one subtree loads params + opt_state
    twice per eval startup (ADVICE r4)."""
    ckptr, p = _ckpt(path)
    try:
        md = ckptr.metadata(p)
        md = md.tree if hasattr(md, "tree") else md
        bs = md.get("batch_stats") if isinstance(md, dict) else None
        return bool(bs)
    except Exception:
        tree = restore_pytree(path)
        return bool(tree.get("batch_stats"))


def save_train_state(path: str, state) -> None:
    save_pytree(path, dict(params=state.params, batch_stats=state.batch_stats,
                           opt_state=state.opt_state, step=state.step))


def _merge_into(template, loaded, path="", missing=None):
    """Tolerant merge: loaded values where present, template (fresh init)
    elsewhere — the stage loader's missing/unexpected-keys behavior
    (train.py:95-117): e.g. s3 adds refine + conv1_a/h params that an s2
    checkpoint doesn't have."""
    if missing is None:
        missing = []
    if isinstance(template, dict):
        out = {}
        for k, v in template.items():
            if isinstance(loaded, dict) and k in loaded:
                out[k] = _merge_into(v, loaded[k], f"{path}/{k}", missing)
            else:
                missing.append(f"{path}/{k}")
                out[k] = v
        return out
    return loaded


def restore_params_only(path: str, template):
    """Load params + batch_stats from a train-state checkpoint, ignoring the
    optimizer state — the stage-chaining init path (each stage builds a
    fresh optimizer, and stage 2/3 optimizers have a different masked
    structure than stage 1/4)."""
    tree = restore_pytree(path)  # raw dict, no structure enforcement
    missing: list = []
    params = _merge_into(template.params, tree.get("params", {}), "params", missing)
    stats = _merge_into(template.batch_stats, tree.get("batch_stats", {}),
                        "batch_stats", missing)
    if missing:
        print(f"[checkpoint] {len(missing)} keys not in {path}, keeping fresh "
              f"init (first: {missing[:4]})")
    return template.replace(params=params, batch_stats=stats)


def restore_train_state(path: str, template):
    """template: a TrainState with the right structure (fresh init)."""
    tree = restore_pytree(path, dict(params=template.params,
                                     batch_stats=template.batch_stats,
                                     opt_state=template.opt_state,
                                     step=template.step))
    return template.replace(params=tree["params"], batch_stats=tree["batch_stats"],
                            opt_state=tree["opt_state"], step=tree["step"])


def import_torch_checkpoint(path: str, stage: int):
    """Released .pth -> {'trimap': vars, 'alpha': vars} (joint, s3/s4) or
    single-net variables for the earlier-stage artifacts."""
    from ..convert import (convert_fba, convert_joint, convert_stm,
                           load_torch_state_dict)

    sd = load_torch_state_dict(path)
    keys = list(sd.keys())
    if any(k.startswith("NET.") for k in keys):
        return convert_joint(sd, stage=stage)
    if any(k.startswith("Encoder_M.") for k in keys):
        hdim = 16 if any("conv1_h" in k for k in keys) else -1
        return {"trimap": convert_stm(sd, hdim=hdim)}
    return {"alpha": convert_fba(sd, refinement=stage > 2)}
