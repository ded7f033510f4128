"""The width/depth-scaled dryrun model (Config.model_scale > 1) must be
structurally identical to the full model: same param-tree key paths, same
optimizer-state structure.  This is what makes the cheap multichip dryrun
honest evidence for the full model's sharding (the data-mesh layout, grad
psums, donation and the RAdam update are all structure-level properties,
independent of channel widths).

Everything here runs under jax.eval_shape — abstract shapes only, no conv
FLOPs, no XLA compiles — so it stays in the smoke tier on a 1-core host."""
from __future__ import annotations

import functools

import jax
import pytest

pytestmark = pytest.mark.smoke


def _key_paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return sorted(jax.tree_util.keystr(path) for path, _ in flat)


def _abstract_state(stage: int, scale: int):
    from otvm_tpu.config import get_cfg_defaults
    from otvm_tpu.train.trainer import init_train_state

    cfg = get_cfg_defaults()
    cfg.train.stage = stage
    cfg.model_scale = scale
    return cfg, jax.eval_shape(
        functools.partial(init_train_state, cfg, height=32, width=32),
        jax.random.PRNGKey(0))


@pytest.mark.parametrize("stage", [1, 4])
def test_scaled_model_covers_full_structure(stage):
    import re

    _, full = _abstract_state(stage, 1)
    _, small = _abstract_state(stage, 4)
    full_p, small_p = set(_key_paths(full.params)), set(_key_paths(small.params))
    # every scaled param exists in the full model (nothing invented) ...
    assert small_p <= full_p
    # ... and what the full model has extra is ONLY deeper repeats of trunk
    # bottleneck blocks (index >= 1) — every module type, head, and dataflow
    # edge of the full graph is exercised by the scaled one.
    repeat_block = re.compile(r"\['layer\d'\]\['[1-9]\d?'\]")
    assert all(repeat_block.search(p) for p in full_p - small_p), \
        sorted(p for p in full_p - small_p if not repeat_block.search(p))[:5]
    assert set(_key_paths(small.batch_stats)) <= set(_key_paths(full.batch_stats))
    # widths actually shrink (this is not the full model renamed)
    n_full = sum(x.size for x in jax.tree_util.tree_leaves(full.params))
    n_small = sum(x.size for x in jax.tree_util.tree_leaves(small.params))
    assert n_small < n_full / 8


def test_optimizer_chain_scale_independent():
    """The RAdam+schedule(+freeze-mask) chain the dryrun exercises is the
    same FUNCTION of the param tree at any scale: both cfgs' optimizers
    yield identical state structure over the same params."""
    from otvm_tpu.train.trainer import make_optimizer

    cfg_full, _ = _abstract_state(4, 1)
    cfg_small, small = _abstract_state(4, 4)
    tx_full = make_optimizer(cfg_full, small.params, iters_per_epoch=10)
    tx_small = make_optimizer(cfg_small, small.params, iters_per_epoch=10)
    s_full = jax.tree_util.tree_structure(jax.eval_shape(tx_full.init, small.params))
    s_small = jax.tree_util.tree_structure(jax.eval_shape(tx_small.init, small.params))
    assert s_full == s_small
