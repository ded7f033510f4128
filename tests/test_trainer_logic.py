"""Trainer logic that doesn't need a compiled step: stage freeze masks,
optimizer masking, config surface."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.smoke
import optax

from otvm_tpu.config import get_cfg_defaults, get_model_name
from otvm_tpu.train.optim import radam
from otvm_tpu.train.trainer import stage_trainable_mask


def _fake_params():
    return {"stm": {"a": jnp.ones(2), "nested": {"b": jnp.ones(3)}},
            "fba": {"c": jnp.ones(2)}}


def test_stage_masks():
    p = _fake_params()
    m2 = stage_trainable_mask(p, 2)
    assert m2["stm"]["a"] is False and m2["stm"]["nested"]["b"] is False
    assert m2["fba"]["c"] is True
    m3 = stage_trainable_mask(p, 3)
    assert m3["stm"]["a"] is True and m3["fba"]["c"] is False
    m4 = stage_trainable_mask(p, 4)
    assert m4["stm"]["a"] is True and m4["fba"]["c"] is True


def test_masked_radam_freezes_subtree():
    from otvm_tpu.train.optim import freeze_masked

    params = _fake_params()
    tx = freeze_masked(radam(1e-2), stage_trainable_mask(params, 2))
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    for _ in range(8):  # past rectification onset
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["stm"]["a"]), 1.0)  # frozen
    assert float(jnp.abs(params["fba"]["c"] - 1.0).max()) > 0        # trained


def test_model_names():
    cfg = get_cfg_defaults()
    for stage, name in ((1, "s1_OTVM_alpha"), (2, "s2_OTVM_alpha"),
                        (3, "s3_OTVM"), (4, "s4_OTVM")):
        cfg.train.stage = stage
        assert get_model_name(cfg) == name
