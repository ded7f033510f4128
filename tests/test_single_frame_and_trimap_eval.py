"""Smoke + semantics for the two auxiliary serving paths:
  * alpha_predict — single-frame FBA with a GIVEN trimap (stage-1/2 eval,
    BASELINE config[0])
  * trimap_eval_step — trimap-propagation-only streaming (stage-1 STM eval)
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from otvm_tpu.config import get_cfg_defaults
from otvm_tpu.models.memory import init_bank
from otvm_tpu.models.otvm import alpha_predict, trimap_eval_step
from otvm_tpu.models.stm import STM
from otvm_tpu.train.trainer import init_train_state

H, W = 64, 64


def _tri():
    tri = np.zeros((1, H, W, 3), np.float32)
    tri[..., 0] = 1
    tri[0, 16:48, 16:48] = (0, 1, 0)
    tri[0, 24:40, 24:40] = (0, 0, 1)
    return tri


def test_alpha_predict_stage1():
    cfg = get_cfg_defaults()
    cfg.train.stage = 1
    state = init_train_state(cfg, jax.random.PRNGKey(0), None, H, W)
    frame = jnp.asarray(np.random.RandomState(0).rand(1, H, W, 3), jnp.float32)
    alpha, pred7 = alpha_predict({"params": state.params["fba"]}, frame,
                                 jnp.asarray(_tri()), stage=1)
    assert alpha.shape == (1, H, W, 1) and pred7.shape == (1, H, W, 7)
    a = np.asarray(alpha)
    assert np.isfinite(a).all() and 0 <= a.min() and a.max() <= 1


def test_evaluator_stage_routing(tmp_path):
    """StreamingEvaluator with protocol.stage<=2 routes to the trimap-GIVEN
    per-frame path; TrimapEvaluator streams trimap propagation only —
    the eval.py --stage {1,2} / --trimap-net CLI paths."""
    from otvm_tpu.eval.runner import (EvalProtocol, StreamingEvaluator,
                                      TrimapEvaluator)

    cfg = get_cfg_defaults()
    cfg.train.stage = 1
    state = init_train_state(cfg, jax.random.PRNGKey(0), None, H, W)
    stm_vars = {"params": state.params["stm"], "batch_stats": state.batch_stats}
    fba_vars = {"params": state.params["fba"]}
    rng = np.random.RandomState(0)
    frames = [rng.rand(H, W, 3).astype(np.float32) for _ in range(3)]
    tri = _tri()[0]

    proto = EvalProtocol(stage=1)
    ev = StreamingEvaluator(stm_vars, fba_vars, proto)
    # per-frame GT trimaps -> every frame evaluated
    alphas, trimaps, _ = ev.run_video(frames, tri, gt_trimaps=[tri] * 3,
                                      out_dir=str(tmp_path / "a"))
    assert len(alphas) == 3 and alphas[0].shape == (H, W)
    # no per-frame trimaps -> only frame 0
    alphas1, _, _ = ev.run_video(frames, tri)
    assert len(alphas1) == 1
    np.testing.assert_allclose(alphas1[0], alphas[0])

    tev = TrimapEvaluator(stm_vars, EvalProtocol(stage=1, memory_skip_frame=3))
    trimaps, _ = tev.run_video(frames, tri, out_dir=str(tmp_path / "t"))
    assert len(trimaps) == 3 and trimaps[0].shape == (H, W, 3)
    np.testing.assert_allclose(trimaps[0], tri)  # first frame = GT


def test_trimap_eval_stream_policies():
    cfg = get_cfg_defaults()
    cfg.train.stage = 1
    state = init_train_state(cfg, jax.random.PRNGKey(1), None, H, W)
    stm_vars = {"params": state.params["stm"], "batch_stats": state.batch_stats}
    rng = np.random.RandomState(0)
    tri = jnp.asarray(_tri())
    frames = [jnp.asarray(rng.rand(1, H, W, 3), jnp.float32) for _ in range(8)]

    for memorize_gt in (False, True):
        bank = init_bank(1, (H // 16) * (W // 16), 2)
        for i, f in enumerate(frames):
            bank, pred = trimap_eval_step(
                stm_vars, bank, f, tri, jnp.asarray(i == 0),
                jnp.asarray(i % 3 == 0), max_memory_num=2,
                memorize_gt=memorize_gt)
            p = np.asarray(pred)
            assert np.isfinite(p).all()
            np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-4)  # softmax/GT
        assert int(bank.count) <= 2
