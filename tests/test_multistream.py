"""Multi-stream serving (MultiStreamEvaluator): the round-robin B=1
interleave must be stream-isolated and protocol-aligned — every stream's
outputs identical to running that stream alone through StreamingEvaluator
(the reference's serial per-video loop, eval.py:117-242).

Uses the width/depth-scaled (scale=4) model so the whole test compiles in
the smoke tier on a 1-core host; the interleaving/bank logic under test is
width-independent (same argument as tests/test_dryrun_scale.py)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from otvm_tpu.config import get_cfg_defaults
from otvm_tpu.eval.runner import (EvalProtocol, MultiStreamEvaluator,
                                  StreamingEvaluator)
from otvm_tpu.train.trainer import init_train_state

pytestmark = pytest.mark.smoke

H, W, SCALE = 32, 64, 4


@pytest.fixture(scope="module")
def joint_vars():
    cfg = get_cfg_defaults()
    cfg.train.stage = 4
    cfg.model_scale = SCALE
    state = init_train_state(cfg, jax.random.PRNGKey(0), None, H, W)
    stm_vars = {"params": state.params["stm"], "batch_stats": state.batch_stats}
    fba_vars = {"params": state.params["fba"]}
    return stm_vars, fba_vars


def _mk_video(seed, n_frames):
    rng = np.random.RandomState(seed)
    frames = [rng.rand(H, W, 3).astype(np.float32) for _ in range(n_frames)]
    tri = np.zeros((H, W, 3), np.float32)
    tri[..., 0] = 1
    tri[8:24, 16:48] = (0, 1, 0)
    tri[12:20, 24:40] = (0, 0, 1)
    return dict(frames=frames, first_trimap=tri, seq_name=f"v{seed}")


def test_multistream_matches_solo(joint_vars):
    stm_vars, fba_vars = joint_vars
    proto = EvalProtocol(memory_max_num=2, memory_skip_frame=3, scale=SCALE)

    # different lengths exercise the "stream finishes early" path; videos 1
    # and 2 share content to pin down cross-stream leakage
    videos = [_mk_video(1, 5), _mk_video(2, 3), _mk_video(1, 5)]

    multi = MultiStreamEvaluator(stm_vars, fba_vars, proto)
    results, agg_fps = multi.run_videos(videos)
    assert agg_fps > 0
    assert [len(a) for a, _ in results] == [5, 3, 5]

    solo = StreamingEvaluator(stm_vars, fba_vars, proto)
    for k, v in enumerate(videos):
        alphas, trimaps, _ = solo.run_video(v["frames"], v["first_trimap"])
        for i in range(len(v["frames"])):
            np.testing.assert_array_equal(
                results[k][0][i], alphas[i],
                err_msg=f"stream {k} frame {i} alpha != solo run")
            np.testing.assert_array_equal(
                results[k][1][i], trimaps[i],
                err_msg=f"stream {k} frame {i} trimap != solo run")

    # identical input streams must produce identical outputs (isolation)
    for i in range(5):
        np.testing.assert_array_equal(results[0][0][i], results[2][0][i])


def test_bf16_wire_serving(joint_vars):
    """bf16 serving over the uint8 wire must compile and produce finite
    alphas.  Regression: the in-jit /255 decode used to produce f32
    unconditionally, so with a bf16 bank/trimap the lax.cond trimap
    branches (GT vs segment) had mismatched dtypes and the wire+bf16
    combination — the production serving config — failed to trace."""
    stm_vars, fba_vars = joint_vars
    proto = EvalProtocol(memory_max_num=2, memory_skip_frame=3, scale=SCALE,
                         dtype="bf16")
    ev = StreamingEvaluator(stm_vars, fba_vars, proto)
    v = _mk_video(7, 3)
    alphas, trimaps, fps = ev.run_video(v["frames"], v["first_trimap"])
    assert len(alphas) == 3 and fps > 0
    for a in alphas:
        assert np.isfinite(a).all()
        assert a.dtype == np.float32  # outputs are returned fp32


def test_multistream_protocol_flags():
    """The per-stream flag schedule is exactly the single-stream protocol
    (memorize cadence + large-input handling are per-stream properties)."""
    proto = EvalProtocol(memory_max_num=5, memory_skip_frame=10)
    flags_a, max_a, _ = proto.flags(12, 256, 256)
    # what MultiStreamEvaluator computes per session is the same call
    assert flags_a == [((i == 0), (i % 10 == 0), (i == 11)) for i in range(12)]
    assert max_a == 5
    # large-input stream halves ITS bank and doubles ITS skip only
    flags_b, max_b, large = proto.flags(12, 1200, 1920)
    assert large and max_b == 2
    assert [m for _, m, _ in flags_b] == [(i % 20 == 0) for i in range(12)]
