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


def test_wire_u8_out_is_png_quantization(joint_vars):
    """wire_u8_out shrinks the per-frame D2H fetch to serving's actual
    payload: alpha as uint8 (8x fewer bytes) and trimap as a uint8 argmax
    LABEL decoded to one-hot host-side (12x fewer bytes).  Alpha must
    equal quantizing the f32 outputs host-side — i.e. exactly what the
    reference pipeline measures after its uint8 PNG round trip
    (eval.py:136-144); trimap must equal one_hot(argmax(f32 probs)) — the
    reference never persists predicted probabilities (eval.py:136-144
    writes only alpha).  The memory-bank contents (hence the stream's
    trajectory) must be IDENTICAL: wire encoding happens after the bank
    update, outputs only.

    Tolerance note: wire_u8_out adds quantize ops to the jitted graph, so
    XLA may fuse the upstream f32 math differently (different-but-valid
    float results a few ULP apart).  An f32 value sitting exactly on a
    x.5/255 rounding boundary can then flip by one quantization step
    between the two compilations.  We therefore require every element to
    agree within 1/255 (one u8 LSB) and >=99.9% of elements to match
    EXACTLY — a real quantization bug (wrong scale, truncation instead of
    round, missing clip) breaks both bounds immediately."""
    stm_vars, fba_vars = joint_vars
    v = _mk_video(3, 4)
    base = EvalProtocol(memory_max_num=2, memory_skip_frame=3, scale=SCALE)
    a_f32, t_f32, _ = StreamingEvaluator(stm_vars, fba_vars, base).run_video(
        v["frames"], v["first_trimap"])
    wire = EvalProtocol(memory_max_num=2, memory_skip_frame=3, scale=SCALE,
                        wire_u8_out=True)
    a_u8, t_u8, _ = StreamingEvaluator(stm_vars, fba_vars, wire).run_video(
        v["frames"], v["first_trimap"])

    def _check(got, want_f32, what, i):
        want = np.round(np.clip(want_f32, 0, 1) * 255) / 255.0
        diff = np.abs(got.astype(np.float64) - want.astype(np.float64))
        # +1e-6: `got` decodes u8/255 in f32, `want` quantizes in f64 —
        # adjacent levels differ by 1/255 plus a few f32 ULP
        assert diff.max() <= 1.0 / 255.0 + 1e-6, \
            f"frame {i} {what}: max diff {diff.max()} > one u8 LSB"
        exact = float((diff == 0).mean())
        # 99%: the tiny random-weight test net puts ~0.2% of softmax probs
        # on rounding ties; a truncation/scale bug flips ~50% of elements
        assert exact >= 0.99, \
            f"frame {i} {what}: only {exact:.4%} elements exactly equal"

    for i in range(4):
        assert a_u8[i].dtype == np.float32  # decoded /255 host-side
        _check(a_u8[i], a_f32[i], "alpha", i)
        # trimap: one-hot of the f32 argmax.  ULP-level prob differences
        # between the two compilations can flip argmax only on near-ties,
        # so require >=99% pixel agreement (a wrong-axis/off-by-one label
        # bug disagrees on ~2/3 of pixels immediately).
        t = t_u8[i]
        assert t.shape == t_f32[i].shape and t.dtype == np.float32
        assert set(np.unique(t)) <= {0.0, 1.0}, "wire trimap must be one-hot"
        agree = float((t.argmax(-1) == t_f32[i].argmax(-1)).mean())
        assert agree >= 0.99, \
            f"frame {i} trimap: only {agree:.4%} labels agree with f32 argmax"


def test_evaluate_vm108_multistream_matches_single(joint_vars, monkeypatch):
    """The dataset-eval entry (`evaluate_vm108(..., streams=N)`, reachable
    via `eval.py --streams N`) must score EXACTLY what the serial per-clip
    protocol scores — grouping clips into concurrent streams changes
    throughput bookkeeping only, never a metric."""
    from otvm_tpu.eval import runner as R
    stm_vars, fba_vars = joint_vars

    vids = []
    for seed, n in ((1, 4), (2, 3), (3, 2)):   # 3 clips, 2 streams: one
        v = _mk_video(seed, n)                 # full group + a remainder
        rng = np.random.RandomState(100 + seed)
        v["gt_alpha"] = [rng.rand(H, W).astype(np.float32) for _ in range(n)]
        v["filenames"] = [f"{i:05d}.png" for i in range(n)]
        vids.append(v)

    def fake_iter(data_root, mode="val", dilate_radius=12):
        for v in vids:
            yield dict(v)

    monkeypatch.setattr(R, "iter_vm108_videos", fake_iter)
    proto = EvalProtocol(memory_max_num=2, memory_skip_frame=3, scale=SCALE)
    single = R.evaluate_vm108(
        StreamingEvaluator(stm_vars, fba_vars, proto), "unused")
    multi = R.evaluate_vm108(
        MultiStreamEvaluator(stm_vars, fba_vars, proto), "unused", streams=2)

    assert single["videos"] == multi["videos"] == 3
    for k in single:
        if k in ("fps", "videos"):
            continue
        assert multi[k] == single[k], \
            f"{k}: multistream {multi[k]} != single {single[k]}"


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
