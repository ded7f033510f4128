"""E2E demo-path smoke: the dove fixture (11 frames, one first-frame trimap)
through the streaming evaluator with random weights — validates decode,
trimap png parsing, /32 padding, bank plumbing, PNG writing, viz."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
jax = pytest.importorskip("jax")

DOVE = "/root/reference/demo"


@pytest.mark.skipif(not os.path.isdir(DOVE), reason="dove fixture not present")
def test_dove_demo_stream(tmp_path):
    from otvm_tpu.config import get_cfg_defaults
    from otvm_tpu.eval.runner import (EvalProtocol, StreamingEvaluator,
                                      iter_demo_videos)
    from otvm_tpu.train.trainer import init_train_state

    vids = list(iter_demo_videos(DOVE))
    assert len(vids) == 1 and vids[0]["seq_name"] == "dove"
    vid = vids[0]
    assert len(vid["frames"]) == 11
    tri = vid["first_trimap"]
    np.testing.assert_allclose(tri.sum(-1), 1.0)  # decoded one-hot

    # downscale to keep the single-core run cheap; /32-unfriendly size on
    # purpose to exercise padding
    frames = [cv2.resize(f, (150, 90)) for f in vid["frames"][:4]]
    tri_small_lbl = cv2.resize(np.argmax(tri, -1).astype(np.uint8), (150, 90),
                               interpolation=cv2.INTER_NEAREST)
    tri_small = np.eye(3, dtype=np.float32)[tri_small_lbl]

    cfg = get_cfg_defaults()
    cfg.train.stage = 4
    state = init_train_state(cfg, jax.random.PRNGKey(0), None, 64, 64)
    ev = StreamingEvaluator(
        {"params": state.params["stm"], "batch_stats": state.batch_stats},
        {"params": state.params["fba"]},
        EvalProtocol(memory_max_num=2, memory_skip_frame=3))

    out_dir = str(tmp_path / "pred")
    viz_dir = str(tmp_path / "viz")
    alphas, trimaps, fps = ev.run_video(frames, tri_small, out_dir=out_dir,
                                        filenames=vid["filenames"][:4],
                                        viz_dir=viz_dir)
    assert len(alphas) == 4
    for a, t in zip(alphas, trimaps):
        assert a.shape == (90, 150) and t.shape == (90, 150, 3)
        assert np.isfinite(a).all() and 0 <= a.min() and a.max() <= 1
    # outputs written with the source names
    assert sorted(os.listdir(out_dir))[0] == "00000.png"
    assert os.path.exists(os.path.join(viz_dir, "f00000.jpg"))
