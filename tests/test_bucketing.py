"""Resolution bucketing: EvalProtocol.pad_multiple bounds the number of
distinct padded shapes (= jit compiles of eval_frame_step) across a
mixed-resolution video set (VM108 has heterogeneous per-video sizes,
dataset.py:880-957).  Pure shape math — each unique padded (H, W) is one
compile by construction (flags are traced, the bank is fixed-shape)."""
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from otvm_tpu.eval.runner import _pad_frame, _unpad

# a VM108-like mix of frame sizes (min edge ~1088 protocol + stragglers)
SIZES = [(1080, 1920), (1088, 1920), (1088, 1632), (1092, 1940),
         (1090, 1922), (1080, 1912), (1088, 1636), (1082, 1930),
         (810, 1440), (816, 1442)]


def _padded_shapes(multiple):
    shapes = set()
    for h, w in SIZES:
        f, _, _ = _pad_frame(np.zeros((h, w, 3), np.float32), None, multiple)
        ph, pw = f.shape[:2]
        assert ph % multiple == 0 and pw % multiple == 0
        assert ph >= h and pw >= w
        shapes.add((ph, pw))
    return shapes


def test_bucketing_bounds_compiles():
    base = _padded_shapes(32)          # reference protocol: ~1 shape/video
    bucketed = _padded_shapes(128)
    assert len(bucketed) < len(base)
    assert len(bucketed) <= 4          # 10 videos -> <=4 compiles at /128


def test_pad_unpad_roundtrip_any_multiple():
    rng = np.random.RandomState(0)
    for multiple in (32, 64, 128):
        x = rng.rand(1082, 1919, 3).astype(np.float32)
        f, _, pad = _pad_frame(x, None, multiple)
        np.testing.assert_array_equal(_unpad(f, pad), x)


def test_trimap_padding_is_background():
    tri = np.zeros((100, 130, 3), np.float32)
    tri[..., 2] = 1.0                  # all-fg trimap
    _, t, pad = _pad_frame(np.zeros((100, 130, 3), np.float32), tri, 64)
    lw, uw, lh, uh = pad
    assert t.shape[:2] == (128, 192)
    # padding region is one-hot background
    np.testing.assert_array_equal(t[:lh, :, 0], 1.0)
    np.testing.assert_array_equal(t[:lh, :, 1:], 0.0)
    np.testing.assert_array_equal(t[:, :lw, 0], 1.0)
