"""Pin reference_iou to the reference's in-training IoU aggregation
(train_s1_trimap.py:287-303): per-(sample,frame) IoU with 1e-4 smoothing,
mean over batch x frames per class, macro over classes, x100.
VERDICT r3 weak #8: this exactness was claimed but never enforced."""
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from otvm_tpu.eval.metrics import reference_iou


def test_hand_computed_fixture():
    # 2x2 maps, one sample, one frame, 3 classes
    p = np.array([[[0, 1], [2, 2]]])[:, None]   # [B=1, S=1, 2, 2]
    g = np.array([[[0, 1], [1, 2]]])[:, None]
    # class 0: i=1,u=1 -> (1+1e-4)/(1+1e-4)=1
    # class 1: i=1,u=2 -> (1+1e-4)/(2+1e-4)
    # class 2: i=1,u=2 -> same
    c0 = 100.0
    c12 = (1 + 1e-4) / (2 + 1e-4) * 100.0
    expect = (c0 + 2 * c12) / 3
    np.testing.assert_allclose(reference_iou(p, g), expect, rtol=1e-12)


def test_absent_class_scores_100():
    # neither pred nor gt contain class 2 -> i=u=0 -> smoothing gives 1.0
    p = np.zeros((1, 1, 4, 4), np.int64)
    g = np.zeros((1, 1, 4, 4), np.int64)
    # class 0: perfect (100); classes 1,2 absent (100 each)
    np.testing.assert_allclose(reference_iou(p, g), 100.0, rtol=1e-9)


def test_per_sample_macro_not_global():
    """The reference averages per-(sample,frame) ratios, NOT pooled
    intersections/unions — a sample where a class is absent contributes a
    smoothed 1.0, pulling the mean differently than global pooling."""
    p = np.stack([np.zeros((2, 2), np.int64), np.ones((2, 2), np.int64)])[None]
    g = np.stack([np.zeros((2, 2), np.int64), np.zeros((2, 2), np.int64)])[None]
    # frame 0: pred=gt=all class0 -> c0 iou 1
    # frame 1: pred all class1, gt all class0 -> c0: i=0,u=4; c1: i=0,u=4
    s = 1e-4
    c0 = np.mean([(4 + s) / (4 + s), (0 + s) / (4 + s)]) * 100
    c1 = np.mean([(0 + s) / (0 + s), (0 + s) / (4 + s)]) * 100
    c2 = 100.0   # absent in both frames
    np.testing.assert_allclose(reference_iou(p, g), (c0 + c1 + c2) / 3, rtol=1e-9)


def test_matches_reference_torch_formula():
    """Direct comparison against the reference IoU() on random one-hot maps
    (train_s1_trimap.py:287-303, loaded from /root/reference)."""
    torch = pytest.importorskip("torch")

    # importing the reference entry point drags in yacs/imgaug (not in this
    # image); exec just the IoU() function's literal source instead
    src = open("/root/reference/train_s1_trimap.py").read()
    start = src.index("def IoU(")
    end = src.index("\nif __name__", start)
    ns = {"torch": torch}
    exec(compile(src[start:end], "ref_train_s1_trimap_IoU", "exec"), ns)
    ref_iou_fn = ns["IoU"]

    rng = np.random.RandomState(0)
    p_lab = rng.randint(0, 3, (2, 3, 8, 8))
    g_lab = rng.randint(0, 3, (2, 3, 8, 8))
    eye = np.eye(3, dtype=np.float32)
    # reference takes [B, S, C, H, W] soft maps and argmaxes over C
    p_soft = torch.from_numpy(eye[p_lab].transpose(0, 1, 4, 2, 3).copy())
    g_soft = torch.from_numpy(eye[g_lab].transpose(0, 1, 4, 2, 3).copy())
    ref_mean, _ = ref_iou_fn(p_soft, g_soft)
    ours = reference_iou(p_lab, g_lab)
    np.testing.assert_allclose(ours, ref_mean, rtol=1e-6)
