"""Data pipeline tests on synthetic fixtures (no DIM/VM108 on disk):
directory layouts, sampling, aug chain, trimap synthesis, loader sharding."""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

cv2 = pytest.importorskip("cv2")

from otvm_tpu.data import augs
from otvm_tpu.data.datasets import DIMTrain, VM108Train, vm108_max_skip_for_epoch
from otvm_tpu.data.loader import Loader, epoch_indices
from otvm_tpu.data.trimap import trimap_from_alpha, trimap_from_png


def _circle_alpha(h, w, r_frac=0.3):
    yy, xx = np.mgrid[:h, :w]
    d = np.sqrt((yy - h / 2) ** 2 + (xx - w / 2) ** 2)
    r = r_frac * min(h, w)
    return np.clip((r - d) / 8 + 0.5, 0, 1).astype(np.float32)


@pytest.fixture(scope="module")
def dim_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dim")
    base = root / "Combined_Dataset" / "Training_set"
    fgd = base / "Adobe-licensed images" / "fg"
    ald = base / "Adobe-licensed images" / "alpha"
    bgd = base / "train2014"
    for d in (fgd, ald, bgd):
        d.mkdir(parents=True)
    rng = np.random.RandomState(0)
    names = []
    for i in range(2):
        name = f"fg{i}.png"
        names.append(name)
        cv2.imwrite(str(fgd / name), rng.randint(0, 255, (400, 480, 3), np.uint8))
        cv2.imwrite(str(ald / name), (_circle_alpha(400, 480) * 255).astype(np.uint8))
    for i in range(3):
        cv2.imwrite(str(bgd / f"bg{i}.jpg"), rng.randint(0, 255, (400, 500, 3), np.uint8))
    (base / "training_fg_names.txt").write_text("\n".join(names))
    return str(root)


@pytest.fixture(scope="module")
def vm108_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vm108")
    base = root / "VideoMatting108"
    rng = np.random.RandomState(1)
    corr = {}
    for seq in ("vidA", "vidB"):
        (base / "FG_done" / seq).mkdir(parents=True, exist_ok=True)
        (base / "BG_done2" / seq).mkdir(parents=True, exist_ok=True)
        for i in range(12):
            fn = f"{seq}/{i:05d}.png"
            rgba = np.dstack([rng.randint(0, 255, (360, 440, 3), np.uint8),
                              (_circle_alpha(360, 440, 0.2 + 0.01 * i) * 255).astype(np.uint8)])
            cv2.imwrite(str(base / "FG_done" / fn), rgba)
            cv2.imwrite(str(base / "BG_done2" / fn),
                        rng.randint(0, 255, (360, 440, 3), np.uint8))
            corr[fn] = fn
    (base / "frame_corr.json").write_text(json.dumps(corr))
    (base / "train_videos.txt").write_text("vidA\nvidB")
    (base / "val_videos.txt").write_text("vidB")
    return str(root)


def _check_sample(s, S=3, H=160, W=160):
    assert s["fg"].shape == (S, H, W, 3) and s["fg"].dtype == np.float32
    assert s["bg"].shape == (S, H, W, 3)
    assert s["alpha"].shape == (S, H, W, 1)
    assert s["tri"].shape == (S, H, W, 3)
    assert 0.0 <= s["fg"].min() and s["fg"].max() <= 1.0
    assert 0.0 <= s["alpha"].min() and s["alpha"].max() <= 1.0
    # one-hot trimap
    np.testing.assert_allclose(s["tri"].sum(-1), 1.0)
    assert set(np.unique(s["tri"])) <= {0.0, 1.0}


def test_dim_dataset(dim_root):
    ds = DIMTrain.from_adobe_layout(dim_root, image_shape=(160, 160))
    assert len(ds) == 2
    s = ds.__getitem__(0, np.random.RandomState(0))
    _check_sample(s)


def test_vm108_dataset(vm108_root):
    ds = VM108Train(vm108_root, image_shape=(160, 160), max_skip=3)
    assert len(ds) == 2
    s = ds.__getitem__(0, np.random.RandomState(0))
    _check_sample(s)


def test_vm108_curriculum():
    assert vm108_max_skip_for_epoch(0) == 5
    assert vm108_max_skip_for_epoch(60) == 15
    assert vm108_max_skip_for_epoch(150) == 25


def test_loader_sharding(dim_root):
    ds = DIMTrain.from_adobe_layout(dim_root, image_shape=(160, 160))
    # per-process strided shard covers everything exactly once
    shards = [epoch_indices(len(ds), epoch=3, repeats=4,
                            process_index=p, process_count=2) for p in range(2)]
    joined = np.sort(np.concatenate(shards))
    np.testing.assert_array_equal(joined, np.sort(np.tile(np.arange(2), 4)))
    # same epoch seed -> same permutation on both processes
    full = [epoch_indices(len(ds), epoch=3, repeats=4) for _ in range(2)]
    np.testing.assert_array_equal(full[0], full[1])

    loader = Loader(ds, shards[0], batch_size=2, seed=0)
    batches = list(loader)
    assert len(batches) == len(loader) == 2
    assert batches[0]["fg"].shape == (2, 3, 160, 160, 3)


def test_loader_thread_count_invariant(dim_root):
    """N worker threads must yield byte-identical batches, in the same
    order, as 1 thread (per-sample RNG is keyed on global position, the
    reorder buffer restores order).  Reference: workers=8/rank,
    train.py:294-301."""
    ds = DIMTrain.from_adobe_layout(dim_root, image_shape=(160, 160))
    idx = epoch_indices(len(ds), epoch=0, repeats=6)
    ref = list(Loader(ds, idx, batch_size=2, seed=7, num_threads=1))
    for n in (2, 4):
        got = list(Loader(ds, idx, batch_size=2, seed=7, num_threads=n))
        assert len(got) == len(ref)
        for b_ref, b_got in zip(ref, got):
            for k in b_ref:
                np.testing.assert_array_equal(b_ref[k], b_got[k])


def test_loader_error_propagates():
    class Boom:
        def __getitem__(self, idx, rnd):
            raise RuntimeError("decode failed")

    with pytest.raises(RuntimeError, match="decode failed"):
        list(Loader(Boom(), [0, 1], batch_size=1, num_threads=2))


def test_eval_frame_window_mode():
    """EvalDataset num_frames>1 (dataset.py:922-957): centered window,
    edge-clipped, center frame names the output."""
    from otvm_tpu.eval.runner import frame_window_indices, load_frame_window

    np.testing.assert_array_equal(frame_window_indices(0, 3, 10), [0, 0, 1])
    np.testing.assert_array_equal(frame_window_indices(5, 3, 10), [4, 5, 6])
    np.testing.assert_array_equal(frame_window_indices(9, 3, 10), [8, 9, 9])
    np.testing.assert_array_equal(frame_window_indices(5, 2, 10), [4, 5])

    frames = [np.full((4, 4, 3), i, np.float32) for i in range(10)]
    win, center = load_frame_window(frames, 5, 3)
    assert win.shape == (3, 4, 4, 3) and center == 5
    np.testing.assert_array_equal(win[:, 0, 0, 0], [4, 5, 6])


def test_trimap_from_alpha_widths():
    a = _circle_alpha(120, 120)
    narrow = trimap_from_alpha(a, 5)[..., 1].sum()
    wide = trimap_from_alpha(a, 20)[..., 1].sum()
    assert wide > narrow > 0


def test_trimap_from_png_gray_and_color():
    g = np.zeros((32, 32), np.uint8)
    g[8:24, 8:24] = 128
    g[12:20, 12:20] = 255
    t = trimap_from_png(g)
    assert t[0, 0, 0] == 1 and t[10, 10, 1] == 1 and t[16, 16, 2] == 1
    np.testing.assert_allclose(t.sum(-1), 1.0)


def test_match_histograms_moves_distribution():
    rng = np.random.RandomState(0)
    src = rng.rand(2, 32, 32, 3).astype(np.float32) * 100
    ref = rng.rand(2, 32, 32, 3).astype(np.float32) * 100 + 150
    out = augs.match_histograms(src, ref)
    assert abs(out.mean() - ref.mean()) < abs(src.mean() - ref.mean())


def test_random_transform_shapes():
    rnd = np.random.RandomState(0)
    img = np.random.rand(64, 64, 3).astype(np.float32) * 255
    mask = np.ones((64, 64), np.float32)
    out = augs.random_transform([img, mask], rnd, rt=25, sh=15,
                                zm=(0.9, 1.1), cs=10.0)
    assert out[0].shape == img.shape and out[1].shape == mask.shape


def test_wire_codec_roundtrip():
    """encode_wire/decode_wire: uint8 on the wire (slow-tunnel hosts),
    exact one-hot trimap recovery, <=0.5/255 image quantization."""
    import jax.numpy as jnp
    import numpy as np

    from otvm_tpu.data.loader import decode_wire, encode_wire

    rng = np.random.RandomState(0)
    lab = rng.randint(0, 3, (2, 3, 16, 16))
    sample = dict(
        fg=rng.rand(2, 3, 16, 16, 3).astype(np.float32),
        bg=rng.rand(2, 3, 16, 16, 3).astype(np.float32),
        alpha=rng.rand(2, 3, 16, 16, 1).astype(np.float32),
        tri=np.eye(3, dtype=np.float32)[lab],
    )
    wire = encode_wire(sample)
    assert all(wire[k].dtype == np.uint8 for k in ("fg", "bg", "alpha", "tri"))
    assert wire["tri"].shape == lab.shape
    dec = decode_wire({k: jnp.asarray(v) for k, v in wire.items()})
    np.testing.assert_array_equal(np.asarray(dec["tri"]), sample["tri"])
    for k in ("fg", "bg", "alpha"):
        np.testing.assert_allclose(np.asarray(dec[k]), sample[k],
                                   atol=0.5 / 255 + 1e-6)
    # float batches pass through untouched
    dec2 = decode_wire({k: jnp.asarray(v) for k, v in sample.items()})
    np.testing.assert_array_equal(np.asarray(dec2["fg"]), sample["fg"])
