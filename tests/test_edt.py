"""EDT + trimap clicks: device implementations vs the cv2 oracle
(utils/utils.py:25-39 semantics)."""
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

jax = pytest.importorskip("jax")
import functools

import jax.numpy as jnp

from otvm_tpu.nn import edt as _edt
from otvm_tpu.nn.edt import trimap_clicks_host

# jitted wrappers: eager per-op dispatch costs ~2 s/op on this image's
# axon-plugin CPU path (docs/BENCH_NOTES.md smoke note)
edt_sq_exact = jax.jit(_edt.edt_sq_exact)
edt_sq_jfa = jax.jit(_edt.edt_sq_jfa)
trimap_clicks = jax.jit(_edt.trimap_clicks, static_argnames=("exact",))


def _cv2_d2(seeds):
    import cv2
    inv = ((1.0 - seeds.astype(np.float32)) * 255).astype(np.uint8)
    return cv2.distanceTransform(inv, cv2.DIST_L2, 0).astype(np.float32) ** 2


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_edt_exact_matches_cv2(seed):
    rng = np.random.RandomState(seed)
    seeds = rng.rand(40, 56) > 0.98
    seeds[0, 0] = True  # ensure non-empty
    d2_ref = _cv2_d2(seeds)
    d2 = np.asarray(edt_sq_exact(jnp.asarray(seeds)))
    np.testing.assert_allclose(d2, d2_ref, atol=1e-3)


@pytest.mark.parametrize("seed", [0, 1])
def test_edt_jfa_matches_exact(seed):
    rng = np.random.RandomState(seed)
    seeds = rng.rand(48, 64) > 0.995
    seeds[10, 20] = True
    d_ref = np.sqrt(_cv2_d2(seeds))
    d = np.sqrt(np.asarray(edt_sq_jfa(jnp.asarray(seeds))))
    # JFA is allowed rare, tiny errors — bounded in *distance* units
    assert np.abs(d - d_ref).max() <= 1.0
    assert (np.abs(d - d_ref) > 1e-3).mean() < 0.01


def test_edt_no_seeds_gives_zero_clicks():
    tri = np.zeros((1, 16, 16, 2), np.float32)
    tri[..., 1] = 1.0  # fg everywhere, bg nowhere
    clicks = np.asarray(trimap_clicks(jnp.asarray(tri)))
    assert clicks[..., :3].max() == 0.0    # no bg seeds -> zero bg clicks
    assert clicks[..., 3:].min() == 1.0    # fg seeds everywhere -> d=0 -> 1


def test_clicks_device_vs_host():
    rng = np.random.RandomState(0)
    tri = np.zeros((2, 32, 40, 2), np.float32)
    tri[..., 0] = rng.rand(2, 32, 40) > 0.9
    tri[..., 1] = rng.rand(2, 32, 40) > 0.9
    host = trimap_clicks_host(tri)
    dev_exact = np.asarray(trimap_clicks(jnp.asarray(tri), exact=True))
    np.testing.assert_allclose(dev_exact, host, atol=1e-5)
    dev_jfa = np.asarray(trimap_clicks(jnp.asarray(tri), exact=False))
    np.testing.assert_allclose(dev_jfa, host, atol=5e-3)
