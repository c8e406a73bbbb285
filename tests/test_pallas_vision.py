"""Pallas vision kernels vs their jnp/XLA oracles (interpret mode on CPU).

The hand kernels (pallas_fast.py, pallas_lk.py) must be numerically
equivalent to the jnp formulations they replace on the TPU hot path.
"""
import numpy as np
import jax.numpy as jnp
import scipy.ndimage as ndi

from x_multi_agent_tpu.vision import fast, lk, pallas_fast, pallas_lk
from x_multi_agent_tpu.vision.image import scharr_gradients


def test_pallas_fast_matches_oracle(rng):
    img = jnp.asarray(rng.integers(0, 255, size=(120, 200)).astype(np.float32))
    ref = fast.nms3(fast.fast_score(img, 9.0))
    got = pallas_fast.fast_score_nms(img, 9.0, nms=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)

    ref_raw = fast.fast_score(img, 9.0)
    got_raw = pallas_fast.fast_score_nms(img, 9.0, nms=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got_raw), np.asarray(ref_raw), atol=0)


def test_pallas_fast_odd_dims(rng):
    # H not a multiple of tile_h, W not a multiple of 128
    img = jnp.asarray(rng.integers(0, 255, size=(77, 133)).astype(np.float32))
    ref = fast.nms3(fast.fast_score(img, 12.0))
    got = pallas_fast.fast_score_nms(img, 12.0, nms=True, tile_h=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)


def test_pallas_fast_batch_matches_oracle(rng):
    imgs = jnp.asarray(rng.integers(0, 255, size=(3, 77, 133)).astype(np.float32))
    import jax

    ref = jax.vmap(lambda im: fast.nms3(fast.fast_score(im, 10.0)))(imgs)
    got = pallas_fast.fast_score_nms_batch(
        imgs, 10.0, nms=True, tile_h=32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)


def test_pallas_lk_matches_level_oracle(rng):
    h, w = 96, 160
    img0 = np.asarray(
        ndi.gaussian_filter(rng.normal(size=(h, w)).astype(np.float32), 2.0)
    )
    img1 = np.asarray(ndi.shift(img0, (0.7, -1.3), order=3))
    img0 = jnp.asarray(img0)
    img1 = jnp.asarray(img1)
    k = 21  # not a multiple of the kernel's feature block
    pts = jnp.asarray(
        rng.uniform([20, 20], [w - 20, h - 20], size=(k, 2)).astype(np.float32)
    )
    guess = jnp.zeros((k, 2), jnp.float32)
    dx, dy = scharr_gradients(img0)
    f_ref, ok_ref = lk._track_level(img0, img1, dx, dy, pts, guess, 10, 10, 1e-4)
    f_pl, ok_pl = pallas_lk.track_level(
        img0, img1, dx, dy, pts, guess, 10, 10, 1e-4, interpret=True
    )
    np.testing.assert_allclose(np.asarray(f_pl), np.asarray(f_ref), atol=1e-4)
    assert bool((np.asarray(ok_pl) == np.asarray(ok_ref)).all())


def test_pallas_lk_full_pyramid_recovers_shift(rng):
    h, w = 128, 192
    base = ndi.gaussian_filter(
        rng.normal(size=(h, w)).astype(np.float32) * 50 + 128, 3.0
    )
    shift = (2.4, -3.1)  # (dy, dx)
    cur = ndi.shift(base, shift, order=3)
    pyr_prev = [jnp.asarray(base)]
    pyr_cur = [jnp.asarray(cur)]
    from x_multi_agent_tpu.vision.image import pyr_down

    for _ in range(2):
        pyr_prev.append(pyr_down(pyr_prev[-1]))
        pyr_cur.append(pyr_down(pyr_cur[-1]))
    k = 16
    pts = jnp.asarray(
        rng.uniform([30, 30], [w - 30, h - 30], size=(k, 2)).astype(np.float32)
    )
    valid = jnp.ones((k,), bool)

    import x_multi_agent_tpu.vision.pallas_lk as plk
    import x_multi_agent_tpu.vision.pallas_lk2 as plk2

    orig = plk.track_level
    orig2 = plk2.track_level
    plk.track_level = lambda *a, **kw: orig(*a, **kw, interpret=True)
    plk2.track_level = lambda *a, **kw: orig2(*a, **kw, interpret=True)
    try:
        pts_cur, ok = lk.track(pyr_prev, pyr_cur, pts, valid, use_pallas=True)
    finally:
        plk.track_level = orig
        plk2.track_level = orig2
    flow = np.asarray(pts_cur - pts)[np.asarray(ok)]
    assert flow.shape[0] >= k // 2
    # ndi.shift moves content BY (dy, dx): prev (x,y) appears at (x+dx, y+dy)
    true_flow = np.array([shift[1], shift[0]])
    np.testing.assert_allclose(np.median(flow, axis=0), true_flow, atol=0.1)
    # low-texture windows can pass the eigenvalue gate yet wander (real LK
    # behavior); require the bulk of features to land
    good = (np.abs(flow - true_flow) < 0.2).all(axis=1)
    assert good.mean() > 0.8


def test_pallas_lk2_matches_level_oracle(rng):
    """Lane-packed LK kernel (pallas_lk2) vs the jnp level oracle."""
    h, w = 96, 160
    img0 = np.asarray(
        ndi.gaussian_filter(rng.normal(size=(h, w)).astype(np.float32), 2.0)
    )
    img1 = np.asarray(ndi.shift(img0, (0.7, -1.3), order=3))
    img0 = jnp.asarray(img0)
    img1 = jnp.asarray(img1)
    k = 21  # not a multiple of the kernel's feature block
    pts = jnp.asarray(
        rng.uniform([20, 20], [w - 20, h - 20], size=(k, 2)).astype(np.float32)
    )
    guess = jnp.zeros((k, 2), jnp.float32)
    dx, dy = scharr_gradients(img0)
    f_ref, ok_ref = lk._track_level(img0, img1, dx, dy, pts, guess, 10, 10, 1e-4)
    from x_multi_agent_tpu.vision import pallas_lk2

    f_pl, ok_pl = pallas_lk2.track_level(
        img0, img1, dx, dy, pts, guess, 10, 10, 1e-4, interpret=True
    )
    np.testing.assert_allclose(np.asarray(f_pl), np.asarray(f_ref), atol=1e-4)
    assert bool((np.asarray(ok_pl) == np.asarray(ok_ref)).all())
