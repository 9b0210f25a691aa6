"""Image-op tests: OpenCV goldens where parity matters (tolerance-based),
shape/semantic checks elsewhere."""
import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_video_generation_tpu.ops import image as im


def _img(rng, h=48, w=48, c=3):
    return rng.integers(0, 256, (h, w, c), dtype=np.uint8)


def test_resize_bilinear_close_to_cv2(rng):
    # smooth image: antialiased (ours) vs non-antialiased (cv2) downscale agree
    yy, xx = np.mgrid[0:96, 0:96].astype(np.float32)
    x = np.stack([yy * 2, xx * 2, (yy + xx)], axis=-1).astype(np.uint8)
    got = np.asarray(im.resize(jnp.asarray(x), (48, 48), "bilinear")).astype(np.int32)
    want = cv2.resize(x, (48, 48), interpolation=cv2.INTER_LINEAR).astype(np.int32)
    assert np.mean(np.abs(got - want)) < 2.0


def test_resize_upscale_matches_cv2(rng):
    x = _img(rng, 24, 24)
    got = np.asarray(im.resize(jnp.asarray(x), (48, 48), "bilinear")).astype(np.int32)
    want = cv2.resize(x, (48, 48), interpolation=cv2.INTER_LINEAR).astype(np.int32)
    assert np.mean(np.abs(got - want)) < 2.0


def test_normalize_roundtrip(rng):
    x = _img(rng)
    n = im.normalize_uint8(jnp.asarray(x), symmetric=True)
    assert np.asarray(n).min() >= -1 and np.asarray(n).max() <= 1
    back = np.asarray(im.denormalize_to_uint8(n, symmetric=True))
    np.testing.assert_array_equal(back, x)


def test_mask_lower_half():
    x = jnp.ones((2, 96, 96, 3))
    m = np.asarray(im.mask_lower_half(x))
    assert m[:, :48].min() == 1.0
    assert m[:, 48:].max() == 0.0


def test_concat_reference_shapes():
    a = jnp.zeros((4, 96, 96, 3))
    b = jnp.ones((4, 96, 96, 3))
    out = im.concat_reference(a, b)
    assert out.shape == (4, 96, 96, 6)


def test_crop_and_resize_identity(rng):
    x = _img(rng, 32, 32).astype(np.float32)
    box = jnp.asarray([0.0, 32.0, 0.0, 32.0])
    got = np.asarray(im.crop_and_resize(jnp.asarray(x), box, (32, 32)))
    np.testing.assert_allclose(got, x, atol=1e-3)


def test_crop_and_resize_subregion(rng):
    x = _img(rng, 64, 64).astype(np.float32)
    box = jnp.asarray([16.0, 48.0, 8.0, 40.0])
    got = np.asarray(im.crop_and_resize(jnp.asarray(x), box, (32, 32)))
    np.testing.assert_allclose(got, x[16:48, 8:40], atol=1e-3)


def test_center_crop():
    x = jnp.zeros((5, 100, 120, 1))
    out = im.center_crop(x, (88, 88))
    assert out.shape == (5, 88, 88, 1)


def test_random_crop_in_bounds(rng):
    x = jnp.asarray(_img(rng, 64, 64).astype(np.float32))
    out = im.random_crop(jax.random.key(0), x, 32)
    assert out.shape == (32, 32, 3)


def test_expand_box_to_min_size():
    box = jnp.asarray([10, 20, 30, 40])  # 11x11 box
    out = np.asarray(im.expand_box_to_min_size(box, 48, 48))
    assert out[1] - out[0] + 1 >= 48
    assert out[3] - out[2] + 1 >= 48
    # symmetric-ish expansion around original center, matching preprocess.py:70-78
    assert out[0] < 10 and out[1] > 20


def test_rgb_lab_roundtrip(rng):
    x = _img(rng, 16, 16).astype(np.float32)
    lab = im.rgb_to_lab(jnp.asarray(x))
    back = np.asarray(im.lab_to_rgb(lab))
    assert np.mean(np.abs(back - x)) < 1.5


def test_rgb_to_lab_close_to_cv2(rng):
    x = _img(rng, 16, 16)
    got = np.asarray(im.rgb_to_lab(jnp.asarray(x)))
    want = cv2.cvtColor(x, cv2.COLOR_RGB2LAB).astype(np.float32)
    assert np.mean(np.abs(got - want)) < 3.0


def test_clahe_close_to_cv2(rng):
    x = rng.integers(0, 256, (48, 48), dtype=np.uint8)
    got = np.asarray(im.clahe(jnp.asarray(x), clip_limit=2.0, grid=(8, 8))).astype(np.int32)
    want = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(x).astype(np.int32)
    assert np.mean(np.abs(got - want)) < 8


def test_clahe_pallas_matches_xla(rng):
    """The fused Pallas kernel (interpret mode here) computes the same
    CLAHE as the XLA reference path: exact histograms/CDF/LUT, bf16 blend
    quantization only (≤1 gray level after rounding on either side)."""
    from lipreading_video_generation_tpu.ops.clahe_pallas import (
        clahe_pallas,
        clahe_supported,
    )

    for shape, grid in [((48, 48), (8, 8)), ((2, 48, 48), (8, 8)),
                        ((50, 46), (8, 8)), ((64, 64), (4, 4))]:
        assert clahe_supported(shape[-2], shape[-1], grid)
        x = rng.integers(0, 256, shape, dtype=np.uint8)
        ref = np.asarray(im.clahe(jnp.asarray(x), 2.0, grid)).astype(np.int32)
        got = np.asarray(
            clahe_pallas(jnp.asarray(x), 2.0, grid, interpret=True)
        ).astype(np.int32)
        d = np.abs(ref - got)
        assert d.max() <= 2 and (d > 1).mean() < 0.01, (shape, grid, d.max())


def test_clahe_pallas_close_to_cv2(rng):
    from lipreading_video_generation_tpu.ops.clahe_pallas import clahe_pallas

    x = rng.integers(0, 256, (48, 48), dtype=np.uint8)
    got = np.asarray(clahe_pallas(jnp.asarray(x), 2.0, (8, 8),
                                  interpret=True)).astype(np.int32)
    want = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(x).astype(np.int32)
    assert np.mean(np.abs(got - want)) < 8


def test_clahe_improves_contrast(rng):
    # low-contrast image: CLAHE must widen the histogram
    x = (rng.integers(100, 140, (64, 64))).astype(np.uint8)
    out = np.asarray(im.clahe(jnp.asarray(x), clip_limit=2.0))
    assert out.std() > float(np.asarray(x).std())


def test_contrast_boost_preserves_shape_dtype(rng):
    x = _img(rng, 48, 48)
    out = np.asarray(im.contrast_boost(jnp.asarray(x)))
    assert out.shape == x.shape and out.dtype == np.uint8


def test_canny_finds_edges():
    x = np.zeros((64, 64), dtype=np.float32)
    x[:, 32:] = 255.0
    edges = np.asarray(im.canny_edges(jnp.asarray(x)))
    assert edges.dtype == np.uint8
    col = edges[:, 30:34].max(axis=1)
    assert (col == 255).mean() > 0.9  # edge detected along the boundary
    assert edges[:, :28].max() == 0 and edges[:, 36:].max() == 0


def test_lucas_kanade_tracks_translation(rng):
    base = rng.standard_normal((64, 64)).astype(np.float32)
    base = cv2.GaussianBlur(base, (7, 7), 2.0) * 50 + 128
    shifted = np.roll(base, (2, 3), axis=(0, 1))  # dy=2, dx=3
    pts = np.array([[20.0, 20.0], [32.0, 40.0], [40.0, 25.0]])
    new_pts, ok = im.lucas_kanade_flow(jnp.asarray(base), jnp.asarray(shifted), jnp.asarray(pts))
    new_pts = np.asarray(new_pts)
    assert np.asarray(ok).all()
    np.testing.assert_allclose(new_pts - pts, np.tile([[3.0, 2.0]], (3, 1)), atol=0.5)


def test_smooth_boxes_matches_reference_semantics():
    """get_smoothened_boxes at inference.py:61-68."""
    boxes = np.arange(40, dtype=np.float32).reshape(10, 4)
    T = 5

    def ref(boxes, T):
        out = boxes.copy()
        for i in range(len(out)):
            if i + T > len(out):
                window = boxes[len(out) - T :]
            else:
                window = boxes[i : i + T]
            out[i] = np.mean(window, axis=0)
        return out

    got = np.asarray(im.smooth_boxes(jnp.asarray(boxes), T))
    np.testing.assert_allclose(got, ref(boxes, T), rtol=1e-6)
