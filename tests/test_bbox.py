"""Box-math tests against numpy goldens with the reference's semantics
(sfd/bbox.py)."""
import numpy as np

import jax.numpy as jnp

from lipreading_video_generation_tpu.ops import bbox


def golden_nms(dets, thresh):
    """Reference greedy NMS (bbox.py:44-64)."""
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        ovr = w * h / (areas[i] + areas[order[1:]] - w * h)
        inds = np.where(ovr <= thresh)[0]
        order = order[inds + 1]
    return keep


def test_encode_decode_roundtrip(rng):
    priors = np.abs(rng.normal(100, 20, (50, 4))).astype(np.float32) + 10
    boxes = np.stack(
        [priors[:, 0] - 20, priors[:, 1] - 15, priors[:, 0] + 25, priors[:, 1] + 30], axis=1
    )
    enc = bbox.encode(jnp.asarray(boxes), jnp.asarray(priors))
    dec = np.asarray(bbox.decode(enc, jnp.asarray(priors)))
    np.testing.assert_allclose(dec, boxes, rtol=1e-4, atol=1e-2)


def test_decode_batched(rng):
    priors = np.abs(rng.normal(100, 10, (7, 4))).astype(np.float32) + 10
    loc = rng.normal(0, 0.5, (3, 7, 4)).astype(np.float32)
    full = np.asarray(bbox.decode(jnp.asarray(loc), jnp.asarray(priors)[None]))
    for b in range(3):
        single = np.asarray(bbox.decode(jnp.asarray(loc[b]), jnp.asarray(priors)))
        np.testing.assert_allclose(full[b], single, rtol=1e-5)


def test_nms_matches_reference(rng):
    n = 40
    centers = rng.uniform(50, 200, (n, 2))
    sizes = rng.uniform(20, 60, (n, 1))
    boxes = np.concatenate([centers - sizes, centers + sizes], axis=1).astype(np.float32)
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    dets = np.concatenate([boxes, scores[:, None]], axis=1)
    want = sorted(golden_nms(dets, 0.3))

    idx, valid = bbox.nms(jnp.asarray(boxes), jnp.asarray(scores), 0.3, max_keep=n)
    got = sorted(np.asarray(idx)[np.asarray(valid)].tolist())
    assert got == want


def test_nms_static_shape():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], dtype=jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    idx, valid = bbox.nms(boxes, scores, 0.3, max_keep=8)
    assert idx.shape == (8,) and valid.shape == (8,)
    kept = np.asarray(idx)[np.asarray(valid)]
    assert set(kept.tolist()) == {0, 2}


def test_anchor_grid():
    g = bbox.make_anchor_grid(2, 3, stride=4)
    assert g.shape == (6, 4)
    np.testing.assert_allclose(g[0], [2, 2, 16, 16])
    np.testing.assert_allclose(g[4], [6, 6, 16, 16])  # row 1, col 1


def test_dense_decode_scale(rng):
    cls = rng.normal(0, 1, (2, 4, 4, 2)).astype(np.float32)
    reg = rng.normal(0, 0.1, (2, 4, 4, 4)).astype(np.float32)
    boxes, scores = bbox.dense_decode_scale(jnp.asarray(cls), jnp.asarray(reg), stride=4)
    assert boxes.shape == (2, 16, 4)
    assert scores.shape == (2, 16)
    s = np.asarray(scores)
    assert (s >= 0).all() and (s <= 1).all()


def test_iou_matrix_golden(rng):
    a = np.asarray([[0, 0, 9, 9]], dtype=np.float32)       # 10x10 box (+1 conv)
    b = np.asarray([[0, 0, 9, 9], [5, 5, 14, 14], [20, 20, 29, 29]], dtype=np.float32)
    iou = np.asarray(bbox.iou_matrix(jnp.asarray(a), jnp.asarray(b)))[0]
    np.testing.assert_allclose(iou[0], 1.0, rtol=1e-6)
    np.testing.assert_allclose(iou[1], 25.0 / (100 + 100 - 25), rtol=1e-6)
    assert iou[2] == 0.0
