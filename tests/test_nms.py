import jax.numpy as jnp
import numpy as np

from detectinblur_tpu.ops.nms import nms, batched_nms, NEG_INF


def numpy_nms_oracle(boxes, scores, thresh):
    """Reference greedy NMS (torchvision semantics) in plain numpy."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i] or scores[i] <= -1e30:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        a = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        ai = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        iou = inter / np.maximum(ai + a - inter, 1e-12)
        suppressed |= iou > thresh
    return keep


def _rand_boxes(rng, n, size=100):
    b = rng.random((n, 4)).astype(np.float32) * size
    b[:, 2:] = b[:, :2] + 1 + b[:, 2:] * 0.3
    return b


def test_nms_matches_oracle(rng):
    boxes = _rand_boxes(rng, 60)
    scores = rng.random(60).astype(np.float32)
    idxs, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 60)
    ours = list(np.asarray(idxs)[np.asarray(valid)])
    oracle = numpy_nms_oracle(boxes, scores, 0.5)
    assert ours == oracle


def test_nms_respects_max_outputs(rng):
    boxes = _rand_boxes(rng, 50)
    scores = rng.random(50).astype(np.float32)
    idxs, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.9, 5)
    assert idxs.shape == (5,)
    oracle = numpy_nms_oracle(boxes, scores, 0.9)[:5]
    assert list(np.asarray(idxs)[np.asarray(valid)]) == oracle


def test_nms_padding_masked_out(rng):
    boxes = _rand_boxes(rng, 20)
    scores = rng.random(20).astype(np.float32)
    scores[10:] = float(NEG_INF)  # padded entries
    idxs, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 20)
    picked = np.asarray(idxs)[np.asarray(valid)]
    assert (picked < 10).all()
    oracle = numpy_nms_oracle(boxes[:10], scores[:10], 0.5)
    assert list(picked) == oracle


def test_nms_max_outputs_exceeds_candidates(rng):
    # max_outputs > N must pad (not trace-error): e.g. a single-map
    # backbone on a small bucket vs post_nms_top_n_train=2000.
    boxes = _rand_boxes(rng, 12)
    scores = rng.random(12).astype(np.float32)
    idxs, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 40)
    assert idxs.shape == (40,) and valid.shape == (40,)
    oracle = numpy_nms_oracle(boxes, scores, 0.5)
    assert list(np.asarray(idxs)[np.asarray(valid)]) == oracle
    assert not np.asarray(valid)[len(oracle):].any()


def test_nms_zero_area_boxes_terminate():
    boxes = jnp.zeros((4, 4))
    scores = jnp.array([0.9, 0.8, 0.7, 0.6])
    idxs, valid = nms(boxes, scores, 0.5, 4)
    # Zero-area boxes never suppress each other (IoU 0) but each gets
    # consumed exactly once.
    assert sorted(np.asarray(idxs)[np.asarray(valid)].tolist()) == [0, 1, 2, 3]


def test_batched_nms_keeps_classes_separate(rng):
    # Identical boxes in different categories must all survive.
    box = np.array([[10.0, 10, 20, 20]], np.float32)
    boxes = np.repeat(box, 3, axis=0)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    cats = np.array([0, 1, 2])
    idxs, valid = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cats), 0.5, 3
    )
    assert np.asarray(valid).all()
    # Same category -> only the top survives.
    idxs2, valid2 = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.zeros(3, jnp.int32), 0.5, 3
    )
    assert np.asarray(valid2).sum() == 1
    assert np.asarray(idxs2)[0] == 0


def test_grouped_nms_matches_batched(rng):
    """grouped_nms_presorted == batched_nms with group ids: same survivors,
    same output order, on several random grouped candidate sets (incl.
    NEG_INF padding tails and mid-group masked entries)."""
    from detectinblur_tpu.ops.nms import grouped_nms_presorted

    for trial in range(4):
        G, K = 3, 40
        boxes = np.stack([_rand_boxes(rng, K) for _ in range(G)])
        scores = rng.random((G, K)).astype(np.float32)
        # Per-group descending (the precondition); then mask some entries.
        order = np.argsort(-scores, axis=1, kind="stable")
        scores = np.take_along_axis(scores, order, axis=1)
        boxes = np.take_along_axis(boxes, order[..., None], axis=1)
        scores[:, K - 5 :] = float(NEG_INF)            # padding tails
        scores[1, 7] = float(NEG_INF)                  # mid-group mask
        g_idx, g_valid = grouped_nms_presorted(
            jnp.asarray(boxes), jnp.asarray(scores), 0.5, G * K)
        flat_b = boxes.reshape(-1, 4)
        flat_s = scores.reshape(-1)
        cats = np.repeat(np.arange(G), K)
        b_idx, b_valid = batched_nms(
            jnp.asarray(flat_b), jnp.asarray(flat_s), jnp.asarray(cats),
            0.5, G * K)
        got = np.asarray(g_idx)[np.asarray(g_valid)]
        want = np.asarray(b_idx)[np.asarray(b_valid)]
        assert got.tolist() == want.tolist(), trial


def test_grouped_nms_tie_break_across_groups(rng):
    """Deliberately DUPLICATED scores across groups: the direct top_k
    epilogue must keep the stable-argsort rank order, i.e. ties broken by
    the lowest flattened (group-major) index (ADVICE r4: lax.top_k's
    lowest-index tie-breaking is load-bearing and was untested)."""
    from detectinblur_tpu.ops.nms import grouped_nms_presorted

    G, K = 4, 12
    # Disjoint far-apart boxes: nothing suppresses, so the output order is
    # PURELY the score/tie-break order.
    boxes = np.zeros((G, K, 4), np.float32)
    for g in range(G):
        for k in range(K):
            x = 1000.0 * g + 20.0 * k
            boxes[g, k] = [x, 0.0, x + 8.0, 8.0]
    # A handful of distinct values, each duplicated across several groups
    # and positions (descending within each group: the precondition).
    vals = np.array([0.9, 0.9, 0.7, 0.7, 0.7, 0.5, 0.5, 0.5, 0.5, 0.3,
                     0.3, 0.1], np.float32)
    scores = np.stack([vals for _ in range(G)])

    g_idx, g_valid = grouped_nms_presorted(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, G * K)
    assert bool(np.all(np.asarray(g_valid)))
    flat_s = scores.reshape(-1)
    cats = np.repeat(np.arange(G), K)
    b_idx, b_valid = batched_nms(
        jnp.asarray(boxes.reshape(-1, 4)), jnp.asarray(flat_s),
        jnp.asarray(cats), 0.5, G * K)
    got = np.asarray(g_idx)[np.asarray(g_valid)]
    want = np.asarray(b_idx)[np.asarray(b_valid)]
    assert got.tolist() == want.tolist()
    # And the tie-break rule itself, independent of batched_nms: stable
    # argsort of -scores = descending score, lowest flattened index first.
    expect = np.argsort(-flat_s, kind="stable")
    assert got.tolist() == expect.tolist()
