"""NMS parity: on-device fixed-point NMS vs greedy numpy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from ctpn_tpu.ops import nms as N
from ctpn_tpu.ops.nms_pallas import suppression_bitmask_pallas
from ctpn_tpu.utils import host_ref as H
from tests.conftest import random_boxes


def _dets(rng, n, **kw):
    boxes = random_boxes(rng, n, **kw)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize("thresh", [0.2, 0.5, 0.7])
@pytest.mark.parametrize("n", [1, 7, 63, 300])
def test_nms_mask_matches_oracle(rng, thresh, n):
    boxes, scores = _dets(rng, n, max_wh=80)
    dets = np.hstack([boxes, scores[:, None]])
    want = set(H.py_nms(dets, thresh))
    keep = np.asarray(N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), thresh))
    got = set(np.flatnonzero(keep).tolist())
    assert got == want


def test_nms_dense_overlaps(rng):
    # heavy overlap regime: many boxes around few cluster centers
    centers = random_boxes(rng, 8, max_wh=60)
    boxes = np.repeat(centers, 40, axis=0)
    boxes += rng.uniform(-4, 4, boxes.shape).astype(np.float32)
    boxes[:, 2] = np.maximum(boxes[:, 2], boxes[:, 0] + 1)
    boxes[:, 3] = np.maximum(boxes[:, 3], boxes[:, 1] + 1)
    scores = rng.uniform(0, 1, len(boxes)).astype(np.float32)
    dets = np.hstack([boxes, scores[:, None]]).astype(np.float32)
    for thresh in (0.3, 0.7):
        want = set(H.py_nms(dets, thresh))
        keep = np.asarray(N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), thresh))
        assert set(np.flatnonzero(keep).tolist()) == want


def test_nms_respects_validity_mask(rng):
    boxes, scores = _dets(rng, 50)
    valid = np.arange(50) < 30
    keep = np.asarray(
        N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5, jnp.asarray(valid))
    )
    assert not keep[30:].any()
    # kept set over the valid prefix == oracle on just those boxes
    dets = np.hstack([boxes[:30], scores[:30, None]])
    want = set(H.py_nms(dets, 0.5))
    assert set(np.flatnonzero(keep[:30]).tolist()) == want


def test_nms_keep_indices_order_and_count(rng):
    boxes, scores = _dets(rng, 120)
    dets = np.hstack([boxes, scores[:, None]])
    want = H.py_nms(dets, 0.5)  # ordered by descending score
    idx, count = N.nms_keep_indices(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_out=64
    )
    # count reports the number of VALID slots in the max_out-sized output
    # (clipped — with a fused early-exit NMS the total beyond max_out is
    # deliberately never computed)
    count = int(count)
    assert count == min(len(want), 64)
    np.testing.assert_array_equal(np.asarray(idx)[:count], want[:count])

    # small max_out exercises the clip; large max_out reports the true total
    idx2, count2 = N.nms_keep_indices(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_out=120
    )
    assert int(count2) == len(want)
    np.testing.assert_array_equal(np.asarray(idx2)[: len(want)], want)


def test_bitmask_jnp_vs_pallas_interpret(rng):
    boxes, scores = _dets(rng, 300)
    order = np.argsort(scores, kind="stable")[::-1]
    sb = jnp.asarray(boxes[order])
    valid = jnp.ones(300, dtype=bool)
    want = np.asarray(N.suppression_bitmask_jnp(sb, valid, 0.5))
    got = np.asarray(suppression_bitmask_pallas(sb, valid, 0.5, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_nms_single_and_empty():
    b1 = jnp.asarray(np.array([[0, 0, 10, 10]], np.float32))
    s1 = jnp.asarray(np.array([0.9], np.float32))
    assert np.asarray(N.nms_mask(b1, s1, 0.5)).tolist() == [True]
    # all-invalid input keeps nothing
    keep = N.nms_mask(b1, s1, 0.5, valid=jnp.zeros(1, dtype=bool))
    assert not np.asarray(keep).any()


def test_nms_score_ties_match_reference_order(rng):
    boxes = random_boxes(rng, 40, max_wh=100)
    scores = np.full(40, 0.5, np.float32)  # all tied
    dets = np.hstack([boxes, scores[:, None]])
    want = set(H.py_nms(dets, 0.4))
    keep = np.asarray(N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.4))
    assert set(np.flatnonzero(keep).tolist()) == want


def test_blocked_resolve_matches_full_fixed_point(rng):
    from ctpn_tpu.ops.nms import nms_fixed_point_blocked

    for n, block in [(50, 32), (300, 64), (300, 1024), (1000, 256)]:
        boxes, scores = _dets(rng, n, max_wh=70)
        order = np.argsort(scores, kind="stable")[::-1]
        sb = jnp.asarray(boxes[order])
        valid = jnp.asarray(rng.uniform(size=n) < 0.9)
        mask = N.suppression_bitmask_jnp(sb, valid, 0.5)
        full = np.asarray(N.nms_fixed_point(mask, valid))
        blocked = np.asarray(nms_fixed_point_blocked(mask, valid, block=block))
        np.testing.assert_array_equal(blocked, full), (n, block)


def test_bitmask_pallas_tile_knob(rng):
    """cfg.TPU.NMS_TILE / NMS_TILE_J parameterize the kernel tiles; any
    legal tile pair must produce the identical bitmask."""
    boxes, scores = _dets(rng, 300)
    order = np.argsort(scores, kind="stable")[::-1]
    sb = jnp.asarray(boxes[order])
    valid = jnp.ones(300, dtype=bool)
    want = np.asarray(N.suppression_bitmask_jnp(sb, valid, 0.5))
    got = np.asarray(
        suppression_bitmask_pallas(
            sb, valid, 0.5, tile_i=64, tile_j=512, interpret=True
        )
    )
    np.testing.assert_array_equal(got, want)


# ---- fused single-kernel NMS (ops/nms_fused.py) ----

def _sorted_dets(rng, n, **kw):
    boxes, scores = _dets(rng, n, **kw)
    order = np.argsort(scores, kind="stable")[::-1]
    return boxes[order], scores[order]


@pytest.mark.parametrize("thresh", [0.2, 0.7])
@pytest.mark.parametrize("n", [33, 300, 1100])
def test_fused_nms_matches_oracle(rng, thresh, n):
    from ctpn_tpu.ops.nms_fused import nms_keep_sorted_fused

    sb, ss = _sorted_dets(rng, n)
    want = np.zeros(n, bool)
    want[H.py_nms(np.hstack([sb, ss[:, None]]), thresh)] = True
    got = np.asarray(
        nms_keep_sorted_fused(
            jnp.asarray(sb)[None], jnp.ones((1, n), bool), thresh
        )
    )[0]
    np.testing.assert_array_equal(got, want)


def test_fused_nms_batch_and_validity(rng):
    from ctpn_tpu.ops.nms_fused import nms_keep_sorted_fused

    n, batch = 700, 3
    sbs, wants, valids = [], [], []
    for _ in range(batch):
        sb, ss = _sorted_dets(rng, n)
        valid = rng.rand(n) > 0.3
        dets = np.hstack([sb, ss[:, None]])[valid]
        kept_rows = np.flatnonzero(valid)[H.py_nms(dets, 0.5)]
        want = np.zeros(n, bool)
        want[kept_rows] = True
        sbs.append(sb), wants.append(want), valids.append(valid)
    got = np.asarray(
        nms_keep_sorted_fused(
            jnp.asarray(np.stack(sbs)), jnp.asarray(np.stack(valids)), 0.5
        )
    )
    for b in range(batch):
        np.testing.assert_array_equal(got[b], wants[b])


def test_fused_nms_early_exit_prefix(rng):
    """max_keep stops the scan; the first max_keep survivors are exact."""
    from ctpn_tpu.ops.nms_fused import nms_keep_sorted_fused

    n, mk = 2100, 64
    sb, ss = _sorted_dets(rng, n)
    want_idx = np.asarray(H.py_nms(np.hstack([sb, ss[:, None]]), 0.7))
    got = np.asarray(
        nms_keep_sorted_fused(
            jnp.asarray(sb)[None], jnp.ones((1, n), bool), 0.7, max_keep=mk
        )
    )[0]
    got_idx = np.flatnonzero(got)
    assert len(got_idx) >= min(mk, len(want_idx))
    np.testing.assert_array_equal(got_idx[:mk], want_idx[:mk])


def test_fused_nms_dense_chains(rng):
    """Heavily-overlapping boxes exercise deep suppression chains."""
    from ctpn_tpu.ops.nms_fused import nms_keep_sorted_fused

    n = 600
    base = np.array([100.0, 100.0, 180.0, 140.0])
    jitter = rng.randn(n, 4).astype(np.float32) * 6
    boxes = (base[None, :] + jitter).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    order = np.argsort(scores, kind="stable")[::-1]
    sb = boxes[order]
    want = np.zeros(n, bool)
    want[H.py_nms(np.hstack([sb, scores[order][:, None]]), 0.5)] = True
    got = np.asarray(
        nms_keep_sorted_fused(jnp.asarray(sb)[None], jnp.ones((1, n), bool), 0.5)
    )[0]
    np.testing.assert_array_equal(got, want)


def test_fused_nms_under_vmap(rng):
    """detect_lines vmaps over the batch; the kernel must survive vmap."""
    import jax

    from ctpn_tpu.ops.nms_fused import nms_keep_sorted_fused

    n, batch = 500, 2
    sbs, wants = [], []
    for _ in range(batch):
        sb, ss = _sorted_dets(rng, n)
        want = np.zeros(n, bool)
        want[H.py_nms(np.hstack([sb, ss[:, None]]), 0.4)] = True
        sbs.append(sb), wants.append(want)
    f = lambda b, v: nms_keep_sorted_fused(b[None], v[None], 0.4)[0]
    got = np.asarray(
        jax.vmap(f)(jnp.asarray(np.stack(sbs)), jnp.ones((batch, n), bool))
    )
    for b in range(batch):
        np.testing.assert_array_equal(got[b], wants[b])
