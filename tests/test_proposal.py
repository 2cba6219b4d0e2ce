"""Proposal layer parity vs host oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from ctpn_tpu.ops import anchors as A
from ctpn_tpu.ops.proposal import proposal_layer, proposal_layer_batched
from ctpn_tpu.utils import host_ref as H


def _heads(rng, fh, fw):
    cls_prob = rng.uniform(0, 1, (fh, fw, 10)).astype(np.float32)
    bbox_pred = rng.uniform(-0.5, 0.5, (fh, fw, 40)).astype(np.float32)
    return cls_prob, bbox_pred


def test_proposal_matches_oracle_full_image(rng):
    fh, fw = 6, 9
    cls_prob, bbox_pred = _heads(rng, fh, fw)
    im_info = np.array([fh * 16, fw * 16, 1.0], np.float32)
    anchors = A.shifted_anchors(fh, fw)

    want = H.proposal_layer_np(
        cls_prob, bbox_pred, im_info, anchors,
        pre_nms_top_n=400, post_nms_top_n=80, nms_thresh=0.7, min_size=8,
    )
    got = proposal_layer(
        jnp.asarray(cls_prob), jnp.asarray(bbox_pred), jnp.asarray(im_info),
        pre_nms_top_n=400, post_nms_top_n=80, nms_thresh=0.7, min_size=8,
    )
    count = int(got.count)
    assert count == len(want)
    rois = np.asarray(got.rois)[:count]
    np.testing.assert_allclose(rois[:, 0], want[:, 0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(rois[:, 1:], want[:, 1:], rtol=1e-4, atol=2e-2)
    assert np.asarray(got.valid)[:count].all()
    assert not np.asarray(got.valid)[count:].any()
    # padding slots carry score -1 so downstream >0.7 masks drop them
    assert (np.asarray(got.rois)[count:, 0] == -1).all()


def test_proposal_respects_true_image_extent(rng):
    # bucket 6x9 cells but true image only 4x5 cells: proposals must not
    # come from cells beyond the true extent
    fh, fw = 6, 9
    cls_prob, bbox_pred = _heads(rng, fh, fw)
    im_info = np.array([4 * 16, 5 * 16, 1.0], np.float32)
    got = proposal_layer(
        jnp.asarray(cls_prob), jnp.asarray(bbox_pred), jnp.asarray(im_info),
        pre_nms_top_n=400, post_nms_top_n=200, nms_thresh=0.7, min_size=8,
    )
    count = int(got.count)
    rois = np.asarray(got.rois)[:count]
    assert count > 0
    # all proposals clipped inside the true image
    assert (rois[:, 1] >= 0).all() and (rois[:, 3] <= 5 * 16 - 1).all()
    assert (rois[:, 2] >= 0).all() and (rois[:, 4] <= 4 * 16 - 1).all()

    # oracle run restricted to the true 4x5 sub-grid must agree
    sub_prob = cls_prob[:4, :5]
    sub_pred = bbox_pred[:4, :5]
    want = H.proposal_layer_np(
        sub_prob, sub_pred, im_info, A.shifted_anchors(4, 5),
        pre_nms_top_n=400, post_nms_top_n=200, nms_thresh=0.7, min_size=8,
    )
    assert count == len(want)
    np.testing.assert_allclose(rois[:, 0], want[:, 0], rtol=1e-5, atol=1e-5)


def test_proposal_batched_vmap(rng):
    fh, fw = 5, 6
    probs = np.stack([_heads(rng, fh, fw)[0] for _ in range(3)])
    preds = np.stack([_heads(rng, fh, fw)[1] for _ in range(3)])
    infos = np.tile(np.array([fh * 16, fw * 16, 1.0], np.float32), (3, 1))
    out = proposal_layer_batched(
        jnp.asarray(probs), jnp.asarray(preds), jnp.asarray(infos),
        pre_nms_top_n=200, post_nms_top_n=50, nms_thresh=0.7,
    )
    assert out.rois.shape == (3, 50, 5)
    for b in range(3):
        want = H.proposal_layer_np(
            probs[b], preds[b], infos[b], A.shifted_anchors(fh, fw),
            pre_nms_top_n=200, post_nms_top_n=50, nms_thresh=0.7,
        )
        count = int(out.count[b])
        assert count == len(want)
        np.testing.assert_allclose(
            np.asarray(out.rois)[b, :count, 0], want[:, 0], rtol=1e-5, atol=1e-5
        )


def test_proposal_layer_jits(rng):
    fh, fw = 5, 6
    cls_prob, bbox_pred = _heads(rng, fh, fw)
    im_info = np.array([fh * 16, fw * 16, 1.0], np.float32)
    f = jax.jit(
        lambda p, d, i: proposal_layer(
            p, d, i, pre_nms_top_n=200, post_nms_top_n=50
        )
    )
    out = f(jnp.asarray(cls_prob), jnp.asarray(bbox_pred), jnp.asarray(im_info))
    assert out.rois.shape == (50, 5)
