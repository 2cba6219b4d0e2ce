"""Anchor-target layer parity vs host oracle (labels, targets, weights)."""

import jax
import jax.numpy as jnp
import numpy as np

from ctpn_tpu.ops import anchors as A
from ctpn_tpu.ops.anchor_target import anchor_target_layer
from ctpn_tpu.utils import host_ref as H
from tests.conftest import random_boxes


def _make_inputs(rng, fh, fw, n_gt, max_gt=32, n_dc=0, max_dc=8, hard_frac=0.0):
    im_h, im_w = fh * 16, fw * 16
    gt = random_boxes(rng, n_gt, im_h=im_h, im_w=im_w, max_wh=60)
    gt_pad = np.zeros((max_gt, 4), np.float32)
    gt_pad[:n_gt] = gt
    gt_valid = np.arange(max_gt) < n_gt
    ishard = np.zeros(max_gt, dtype=bool)
    if hard_frac > 0:
        ishard[:n_gt] = rng.uniform(size=n_gt) < hard_frac
    dc_pad = np.zeros((max_dc, 4), np.float32)
    if n_dc:
        dc_pad[:n_dc] = random_boxes(rng, n_dc, im_h=im_h, im_w=im_w, max_wh=100)
    dc_valid = np.arange(max_dc) < n_dc
    im_info = np.array([im_h, im_w, 1.0], np.float32)
    return gt_pad, gt_valid, ishard, dc_pad, dc_valid, im_info


def _run_device(rng_key, inputs, fh, fw, **kw):
    gt_pad, gt_valid, ishard, dc_pad, dc_valid, im_info = inputs
    return anchor_target_layer(
        rng_key,
        jnp.asarray(gt_pad),
        jnp.asarray(gt_valid),
        jnp.asarray(ishard),
        jnp.asarray(dc_pad),
        jnp.asarray(dc_valid),
        jnp.asarray(im_info),
        feat_h=fh,
        feat_w=fw,
        **kw,
    )


def _run_oracle(inputs, fh, fw, n_gt, n_dc):
    gt_pad, _, ishard, dc_pad, _, im_info = inputs
    anchors = A.shifted_anchors(fh, fw).astype(np.float64)
    return H.anchor_target_np(
        anchors,
        gt_pad[:n_gt].astype(np.float64),
        ishard[:n_gt],
        dc_pad[:n_dc].astype(np.float64) if n_dc else None,
        im_info,
    )


def test_labels_match_oracle_pre_sampling(rng):
    fh, fw = 8, 10
    n_gt = 6
    inputs = _make_inputs(rng, fh, fw, n_gt)
    # huge batchsize -> no subsampling, pure label parity
    out = _run_device(jax.random.PRNGKey(0), inputs, fh, fw,
                      rpn_batchsize=100000, fg_fraction=1.0)
    want_labels, want_argmax, inside = _run_oracle(inputs, fh, fw, n_gt, 0)
    got = np.asarray(out.labels).reshape(-1)
    np.testing.assert_array_equal(got, want_labels)


def test_labels_with_dontcare_and_hard(rng):
    fh, fw = 8, 10
    n_gt, n_dc = 5, 3
    inputs = _make_inputs(rng, fh, fw, n_gt, n_dc=n_dc, hard_frac=0.5)
    out = _run_device(jax.random.PRNGKey(0), inputs, fh, fw,
                      rpn_batchsize=100000, fg_fraction=1.0)
    want_labels, _, _ = _run_oracle(inputs, fh, fw, n_gt, n_dc)
    got = np.asarray(out.labels).reshape(-1)
    np.testing.assert_array_equal(got, want_labels)


def test_subsampling_counts_and_subsets(rng):
    fh, fw = 10, 14
    # many close-packed gt strips -> lots of fg candidates
    im_h, im_w = fh * 16, fw * 16
    xs = np.arange(0, im_w - 16, 16)
    gt = np.stack([xs, np.full_like(xs, 32), xs + 15, np.full_like(xs, 80)], 1)
    gt = np.concatenate([gt + np.array([0, dy, 0, dy]) for dy in (0, 96, 160)])
    max_gt = 64
    gt_pad = np.zeros((max_gt, 4), np.float32)
    gt_pad[: len(gt)] = gt
    gt_valid = np.arange(max_gt) < len(gt)
    inputs = (
        gt_pad, gt_valid, np.zeros(max_gt, bool),
        np.zeros((8, 4), np.float32), np.zeros(8, bool),
        np.array([im_h, im_w, 1.0], np.float32),
    )
    batchsize, fg_frac = 300, 0.5
    out = _run_device(jax.random.PRNGKey(7), inputs, fh, fw,
                      rpn_batchsize=batchsize, fg_fraction=fg_frac)
    labels = np.asarray(out.labels).reshape(-1)
    want_labels, _, _ = _run_oracle(inputs, fh, fw, len(gt), 0)

    n_fg = (labels == 1).sum()
    n_bg = (labels == 0).sum()
    want_fg_eligible = (want_labels == 1).sum()
    assert n_fg == min(int(fg_frac * batchsize), want_fg_eligible)
    assert n_fg + n_bg == batchsize
    # sampled sets are subsets of the eligible sets
    assert np.all(want_labels[labels == 1] == 1)
    assert np.all(want_labels[labels == 0] == 0)


def test_ohem_keeps_all_negatives(rng):
    fh, fw = 10, 14
    n_gt = 6
    inputs = _make_inputs(rng, fh, fw, n_gt)
    plain = _run_device(jax.random.PRNGKey(3), inputs, fh, fw,
                        rpn_batchsize=300, fg_fraction=0.5)
    ohem = _run_device(jax.random.PRNGKey(3), inputs, fh, fw,
                       rpn_batchsize=300, fg_fraction=0.5, ohem=True)
    eligible = _run_device(jax.random.PRNGKey(3), inputs, fh, fw,
                           rpn_batchsize=10 ** 6, fg_fraction=1.0)
    lp = np.asarray(plain.labels).reshape(-1)
    lo = np.asarray(ohem.labels).reshape(-1)
    le = np.asarray(eligible.labels).reshape(-1)
    # every eligible negative stays labeled 0 for the loss-side selection
    assert (lo == 0).sum() == (le == 0).sum() > (lp == 0).sum()
    # fg sampling unchanged by ohem (same key -> same fg set)
    np.testing.assert_array_equal(lo == 1, lp == 1)


def test_sampling_is_deterministic_per_key(rng):
    fh, fw = 8, 10
    inputs = _make_inputs(rng, fh, fw, 8)
    a = _run_device(jax.random.PRNGKey(3), inputs, fh, fw)
    b = _run_device(jax.random.PRNGKey(3), inputs, fh, fw)
    c = _run_device(jax.random.PRNGKey(4), inputs, fh, fw)
    np.testing.assert_array_equal(np.asarray(a.labels), np.asarray(b.labels))
    assert (np.asarray(a.labels) != np.asarray(c.labels)).any()


def test_targets_and_weights(rng):
    fh, fw = 8, 10
    n_gt = 6
    inputs = _make_inputs(rng, fh, fw, n_gt)
    out = _run_device(jax.random.PRNGKey(0), inputs, fh, fw,
                      rpn_batchsize=100000, fg_fraction=1.0)
    want_labels, want_argmax, inside = _run_oracle(inputs, fh, fw, n_gt, 0)
    anchors = A.shifted_anchors(fh, fw)
    gt_pad = inputs[0]

    targets = np.asarray(out.bbox_targets).reshape(-1, 4)
    # targets computed for every inside anchor vs argmax gt
    want_t = H.bbox_transform_np(
        anchors[inside].astype(np.float64), gt_pad[want_argmax[inside]].astype(np.float64)
    )
    np.testing.assert_allclose(targets[inside], want_t, rtol=1e-4, atol=1e-3)
    assert (targets[~inside] == 0).all()

    labels = np.asarray(out.labels).reshape(-1)
    biw = np.asarray(out.bbox_inside_weights).reshape(-1, 4)
    bow = np.asarray(out.bbox_outside_weights).reshape(-1, 4)
    np.testing.assert_array_equal(biw[labels == 1], np.tile([0, 1, 0, 1], ((labels == 1).sum(), 1)))
    assert (biw[labels != 1] == 0).all()
    assert (bow[labels == 1] == 1).all()
    assert (bow[labels != 1] == 0).all()
