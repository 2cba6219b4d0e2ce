"""Text connector parity: device vectorized ops vs numpy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from ctpn_tpu.postprocess import oracle as O
from ctpn_tpu.postprocess.connector import (
    build_successors,
    chain_reachability,
    connect_text_lines,
)
from ctpn_tpu.postprocess.detector import detect_lines


def make_strip_scene(rng, n_lines=4, im_h=600, im_w=900, slope=0.0, gap_px=16):
    """Synthetic CTPN-like proposals: rows of 16px-wide strips."""
    boxes, scores = [], []
    for _ in range(n_lines):
        y = rng.uniform(40, im_h - 80)
        h = rng.uniform(20, 40)
        x_start = rng.uniform(0, 150)
        n_strips = rng.randint(3, 20)
        for s in range(n_strips):
            x1 = x_start + s * gap_px
            if x1 + 15 >= im_w:
                break
            yy = y + slope * (x1 - x_start) + rng.uniform(-1.5, 1.5)
            hh = h * rng.uniform(0.95, 1.05)
            boxes.append([x1, yy, x1 + 15, yy + hh])
            scores.append(rng.uniform(0.75, 1.0))
    boxes = np.array(boxes, np.float32)
    scores = np.array(scores, np.float32)
    # shuffle so ordering assumptions get exercised
    perm = rng.permutation(len(boxes))
    return boxes[perm], scores[perm]


def _pad(boxes, scores, n_pad):
    n = len(boxes)
    b = np.zeros((n_pad, 4), np.float32)
    s = np.full((n_pad,), -1.0, np.float32)
    b[:n] = boxes
    s[:n] = scores
    v = np.arange(n_pad) < n
    return b, s, v


class TestGraph:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_successors_match_oracle(self, seed):
        rng = np.random.RandomState(seed)
        boxes, scores = make_strip_scene(rng)
        im_size = (600, 900)
        want = O.build_graph_np(boxes.astype(np.float64), scores, im_size)
        b, s, v = _pad(boxes, scores, 128)
        succ = np.asarray(
            build_successors(jnp.asarray(b), jnp.asarray(s), jnp.asarray(v))
        )
        got = np.zeros_like(want)
        for i in range(len(boxes)):
            if succ[i] >= 0:
                got[i, succ[i]] = True
        np.testing.assert_array_equal(got, want)

    def test_chain_reachability_walk(self):
        # chain 3 -> 0 -> 5, chain 1 -> 4, isolated 2
        succ = np.array([5, 4, -1, 0, -1, -1], np.int32)
        r, is_start = chain_reachability(jnp.asarray(succ))
        r, is_start = np.asarray(r).astype(bool), np.asarray(is_start)
        assert is_start.tolist() == [False, True, False, True, False, False]
        assert set(np.flatnonzero(r[3])) == {3, 0, 5}
        assert set(np.flatnonzero(r[1])) == {1, 4}

    def test_chain_reachability_shares_merged_tails(self):
        # two heads converging on one node: the reference walks the tail
        # TWICE (oracle sub_graphs_np) — both lines must contain it
        succ = np.array([2, 2, 3, -1], np.int32)
        r, is_start = chain_reachability(jnp.asarray(succ))
        r, is_start = np.asarray(r).astype(bool), np.asarray(is_start)
        assert is_start.tolist() == [True, True, False, False]
        assert set(np.flatnonzero(r[0])) == {0, 2, 3}
        assert set(np.flatnonzero(r[1])) == {1, 2, 3}


class TestLines:
    @pytest.mark.parametrize("mode,slope", [
        ("H", 0.0), ("O", 0.15), ("O", -0.2),  # -0.2: the k<0 shift branch
    ])
    @pytest.mark.parametrize("seed", [0, 5])
    def test_lines_match_oracle(self, mode, slope, seed):
        rng = np.random.RandomState(seed)
        boxes, scores = make_strip_scene(rng, slope=slope)
        im_size = np.array([600, 900, 1.0], np.float32)

        if mode == "H":
            want = O.get_text_lines_h_np(boxes.astype(np.float64), scores, im_size)
        else:
            want = O.get_text_lines_o_np(boxes.astype(np.float64), scores, im_size)
        wkeep = O.filter_lines_np(want)
        want = want[wkeep]

        b, s, v = _pad(boxes, scores, 128)
        out = connect_text_lines(
            jnp.asarray(b), jnp.asarray(s), jnp.asarray(v), jnp.asarray(im_size),
            mode=mode, max_lines=32,
        )
        count = int(out.count)
        got = np.asarray(out.recs)[:count]
        assert count == len(want)
        # sort both by x of first corner then y for comparison
        go = got[np.lexsort((got[:, 1], got[:, 0]))]
        wo = want[np.lexsort((want[:, 1], want[:, 0]))]
        np.testing.assert_allclose(go, wo, rtol=1e-3, atol=0.3)

    def test_detect_lines_end_to_end_vs_oracle(self):
        rng = np.random.RandomState(11)
        boxes, scores = make_strip_scene(rng, n_lines=6)
        # add noise proposals below the score threshold and overlapping dups
        noise = boxes[: len(boxes) // 2] + rng.uniform(-2, 2, (len(boxes) // 2, 4))
        nscores = rng.uniform(0.2, 0.69, len(noise)).astype(np.float32)
        allb = np.concatenate([boxes, noise.astype(np.float32)])
        alls = np.concatenate([scores, nscores])
        im_size = np.array([600, 900, 1.0], np.float32)

        want = O.detect_np(allb.astype(np.float64), alls, im_size, mode="H")

        # device path expects score-desc-sorted rois
        order = np.argsort(alls, kind="stable")[::-1]
        rois = np.concatenate([alls[order, None], allb[order]], axis=1)
        b = np.zeros((256, 5), np.float32)
        b[:, 0] = -1
        b[: len(rois)] = rois
        v = np.arange(256) < len(rois)
        out = detect_lines(
            jnp.asarray(b), jnp.asarray(v), jnp.asarray(im_size), mode="H",
            max_lines=32,
        )
        count = int(out.count)
        got = np.asarray(out.recs)[:count]
        assert count == len(want)
        go = got[np.lexsort((got[:, 1], got[:, 0]))]
        wo = want[np.lexsort((want[:, 1], want[:, 0]))]
        np.testing.assert_allclose(go, wo, rtol=1e-3, atol=0.3)

    def test_no_lines_from_empty_input(self):
        b = np.zeros((64, 5), np.float32)
        b[:, 0] = -1
        v = np.zeros(64, bool)
        out = detect_lines(
            jnp.asarray(b), jnp.asarray(v),
            jnp.asarray(np.array([600, 900, 1.0], np.float32)),
        )
        assert int(out.count) == 0
        assert not np.asarray(out.valid).any()
