"""Loss-function unit tests against hand-computed values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctpn_tpu.ops.anchor_target import AnchorTargets
from ctpn_tpu.training.loss import ctpn_loss, smooth_l1
from ctpn_tpu.training.train_step import make_lr_schedule, make_optimizer
from ctpn_tpu.config import cfg


def _targets(labels, tgt, biw, bow):
    return AnchorTargets(
        labels=jnp.asarray(labels),
        bbox_targets=jnp.asarray(tgt),
        bbox_inside_weights=jnp.asarray(biw),
        bbox_outside_weights=jnp.asarray(bow),
    )


def test_cls_loss_hand_computed():
    # 1x1x1 feature map, A=2 anchors -> 2 logit rows
    logits = np.array([[[[2.0, 0.0, 0.0, 1.0]]]], np.float32)  # (1,1,1,4)
    labels = np.array([[[[0, -1]]]], np.int32)  # anchor0 bg, anchor1 ignored
    zeros = np.zeros((1, 1, 1, 8), np.float32)
    t = _targets(labels, zeros, zeros, zeros)
    pred = np.zeros((1, 1, 1, 8), np.float32)
    loss, aux = ctpn_loss(jnp.asarray(logits), jnp.asarray(pred), t)
    # only anchor0 counts: CE(bg) = -log softmax([2,0])[0]
    want = -np.log(np.exp(2) / (np.exp(2) + 1))
    assert float(aux["rpn_cls_loss"]) == pytest.approx(want, rel=1e-5)
    assert float(aux["rpn_box_loss"]) == pytest.approx(0.0, abs=1e-7)


def test_ohem_selects_hardest_negatives():
    # 1x1x2 grid, A=2 -> 4 anchors: 1 fg + 3 bg with distinct difficulties
    # bg CE grows with the fg-logit margin; hardest = most fg-confident
    logits = np.array(
        [[[[0.0, 5.0, 3.0, 0.0], [1.0, 0.0, 9.0, 0.0]]]], np.float32
    )  # rows: fg [0,5]; bg [3,0] medium; bg [1,0] hardest; bg [9,0] easiest
    labels = np.array([[[[1, 0], [0, 0]]]], np.int32)
    zeros = np.zeros((1, 1, 2, 8), np.float32)
    t = _targets(labels, zeros, zeros, zeros)
    pred = np.zeros((1, 1, 2, 8), np.float32)

    def ce_bg(l0, l1):
        # bg CE: low when the bg logit l0 dominates
        return -np.log(np.exp(l0) / (np.exp(l0) + np.exp(l1)))

    # ohem_batchsize=3 -> 1 fg + the 2 hardest bg ([1,0] then [3,0]);
    # the easy [9,0] row is excluded
    loss, aux = ctpn_loss(
        jnp.asarray(logits), jnp.asarray(pred), t, ohem_batchsize=3
    )
    ce_fg = -np.log(np.exp(5) / (np.exp(0) + np.exp(5)))
    want = (ce_fg + ce_bg(1, 0) + ce_bg(3, 0)) / 3.0
    assert float(aux["rpn_cls_loss"]) == pytest.approx(want, rel=1e-5)
    # without ohem every labeled anchor counts
    loss2, aux2 = ctpn_loss(jnp.asarray(logits), jnp.asarray(pred), t)
    want_all = (ce_fg + ce_bg(3, 0) + ce_bg(1, 0) + ce_bg(9, 0)) / 4.0
    assert float(aux2["rpn_cls_loss"]) == pytest.approx(want_all, rel=1e-5)


def test_box_loss_hand_computed():
    labels = np.array([[[[1, 0]]]], np.int32)  # anchor0 fg, anchor1 bg
    logits = np.zeros((1, 1, 1, 4), np.float32)
    pred = np.zeros((1, 1, 1, 8), np.float32)
    pred[0, 0, 0, :4] = [0.5, 0.2, 0.1, 0.05]  # anchor0 deltas
    tgt = np.zeros((1, 1, 1, 8), np.float32)
    biw = np.zeros((1, 1, 1, 8), np.float32)
    biw[0, 0, 0, :4] = [0, 1, 0, 1]
    bow = np.zeros((1, 1, 1, 8), np.float32)
    bow[0, 0, 0, :4] = 1.0
    t = _targets(labels, tgt, biw, bow)
    loss, aux = ctpn_loss(jnp.asarray(logits), jnp.asarray(pred), t)
    # rows: anchor0 fg -> smooth_l1 on dy=0.2, dh=0.05 with sigma2=9:
    # |0.2| >= 1/9 -> 0.2 - 1/18 ; |0.05| < 1/9 -> 0.5*9*0.05^2
    row = (0.2 - 0.5 / 9) + 0.5 * 9 * 0.05**2
    # normalized by (num_fg + 1) = 2
    assert float(aux["rpn_box_loss"]) == pytest.approx(row / 2, rel=1e-5)


def test_smooth_l1_continuity():
    # the two branches meet at |x| = 1/sigma2
    x = 1.0 / 9.0
    lo = float(smooth_l1(jnp.asarray(x - 1e-6)))
    hi = float(smooth_l1(jnp.asarray(x + 1e-6)))
    assert lo == pytest.approx(hi, abs=1e-5)


def test_lr_schedule_step_decay():
    sched = make_lr_schedule(base_lr=1e-3, gamma=0.1, stepsize=100)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(99)) == pytest.approx(1e-3)
    assert float(sched(100)) == pytest.approx(1e-4)
    assert float(sched(250)) == pytest.approx(1e-5)


@pytest.mark.parametrize("solver", ["Adam", "RMS", "Momentum"])
def test_optimizer_select(solver):
    opt = make_optimizer(solver)
    params = {"w": jnp.ones((3,))}
    state = opt.init(params)
    grads = {"w": jnp.ones((3,)) * 100.0}  # large grad -> clipped
    updates, _ = opt.update(grads, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_unknown_solver_raises():
    with pytest.raises(ValueError):
        make_optimizer("AdaSomething")
