"""End-to-end device-vs-host parity: the on-device pipeline must produce the
same proposals/lines as the host oracle path from the SAME model forward.

This is the framework's analogue of the reference's demo.py (device+py_func)
vs demo_pb.py (host postprocess) equivalence, testable without trained
weights because both paths consume identical head tensors.
"""

import numpy as np
import pytest

from ctpn_tpu.config import cfg


@pytest.fixture
def small_env():
    cfg.TPU.BUCKETS = [[64, 96]]
    cfg.TEXT.SCALE = 48
    cfg.TEXT.MAX_SCALE = 96
    cfg.TEST.SCALES = (48,)
    cfg.TEST.MAX_SIZE = 96
    cfg.TEST.RPN_PRE_NMS_TOP_N = 240
    cfg.TEST.RPN_POST_NMS_TOP_N = 100
    yield


def test_device_vs_host_postprocess(small_env, rng):
    import jax
    import jax.numpy as jnp

    from ctpn_tpu.inference.pipeline import CTPNPredictor
    from ctpn_tpu.models.factory import get_network
    from ctpn_tpu.ops.anchors import shifted_anchors
    from ctpn_tpu.utils.host_ref import proposal_layer_np

    model = get_network("VGGnet_test")
    params = model.init(
        jax.random.PRNGKey(42), jnp.zeros((1, 64, 96, 3), jnp.float32)
    )["params"]
    predictor = CTPNPredictor(params, mode="H")

    im = rng.randint(0, 255, (96, 128, 3)).astype(np.uint8)

    # raw connector semantics on both sides: this test compares the host
    # oracle against the device program's UNMERGED lines.recs, so the
    # line-union stage must not rewrite the host records (conftest resets)
    cfg.TEXT.LINE_MERGE_GAP_RATIO = 0.0

    # host path: forward on device, decode on host
    host_recs = predictor.detect_image_host(im)

    # device path at the proposal level
    from ctpn_tpu.utils.image import prep_image, resize_im

    resized, f1 = resize_im(im, cfg.TEXT.SCALE, cfg.TEXT.MAX_SCALE)
    data, info, _pad = prep_image(resized)
    props, lines = predictor.run_batch(data[None], np.asarray(info)[None])
    count = int(props.count[0])
    rois = np.asarray(props.rois[0])[:count]

    # recompute the host proposals for comparison
    outs = predictor._fwd_fns[data.shape[:2]](
        predictor.params, jnp.asarray(data[None])
    )
    th, tw = int(info[0]) // 16, int(info[1]) // 16
    prob = np.asarray(outs.cls_prob[0])[:th, :tw]
    pred = np.asarray(outs.bbox_pred[0])[:th, :tw]
    want = proposal_layer_np(
        prob, pred, info, shifted_anchors(th, tw),
        pre_nms_top_n=cfg.TEST.RPN_PRE_NMS_TOP_N,
        post_nms_top_n=cfg.TEST.RPN_POST_NMS_TOP_N,
        nms_thresh=cfg.TEST.RPN_NMS_THRESH,
        min_size=cfg.TEST.RPN_MIN_SIZE,
    )
    assert count == len(want)
    np.testing.assert_allclose(rois[:, 0], want[:, 0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(rois[:, 1:], want[:, 1:], rtol=1e-3, atol=0.1)

    # line-level: device lines and host lines agree in count and geometry
    dev_count = int(lines.count[0])
    dev_recs = np.asarray(lines.recs[0])[:dev_count]
    assert dev_count == len(host_recs)
    if dev_count:
        total_scale = f1 * float(info[2])
        dev_scaled = dev_recs.astype(np.float64)
        dev_scaled[:, :8] /= total_scale
        a = dev_scaled[np.lexsort((dev_scaled[:, 1], dev_scaled[:, 0]))]
        b = host_recs[np.lexsort((host_recs[:, 1], host_recs[:, 0]))]
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=0.5)


def test_device_vs_host_postprocess_with_top_pad(small_env, rng):
    """TEST.TOP_PAD opt-in: both the device contract (detect_image) and
    the host-oracle contract (detect_image_host) pad the top identically
    and undo the shift via unscale_records' y_off — so full-path parity
    must hold under the pad, and every returned y must be in-bounds."""
    import jax
    import jax.numpy as jnp

    from ctpn_tpu.inference.pipeline import CTPNPredictor
    from ctpn_tpu.models.factory import get_network

    cfg.TEST.TOP_PAD = 16
    cfg.TEXT.LINE_MERGE_GAP_RATIO = 0.0
    # random-init heads hover near 0.5 — lower the score gates so the
    # pipeline actually emits lines and the parity check is non-vacuous
    cfg.TEXT.TEXT_PROPOSALS_MIN_SCORE = 0.4
    cfg.TEXT.LINE_MIN_SCORE = 0.3

    model = get_network("VGGnet_test")
    params = model.init(
        jax.random.PRNGKey(7), jnp.zeros((1, 64, 96, 3), jnp.float32)
    )["params"]
    predictor = CTPNPredictor(params, mode="H")
    im = rng.randint(0, 255, (96, 128, 3)).astype(np.uint8)

    dev = predictor.detect_image(im)
    host = predictor.detect_image_host(im)
    assert len(dev) == len(host)
    assert len(dev) > 0  # gates lowered so the comparison is real
    a = dev[np.lexsort((dev[:, 1], dev[:, 0]))]
    b = host[np.lexsort((host[:, 1], host[:, 0]))]
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=0.5)
    assert (a[:, 1:8:2] >= 0).all() and (a[:, 1:8:2] <= im.shape[0]).all()
