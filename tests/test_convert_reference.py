"""Reference-artifact conversion tests using fabricated TF1 checkpoints.

The real released checkpoint is not available in this environment, so these
tests fabricate TF artifacts with the reference's variable names/shapes
(`VGGnet_fast_rcnn_iter_*.ckpt` layout, frozen `ctpn.pb` Const graph) and
verify the conversion path end to end. Requires tensorflow (present in this
image); skipped otherwise.
"""

import os.path as osp

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from ctpn_tpu.cli.convert_reference import (  # noqa: E402
    vars_from_frozen_pb,
    vars_from_tf_checkpoint,
)
from tests.test_weights import _params_to_tf_vars  # noqa: E402


@pytest.fixture(scope="module")
def model_and_tf_vars():
    import jax
    import jax.numpy as jnp

    from ctpn_tpu.models.ctpn import CTPN

    model = CTPN(dtype=jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 80, 3), jnp.float32)
    )["params"]
    return model, params, _params_to_tf_vars(params)


def test_tf_checkpoint_round_trip(model_and_tf_vars, tmp_path, rng):
    import jax
    import jax.numpy as jnp

    from ctpn_tpu.utils.weights import convert_tf_vars

    model, params, tf_vars = model_and_tf_vars

    # write a real TF1-format checkpoint carrying the reference's graph
    # variable names (plus an Adam slot that must be ignored)
    prefix = str(tmp_path / "VGGnet_fast_rcnn_iter_50000.ckpt")
    with tf.compat.v1.Graph().as_default():
        g_vars = [
            tf.compat.v1.get_variable(name, initializer=arr.astype(np.float32))
            for name, arr in tf_vars.items()
        ]
        g_vars.append(
            tf.compat.v1.get_variable(
                "conv1_1/weights/Adam",
                initializer=np.zeros_like(tf_vars["conv1_1/weights"]),
            )
        )
        saver = tf.compat.v1.train.Saver(var_list=g_vars)
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            saver.save(sess, prefix)

    got = vars_from_tf_checkpoint(prefix)
    assert set(tf_vars).issubset(set(got))
    converted = convert_tf_vars(
        model.init(jax.random.PRNGKey(9), jnp.zeros((1, 64, 80, 3)))["params"],
        got,
    )
    x = jnp.asarray(rng.uniform(-120, 120, (1, 64, 80, 3)).astype(np.float32))
    a = model.apply({"params": params}, x)
    b = model.apply({"params": converted}, x)
    np.testing.assert_allclose(
        np.asarray(a.cls_prob), np.asarray(b.cls_prob), atol=1e-6
    )


def test_frozen_pb_extraction(model_and_tf_vars, tmp_path):
    _, _, tf_vars = model_and_tf_vars
    # fabricate a frozen GraphDef: Const nodes named like frozen variables
    with tf.compat.v1.Graph().as_default() as g:
        for name, arr in tf_vars.items():
            tf.constant(arr.astype(np.float32), name=name)
    path = str(tmp_path / "ctpn.pb")
    with open(path, "wb") as f:
        f.write(g.as_graph_def().SerializeToString())

    got = vars_from_frozen_pb(path)
    for name, arr in tf_vars.items():
        assert name in got, name
        np.testing.assert_array_equal(got[name], arr.astype(np.float32))


def test_convert_cli_to_golden_gate_e2e(model_and_tf_vars, tmp_path):
    """The exact day-the-checkpoint-lands procedure (PARITY.md), end to end
    on a fabricated checkpoint: `convert_reference --tf-ckpt ... --out art`
    -> CTPNPredictor(load_params(art)) -> detect_image — i.e. everything
    tests/test_golden.py will do with CTPN_ARTIFACT set, minus the released
    weights themselves."""
    import jax.numpy as jnp

    from ctpn_tpu.cli.convert_reference import main as convert_main
    from ctpn_tpu.config import cfg, reset_cfg
    from ctpn_tpu.inference.pipeline import CTPNPredictor
    from ctpn_tpu.utils.weights import load_params

    model, params, tf_vars = model_and_tf_vars
    prefix = str(tmp_path / "VGGnet_fast_rcnn_iter_50000.ckpt")
    with tf.compat.v1.Graph().as_default():
        g_vars = [
            tf.compat.v1.get_variable(name, initializer=arr.astype(np.float32))
            for name, arr in tf_vars.items()
        ]
        saver = tf.compat.v1.train.Saver(var_list=g_vars)
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            saver.save(sess, prefix)

    art = str(tmp_path / "artifact")
    convert_main(["--tf-ckpt", prefix, "--out", art])

    # tiny buckets/counts so the CPU program is cheap; golden runs use the
    # real demo geometry
    try:
        cfg.TEXT.SCALE = 48
        cfg.TEXT.MAX_SCALE = 80
        cfg.TEST.SCALES = (48,)
        cfg.TEST.MAX_SIZE = 80
        cfg.TPU.BUCKETS = [[48, 80]]
        cfg.TEST.RPN_PRE_NMS_TOP_N = 128
        cfg.TEST.RPN_POST_NMS_TOP_N = 32
        cfg.TPU.MAX_LINES = 8
        predictor = CTPNPredictor(load_params(art), mode="H")
        im = (np.random.RandomState(3).uniform(
            0, 255, (60, 100, 3))).astype(np.uint8)
        recs = predictor.detect_image(im)
        assert recs.shape[1] == 9  # line-record ABI; random weights may
        # detect nothing, the gate here is that the converted artifact
        # drives the full pipeline
    finally:
        reset_cfg()

    # converted forward == source forward (numerical fidelity of the
    # artifact the golden gate will consume)
    x = jnp.zeros((1, 64, 80, 3), jnp.float32)
    a = model.apply({"params": params}, x)
    b = model.apply({"params": load_params(art)}, x)
    np.testing.assert_allclose(
        np.asarray(a.cls_prob), np.asarray(b.cls_prob), atol=1e-6
    )
