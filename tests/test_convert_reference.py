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
