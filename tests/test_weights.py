"""Weight conversion tests: npy bootstrap and TF-variable mapping round trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctpn_tpu.models.ctpn import CTPN
from ctpn_tpu.utils.weights import (
    convert_tf_vars,
    export_params,
    load_params,
    load_pretrained_into,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = CTPN(dtype=jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 80, 3), jnp.float32)
    )["params"]
    return model, params


def _params_to_tf_vars(params, hidden=128):
    """Reverse mapping: our pytree -> reference TF1 variable dict."""
    out = {}
    trunk = next(k for k in params if k.startswith("VGG16Trunk"))
    for layer, leaf in params[trunk].items():
        out[f"{layer}/weights"] = np.asarray(leaf["kernel"])
        out[f"{layer}/biases"] = np.asarray(leaf["bias"])
    out["rpn_conv/3x3/weights"] = np.asarray(params["rpn_conv"]["kernel"])
    out["rpn_conv/3x3/biases"] = np.asarray(params["rpn_conv"]["bias"])
    ip_k = np.asarray(params["bilstm"]["input_proj"]["kernel"])  # (C, 8H)
    ip_b = np.asarray(params["bilstm"]["input_proj"]["bias"])  # (8H,)
    c = ip_k.shape[0]
    fw_x, bw_x = ip_k[:, : 4 * hidden], ip_k[:, 4 * hidden :]
    out["lstm_o/bidirectional_rnn/fw/lstm_cell/kernel"] = np.concatenate(
        [fw_x, np.asarray(params["bilstm"]["w_h_fw"])], axis=0
    )
    out["lstm_o/bidirectional_rnn/bw/lstm_cell/kernel"] = np.concatenate(
        [bw_x, np.asarray(params["bilstm"]["w_h_bw"])], axis=0
    )
    out["lstm_o/bidirectional_rnn/fw/lstm_cell/bias"] = ip_b[: 4 * hidden]
    out["lstm_o/bidirectional_rnn/bw/lstm_cell/bias"] = ip_b[4 * hidden :]
    out["lstm_o/weights"] = np.asarray(params["bilstm"]["out_proj"]["kernel"])
    out["lstm_o/biases"] = np.asarray(params["bilstm"]["out_proj"]["bias"])
    for head in ("rpn_bbox_pred", "rpn_cls_score"):
        out[f"{head}/weights"] = np.asarray(params[head]["kernel"])
        out[f"{head}/biases"] = np.asarray(params[head]["bias"])
    return out


def test_convert_tf_vars_round_trip(model_and_params, rng):
    model, params = model_and_params
    tf_vars = _params_to_tf_vars(params)
    fresh = model.init(
        jax.random.PRNGKey(99), jnp.zeros((1, 64, 80, 3), jnp.float32)
    )["params"]
    converted = convert_tf_vars(fresh, tf_vars)

    x = jnp.asarray(rng.uniform(-120, 120, (1, 64, 80, 3)).astype(np.float32))
    a = model.apply({"params": params}, x)
    b = model.apply({"params": converted}, x)
    np.testing.assert_allclose(
        np.asarray(a.cls_prob), np.asarray(b.cls_prob), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a.bbox_pred), np.asarray(b.bbox_pred), atol=1e-6
    )


def test_npy_bootstrap_loads_vgg_layers(model_and_params, tmp_path, rng):
    model, params = model_and_params
    trunk = next(k for k in params if k.startswith("VGG16Trunk"))
    data = {}
    for layer in ("conv1_1", "conv3_2", "conv5_3"):
        k = np.asarray(params[trunk][layer]["kernel"])
        data[layer] = {
            "weights": rng.randn(*k.shape).astype(np.float32),
            "biases": rng.randn(k.shape[-1]).astype(np.float32),
        }
    data["fc6"] = {  # classifier layer absent from CTPN: must be skipped
        "weights": rng.randn(10, 10).astype(np.float32),
        "biases": rng.randn(10).astype(np.float32),
    }
    path = str(tmp_path / "vgg.npy")
    np.save(path, data, allow_pickle=True)

    out = load_pretrained_into(params, path)
    for layer in ("conv1_1", "conv3_2", "conv5_3"):
        np.testing.assert_allclose(
            np.asarray(out[trunk][layer]["kernel"]), data[layer]["weights"]
        )
    # untouched layer stays
    np.testing.assert_allclose(
        np.asarray(out[trunk]["conv2_1"]["kernel"]),
        np.asarray(params[trunk]["conv2_1"]["kernel"]),
    )


def test_export_load_round_trip(model_and_params, tmp_path):
    _, params = model_and_params
    art = export_params(params, str(tmp_path / "artifact"))
    loaded = load_params(art)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(loaded)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_npz_artifact_round_trip(tmp_path, rng):
    """Half-precision single-file artifact: tree and values survive, and the
    f16 quantization stays below bf16 compute resolution."""
    import jax

    from ctpn_tpu.models.ctpn import CTPN
    from ctpn_tpu.utils.weights import export_params_npz, load_params

    model = CTPN(trunk_stages=((1, 1, 8), (2, 1, 8), (3, 1, 8),
                               (4, 1, 8), (5, 1, 8)),
                 lstm_hidden=8, rpn_channels=16)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    out = export_params_npz(params, str(tmp_path / "artifact.npz"))
    restored = load_params(out)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(restored))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        a, b = np.asarray(a), np.asarray(b)
        assert b.dtype == np.float32
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)

def test_npz_export_rejects_f16_overflow(tmp_path):
    """Values past float16 range must fail loudly at export, not ship inf."""
    import pytest

    from ctpn_tpu.utils.weights import export_params_npz

    params = {"conv": {"kernel": np.array([1.0, 7e4], np.float32)}}
    with pytest.raises(ValueError, match="non-finite"):
        export_params_npz(params, str(tmp_path / "bad.npz"))


def test_artifact_init_for_finetune(tmp_path, rng):
    """load_pretrained_into accepts an exported artifact (.npz or orbax dir)
    and overlays every leaf exactly — the fine-tune-from-shipped-weights
    bootstrap (scripts/train_synth.py --init-artifact)."""
    from ctpn_tpu.utils.weights import export_params_npz

    model = CTPN(trunk_stages=((1, 1, 8), (2, 1, 8), (3, 1, 8),
                               (4, 1, 8), (5, 1, 8)),
                 lstm_hidden=8, rpn_channels=16)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    donor = model.init(jax.random.PRNGKey(1), x)["params"]
    fresh = model.init(jax.random.PRNGKey(2), x)["params"]

    npz = export_params_npz(donor, str(tmp_path / "donor.npz"))
    orbax_dir = export_params(donor, str(tmp_path / "donor_orbax"))

    for artifact, tol in ((npz, 1e-3), (orbax_dir, 0.0)):
        out = load_pretrained_into(fresh, artifact)
        assert (jax.tree_util.tree_structure(out)
                == jax.tree_util.tree_structure(donor))
        for a, b in zip(jax.tree_util.tree_leaves(out),
                        jax.tree_util.tree_leaves(donor)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=tol, atol=tol)
