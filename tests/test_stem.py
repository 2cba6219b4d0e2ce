"""Fused Pallas stem kernel vs the stock XLA conv path (interpret mode).

The kernel must reproduce relu(conv(relu(conv(x)+b1))+b2) |> maxpool2x2 with
bf16 operands and f32 accumulation to bf16 resolution, including the SAME
zero-padding semantics at image borders (`lib/networks/network.py:176-180`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctpn_tpu.ops.stem_pallas import fused_stem_block


def _stock(x, w1, b1, w2, b2):
    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16),
            k.astype(jnp.bfloat16),
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    y = jnp.maximum(conv(x, w1) + b1, 0).astype(jnp.bfloat16)
    y = jnp.maximum(conv(y, w2) + b2, 0).astype(jnp.bfloat16)
    return jax.lax.reduce_window(
        y,
        jnp.asarray(-np.inf, jnp.bfloat16),
        jax.lax.max,
        (1, 2, 2, 1),
        (1, 2, 2, 1),
        "VALID",
    )


@pytest.mark.parametrize("shape", [(2, 64, 96), (1, 32, 48)])
def test_fused_stem_matches_stock_convs(rng, shape):
    n, h, w = shape
    x = jnp.asarray(rng.randn(n, h, w, 3).astype(np.float32) * 50)
    w1 = jnp.asarray(rng.randn(3, 3, 3, 64).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)

    got = np.asarray(fused_stem_block(x, w1, b1, w2, b2).astype(jnp.float32))
    want = np.asarray(_stock(x, w1, b1, w2, b2).astype(jnp.float32))
    assert got.shape == (n, h // 2, w // 2, 64)
    rel = np.abs(got - want) / (np.abs(want) + 1.0)
    # bf16 resolution: sums are reassociated (im2col vs feature groups)
    assert rel.max() < 1e-2, rel.max()


def test_fused_stem_border_ring_is_zero_padded(rng):
    """Bias must NOT leak through the SAME-padding ring: an all-zero image
    with a large conv1 bias exercises exactly the relu(bias)-vs-zero halo."""
    n, h, w = 1, 32, 48
    x = jnp.zeros((n, h, w, 3), jnp.float32)
    w1 = jnp.asarray(rng.randn(3, 3, 3, 64).astype(np.float32) * 0.05)
    b1 = jnp.full((64,), 3.0, jnp.float32)
    w2 = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
    b2 = jnp.zeros((64,), jnp.float32)

    got = np.asarray(fused_stem_block(x, w1, b1, w2, b2).astype(jnp.float32))
    want = np.asarray(_stock(x, w1, b1, w2, b2).astype(jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)


def test_fused_stem_rejects_bad_geometry(rng):
    x = jnp.zeros((1, 20, 48, 3), jnp.float32)  # H % 8 != 0
    w1 = jnp.zeros((3, 3, 3, 64), jnp.float32)
    b = jnp.zeros((64,), jnp.float32)
    w2 = jnp.zeros((3, 3, 64, 64), jnp.float32)
    with pytest.raises(ValueError):
        fused_stem_block(x, w1, b, w2, b)


def test_fused_stem_model_shares_param_tree(rng):
    """CTPN(fused_stem=True) must load any stock-trained checkpoint: same
    tree structure, same init values, same outputs to bf16 resolution."""
    import jax

    from ctpn_tpu.models.ctpn import CTPN

    x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32) * 30)
    stock, fused = CTPN(), CTPN(fused_stem=True)
    p0 = stock.init(jax.random.PRNGKey(0), x)["params"]
    p1 = fused.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    o0 = stock.apply({"params": p0}, x)
    o1 = fused.apply({"params": p0}, x)
    np.testing.assert_allclose(
        np.asarray(o0.cls_prob), np.asarray(o1.cls_prob), atol=5e-3
    )


class TestPackedStem:
    """Batch-packed block 1 (block-diagonal weights, VGG16Trunk.packed_stem).

    Packing two images into the channel dim must be EXACT in f32 — the zero
    blocks kill every cross-image term — and share the stock param tree so
    any checkpoint loads either path.
    """

    _stages = ((1, 2, 8), (2, 2, 16), (3, 1, 16), (4, 1, 16), (5, 1, 16))

    def _models(self):
        from ctpn_tpu.models.ctpn import CTPN

        kw = dict(dtype=jnp.float32, trunk_stages=self._stages)
        return CTPN(**kw), CTPN(packed_stem=True, **kw)

    def test_exact_in_f32_even_batch(self, rng):
        stock, packed = self._models()
        x = jnp.asarray(rng.randn(4, 64, 80, 3).astype(np.float32) * 50)
        params = stock.init(jax.random.PRNGKey(0), x)
        o0, o1 = stock.apply(params, x), packed.apply(params, x)
        for a, b in zip(o0, o1):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
            )

    def test_odd_batch_falls_back_to_stock(self, rng):
        stock, packed = self._models()
        x = jnp.asarray(rng.randn(3, 64, 80, 3).astype(np.float32) * 50)
        params = stock.init(jax.random.PRNGKey(0), x)
        o0, o1 = stock.apply(params, x), packed.apply(params, x)
        for a, b in zip(o0, o1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_shares_param_tree(self, rng):
        stock, packed = self._models()
        x = jnp.asarray(rng.randn(2, 64, 80, 3).astype(np.float32))
        p0 = stock.init(jax.random.PRNGKey(0), x)["params"]
        p1 = packed.init(jax.random.PRNGKey(0), x)["params"]
        assert (
            jax.tree_util.tree_structure(p0)
            == jax.tree_util.tree_structure(p1)
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_exclusive_with_fused_stem(self, rng):
        from ctpn_tpu.models.vgg import VGG16Trunk

        x = jnp.zeros((2, 32, 32, 3), jnp.float32)
        m = VGG16Trunk(fused_stem=True, packed_stem=True)
        with pytest.raises(ValueError, match="exclusive"):
            m.init(jax.random.PRNGKey(0), x)

    def test_factory_gates_packed_stem_to_test_graph(self):
        from ctpn_tpu.config import cfg
        from ctpn_tpu.models.factory import get_network

        old = cfg.TPU.PACKED_STEM
        try:
            cfg.TPU.PACKED_STEM = True
            assert get_network("VGGnet_test").packed_stem
            assert not get_network("VGGnet_train").packed_stem
            cfg.TPU.PACKED_STEM = False
            assert not get_network("VGGnet_test").packed_stem
        finally:
            cfg.TPU.PACKED_STEM = old
