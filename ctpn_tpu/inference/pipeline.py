"""End-to-end jit inference: padded image batch -> text-line records.

The reference splits inference across graph execution + three host stages
(`test.py:40-58` -> `proposal_layer_tf.py` py_func -> `detectors.py` on
host). Here ONE jit program per bucket shape runs: mean-subtract -> VGG16 ->
BiLSTM -> heads -> proposal decode (incl. Pallas NMS) -> text connector —
no device->host round-trip until the final padded line records are pulled.

Throughput features:
* per-bucket compiled executables, cached;
* batch axis is vmapped and can be sharded over a mesh (parallel/dp.py);
* donated input buffers and async dispatch — the host pipelines the next
  batch while the device runs (double buffering lives in data/pipeline.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ctpn_tpu.config import cfg
from ctpn_tpu.models.ctpn import CTPN
from ctpn_tpu.ops.proposal import proposal_layer
from ctpn_tpu.postprocess.detector import detect_lines
from ctpn_tpu.utils.image import load_image_bgr, prep_image, resize_im


def unscale_records(
    recs: np.ndarray, count: int, f1: float, info, y_off: float = 0.0
) -> np.ndarray:
    """Trim padded line records, apply the (config-gated) scale-aware
    line-union pass, and map boxes back to ORIGINAL image coords (the
    demo's double-resize contract, `demo.py:47-51`). Shared by the
    single-image, streaming, serving, and frozen-artifact paths.

    ``y_off`` undoes prep_image's TOP_PAD shift (resized-frame pixels):
    boxes move back up and clip at the true top edge."""
    from ctpn_tpu.postprocess.merge import maybe_merge_line_records

    out = np.asarray(recs)[:count].astype(np.float64)
    out = maybe_merge_line_records(out)
    if y_off and len(out):
        out[:, 1:8:2] = np.maximum(out[:, 1:8:2] - y_off, 0.0)
    total_scale = f1 * float(info[2])
    if len(out):
        out[:, :8] /= total_scale
    return out


def forward_features(model: CTPN, params, images: jnp.ndarray):
    """Mean-subtract (fused on device) + model forward.

    ``images`` may be uint8 (the wire format — 4x less host->device
    traffic) or float32; normalization happens here on device either way.
    """
    means = jnp.asarray(cfg.PIXEL_MEANS, dtype=jnp.float32)
    x = images.astype(jnp.float32) - means  # BGR means over (N, H, W, 3)
    return model.apply({"params": params}, x)


def build_detect_fn(
    model: CTPN,
    mode: str = "H",
    pre_nms_top_n: Optional[int] = None,
    post_nms_top_n: Optional[int] = None,
    max_lines: Optional[int] = None,
    with_lines: bool = True,
):
    """Returns jit-able fn(params, images, im_info) -> (Proposals, TextLines).

    ``images``: (N, bh, bw, 3) uint8 or float32 BGR (not mean-subtracted),
    ``im_info``: (N, 3).
    """
    pre_n = pre_nms_top_n or cfg.TEST.RPN_PRE_NMS_TOP_N
    post_n = post_nms_top_n or cfg.TEST.RPN_POST_NMS_TOP_N
    nms_t = cfg.TEST.RPN_NMS_THRESH
    min_sz = cfg.TEST.RPN_MIN_SIZE
    t = cfg.TEXT
    lines_kw = dict(
        mode=mode,
        max_lines=max_lines or cfg.TPU.MAX_LINES,
        min_score=t.TEXT_PROPOSALS_MIN_SCORE,
        nms_thresh=t.TEXT_PROPOSALS_NMS_THRESH,
        max_gap=t.MAX_HORIZONTAL_GAP,
        min_v_overlaps=t.MIN_V_OVERLAPS,
        min_size_sim=t.MIN_SIZE_SIM,
        min_ratio=t.MIN_RATIO,
        line_min_score=t.LINE_MIN_SCORE,
        min_width=float(t.TEXT_PROPOSALS_WIDTH * t.MIN_NUM_PROPOSALS),
    )

    def detect(params, images, im_info):
        outs = forward_features(model, params, images)

        def per_image(prob, pred, info):
            props = proposal_layer(
                prob, pred, info,
                pre_nms_top_n=pre_n, post_nms_top_n=post_n,
                nms_thresh=nms_t, min_size=min_sz,
            )
            if not with_lines:
                return props, None
            # chains advance >= 1 column per edge: the bucket's 16-px column
            # count bounds path length (fewer closure squarings)
            lines = detect_lines(
                props.rois, props.valid, info,
                max_chain_len=prob.shape[1], **lines_kw,
            )
            return props, lines

        return jax.vmap(per_image)(outs.cls_prob, outs.bbox_pred, im_info)

    return detect


class CTPNPredictor:
    """Stateful convenience wrapper: params + per-bucket compiled programs.

    Plays the role of the reference's demo session setup (`demo.py:79-97`),
    including warm-up compilation.
    """

    def __init__(
        self,
        params,
        model: Optional[CTPN] = None,
        mode: Optional[str] = None,
    ):
        from ctpn_tpu.models.factory import get_network
        from ctpn_tpu.utils.compilation import ensure_compilation_cache

        ensure_compilation_cache()
        self.model = model or get_network("VGGnet_test")
        self.params = params
        self.mode = mode or cfg.TEST.DETECT_MODE
        self._fns: Dict[Tuple[int, int], Any] = {}
        self._detect = build_detect_fn(self.model, mode=self.mode)

    def _fn_for(self, shape: Tuple[int, int]):
        if shape not in self._fns:
            self._fns[shape] = jax.jit(self._detect)
        return self._fns[shape]

    def run_batch(self, images: np.ndarray, im_info: np.ndarray):
        """(N, bh, bw, 3) uint8/float32 batch -> (Proposals, TextLines) on device."""
        fn = self._fn_for(images.shape[1:3])
        return fn(self.params, jnp.asarray(images), jnp.asarray(im_info))

    def run_padded(self, images, infos, batch_size: int):
        """Run a possibly-partial batch padded to ``batch_size``.

        Padding keeps ONE program per bucket — a fresh batch dimension would
        compile a new XLA program (minutes on TPU). Callers slice outputs by
        the true item count (padded rows are garbage).
        """
        pad = batch_size - len(images)
        stacked = np.stack(list(images) + [images[0]] * pad)
        stacked_i = np.stack(list(infos) + [infos[0]] * pad)
        return self.run_batch(stacked, stacked_i)

    def detect_image(self, im_bgr: np.ndarray) -> np.ndarray:
        """One uint8 BGR image -> (M, 9) line records in ORIGINAL image coords.

        Applies the demo's double resize (`demo.py:59-60` then
        `test.py:18-24`) and maps boxes back by the total scale factor like
        `demo.py:47-51`.
        """
        resized, f1 = resize_im(im_bgr, cfg.TEXT.SCALE, cfg.TEXT.MAX_SCALE)
        data, info, pad = prep_image(resized)
        props, lines = self.run_batch(data[None], info[None])
        return unscale_records(
            np.asarray(lines.recs[0]), int(lines.count[0]), f1, info,
            y_off=pad,
        )

    def detect_path(self, path: str) -> np.ndarray:
        return self.detect_image(load_image_bgr(path))

    def detect_image_host(self, im_bgr: np.ndarray) -> np.ndarray:
        """demo_pb.py parity mode: device runs only up to the raw head
        tensors; proposal decode and the text connector run on the host
        (NumPy oracles / native C++), like the frozen-graph flow
        (`demo_pb.py:73-98`)."""
        from ctpn_tpu.ops.anchors import shifted_anchors
        from ctpn_tpu.postprocess.oracle import detect_np
        from ctpn_tpu.utils.host_ref import proposal_layer_np

        resized, f1 = resize_im(im_bgr, cfg.TEXT.SCALE, cfg.TEXT.MAX_SCALE)
        data, info, pad = prep_image(resized)
        if not hasattr(self, "_fwd_fns"):
            self._fwd_fns = {}
        shape = data.shape[:2]
        if shape not in self._fwd_fns:
            self._fwd_fns[shape] = jax.jit(
                lambda p, x: forward_features(self.model, p, x)
            )
        outs = self._fwd_fns[shape](self.params, jnp.asarray(data[None]))
        th, tw = int(info[0]) // 16, int(info[1]) // 16
        prob = np.asarray(outs.cls_prob[0])[:th, :tw]
        pred = np.asarray(outs.bbox_pred[0])[:th, :tw]
        blob = proposal_layer_np(
            prob, pred, info, shifted_anchors(th, tw),
            pre_nms_top_n=cfg.TEST.RPN_PRE_NMS_TOP_N,
            post_nms_top_n=cfg.TEST.RPN_POST_NMS_TOP_N,
            nms_thresh=cfg.TEST.RPN_NMS_THRESH,
            min_size=cfg.TEST.RPN_MIN_SIZE,
        )
        recs = detect_np(
            blob[:, 1:5].astype(np.float64),
            blob[:, 0].astype(np.float64),
            info,
            mode=self.mode,
        ).astype(np.float64)
        return unscale_records(recs, len(recs), f1, info, y_off=pad)

    def warmup(self, bucket: Optional[Tuple[int, int]] = None, batch: int = 1):
        """Compile-and-run on a gray dummy image (reference `demo.py:95-97`)."""
        bh, bw = bucket or tuple(cfg.TPU.BUCKETS[0])
        # uint8, matching the real wire format (a float dummy would compile
        # a second program the serving path never uses)
        img = np.full((batch, bh, bw, 3), 128, np.uint8)
        info = np.tile(np.array([bh, bw, 1.0], np.float32), (batch, 1))
        props, lines = self.run_batch(img, info)
        # fetch a VALUE: on tunnel backends block_until_ready returns
        # before compilation/execution actually finish, which would shift
        # the compile wait onto the first real request (bench.py has the
        # same workaround)
        np.asarray(lines.count)
