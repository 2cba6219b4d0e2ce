"""Stage breakdown of the batch-48 inference program on real content.

Times nested prefixes of the pipeline (trained artifact, demo photos +
synth renders — the headline bench content) and reports deltas:

  forward (trunk+BiLSTM+heads)  ->  + proposal decode  ->  + connector

then micro-times the proposal layer's internals (payload sort, fused NMS,
compaction argsort) and the detector-stage NMS on the REAL head outputs of
that batch, so data-dependent costs (sweep counts, early exit) are
realistic.
"""

import os.path as osp
import sys
import time

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import numpy as np

from bench import _real_batch  # noqa: E402
from ctpn_tpu.config import cfg  # noqa: E402
from ctpn_tpu.inference.pipeline import build_detect_fn, forward_features  # noqa: E402
from ctpn_tpu.models.factory import get_network  # noqa: E402
from ctpn_tpu.ops.proposal import proposal_layer  # noqa: E402
from ctpn_tpu.utils.compilation import ensure_compilation_cache  # noqa: E402
from ctpn_tpu.utils.weights import load_params  # noqa: E402

ensure_compilation_cache()

BH, BW, BATCH, ITERS = 608, 912, 48, 14
ARTIFACT = osp.join(ROOT, "data", "artifacts", "ctpn_synth_f16.npz")


def timeit(name, fn, *args, iters=ITERS):
    # tunnel rule (docs/PERFORMANCE.md): reduce to a SCALAR inside jit
    # before fetching — full-tensor fetches run ~10 MB/s and pollute timing
    red = jax.jit(
        lambda *a: sum(
            jnp.sum(l.astype(jnp.float32))
            for l in jax.tree_util.tree_leaves(fn(*a))
        )
    )
    np.asarray(red(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = red(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:52s} {dt:8.2f} ms/batch{BATCH}")
    return dt


def main():
    model = get_network("VGGnet_test")
    params = load_params(ARTIFACT)
    images, infos = _real_batch(BATCH, BH, BW)
    images = jnp.asarray(images)
    infos = jnp.asarray(infos)

    fwd = jax.jit(lambda p, x: forward_features(model, p, x))
    det_props = jax.jit(build_detect_fn(model, mode="H", with_lines=False))
    det_full = jax.jit(build_detect_fn(model, mode="H"))

    t_fwd = timeit("forward (trunk+BiLSTM+heads)", fwd, params, images)
    t_prop = timeit("forward + proposal decode", det_props, params, images, infos)
    t_full = timeit("forward + proposal + connector", det_full, params, images, infos)
    print(f"{'  -> proposal stage delta':52s} {t_prop - t_fwd:8.2f}")
    print(f"{'  -> connector stage delta':52s} {t_full - t_prop:8.2f}")

    # ---- proposal-layer internals on the REAL head outputs ----------------
    outs = fwd(params, images)
    prob = jax.device_put(outs.cls_prob)
    pred = jax.device_put(outs.bbox_pred)
    pre_n = cfg.TEST.RPN_PRE_NMS_TOP_N
    post_n = cfg.TEST.RPN_POST_NMS_TOP_N

    prop_fn = jax.jit(
        lambda pr, pd, nf: jax.vmap(
            lambda a, b, c: proposal_layer(
                a, b, c, pre_nms_top_n=pre_n, post_nms_top_n=post_n,
                nms_thresh=cfg.TEST.RPN_NMS_THRESH,
                min_size=cfg.TEST.RPN_MIN_SIZE,
            )
        )(pr, pd, nf)
    )
    timeit("proposal_layer alone (vmapped)", prop_fn, prob, pred, infos)

    # payload sort alone at K = H*W*A
    def sort_only(pr, pd):
        def one(prob1, pred1):
            k = prob1.size
            scores = prob1.reshape(k)
            boxes = pred1.reshape(k, 4)
            res = jax.lax.sort(
                (scores, boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3],
                 scores > 0.5),
                dimension=0, is_stable=True, num_keys=1,
            )
            return res[0]

        return jax.vmap(one)(pr, pd)

    timeit("payload sort alone (K=21660, 6 operands)", jax.jit(sort_only), prob, pred)

    # fused NMS alone on the real sorted candidates
    from ctpn_tpu.ops.nms_fused import nms_keep_sorted_fused

    def sorted_cands(pr, pd, nf):
        def one(prob1, pred1, info1):
            from ctpn_tpu.ops.anchors import shifted_anchors
            from ctpn_tpu.ops.boxes import bbox_transform_inv, clip_boxes

            fh, fw, a = prob1.shape
            anchors = jnp.asarray(shifted_anchors(fh, fw))
            k = fh * fw * a
            boxes = clip_boxes(
                bbox_transform_inv(anchors, pred1.reshape(k, 4)),
                info1[0], info1[1],
            )
            scores = jnp.where(prob1.reshape(k) > 0.0, prob1.reshape(k), -jnp.inf)
            res = jax.lax.sort(
                (scores, boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]),
                dimension=0, is_stable=True, num_keys=1,
            )
            lo = max(k - pre_n, 0)
            bx = jnp.flip(jnp.stack(res[1:5], 1)[lo:], 0)
            vd = jnp.flip(jnp.isfinite(res[0][lo:]), 0)
            return bx, vd

        return jax.vmap(one)(pr, pd, nf)

    bx, vd = jax.jit(sorted_cands)(prob, pred, infos)
    bx = jax.device_put(bx)
    vd = jax.device_put(vd)
    nms_fn = jax.jit(
        lambda b, v: nms_keep_sorted_fused(
            b, v, cfg.TEST.RPN_NMS_THRESH, max_keep=post_n,
            block=int(cfg.TPU.NMS_FUSED_BLOCK),
        )
    )
    timeit(f"fused NMS alone (N={bx.shape[1]}, batched)", nms_fn, bx, vd)

    # detector-stage NMS on the real proposals (1000 boxes, 0.2 thresh)
    props, _ = det_props(params, images, infos)
    rois = jax.device_put(props.rois)
    pvalid = jax.device_put(props.valid)

    det_nms = jax.jit(
        lambda r, v: nms_keep_sorted_fused(
            r[:, :, 1:5], v, cfg.TEXT.TEXT_PROPOSALS_NMS_THRESH,
            block=int(cfg.TPU.NMS_FUSED_BLOCK),
        )
    )
    timeit("detector NMS (1000 boxes, fused kernel)", det_nms, rois, pvalid)


if __name__ == "__main__":
    main()
