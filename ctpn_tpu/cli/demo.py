"""Inference demo CLI (reference `ctpn/demo.py` + `ctpn/demo_pb.py`).

    python -m ctpn_tpu.cli.demo --cfg configs/text.yml \
        --artifact <exported params dir> [--images data/demo] \
        [--output data/results] [--mode H|O]

Like the reference it writes ``res_<stem>.txt`` corner CSVs and overlay
images scaled back to the original size (`demo.py:28-52`). Unlike the
reference there is no py_func/host NMS split — the whole detection runs as
one jit program on device; and any number of images stream through batched.
"""

from __future__ import annotations

import argparse
import glob
import os
import os.path as osp

import numpy as np
from PIL import Image, ImageDraw

from ctpn_tpu.config import cfg, cfg_from_file
from ctpn_tpu.inference.pipeline import CTPNPredictor
from ctpn_tpu.utils.image import load_image_bgr
from ctpn_tpu.utils.timer import Stopwatch


def draw_and_save(im_bgr: np.ndarray, recs: np.ndarray, out_img: str, out_txt: str):
    """Write overlay + res_*.txt (reference `demo.py:28-52` contract:
    min/max corner CSV lines terminated with CRLF)."""
    img = Image.fromarray(im_bgr[..., ::-1].astype(np.uint8))
    draw = ImageDraw.Draw(img)
    with open(out_txt, "w") as f:
        for box in recs:
            xs = box[0:8:2]
            ys = box[1:8:2]
            if box[8] >= 0.9:
                color = (255, 0, 0)
            elif box[8] >= 0.8:
                color = (0, 255, 0)
            else:
                color = (255, 255, 0)
            quad = [
                (box[0], box[1]), (box[2], box[3]),
                (box[6], box[7]), (box[4], box[5]),
            ]
            draw.polygon(quad, outline=color)
            line = ",".join(
                str(int(v))
                for v in (min(xs), min(ys), max(xs), max(ys))
            )
            f.write(line + "\r\n")
    img.save(out_img)


def main(argv=None):
    p = argparse.ArgumentParser(description="CTPN text detection demo")
    p.add_argument("--cfg", default=None)
    p.add_argument("--artifact", default=None,
                   help="exported params dir (export_model.py output)")
    p.add_argument("--images", default="data/demo")
    p.add_argument("--output", default="data/results")
    p.add_argument("--mode", default=None, choices=[None, "H", "O"])
    p.add_argument(
        "--host-postprocess",
        action="store_true",
        help="run proposal decode + connector on the host (demo_pb.py parity "
        "mode: the device program stops at the raw head outputs)",
    )
    p.add_argument(
        "--frozen", default=None,
        help="frozen artifact (.npz from export_model.py --frozen) — the "
        "demo_pb.py flow: run serialized programs without building the model",
    )
    p.add_argument(
        "--set", dest="set_cfg", nargs="*", default=None, metavar="KEY VALUE",
        help="config overrides, e.g. --set TEXT.LINE_MERGE_GAP_RATIO 0 "
        "for reference-exact raw connector output",
    )
    args = p.parse_args(argv)

    if args.cfg:
        cfg_from_file(args.cfg)
    if args.set_cfg:
        from ctpn_tpu.config import cfg_from_list

        cfg_from_list(args.set_cfg)
    if args.mode:
        cfg.TEST.DETECT_MODE = args.mode

    if args.frozen:
        from ctpn_tpu.inference.frozen import FrozenCTPN

        predictor = FrozenCTPN(args.frozen)
        baked = predictor.meta["mode"]
        if args.mode and args.mode != baked:
            raise SystemExit(
                f"--mode {args.mode} conflicts with the artifact's baked "
                f"mode {baked!r}; re-export with --frozen for that mode"
            )
    elif args.artifact:
        from ctpn_tpu.utils.weights import load_params

        params = load_params(args.artifact)
    else:
        # random weights: pipeline/debug mode (no released ckpt available)
        import jax
        import jax.numpy as jnp

        from ctpn_tpu.models.factory import get_network

        print("WARNING: no --artifact given; using randomly initialized weights")
        model = get_network("VGGnet_test")
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 608, 608, 3), jnp.float32)
        )["params"]

    if not args.frozen:
        predictor = CTPNPredictor(params)
        predictor.warmup()
    elif args.host_postprocess:
        raise SystemExit("--host-postprocess needs live params, not --frozen")

    os.makedirs(args.output, exist_ok=True)
    paths = sorted(
        sum((glob.glob(osp.join(args.images, ext)) for ext in
             ("*.png", "*.jpg", "*.jpeg")), [])
    )
    timer = Stopwatch()
    for path in paths:
        im = load_image_bgr(path)
        with timer:
            if args.host_postprocess:
                recs = predictor.detect_image_host(im)
            else:
                recs = predictor.detect_image(im)
        stem = osp.splitext(osp.basename(path))[0]
        draw_and_save(
            im,
            recs,
            osp.join(args.output, osp.basename(path)),
            osp.join(args.output, f"res_{stem}.txt"),
        )
        print(f"Detection took {timer.last:.3f}s for {len(recs)} lines: {path}")


if __name__ == "__main__":
    main()
