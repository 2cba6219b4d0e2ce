"""Score an ARTIFACT against the reference demo goldens (res txt only).

Lightweight A/B harness for candidate weights: runs the demo contract
(CTPNPredictor, current config — line-union pass per cfg) over
/root/reference/data/demo and prints P/R/F vs /root/reference/data/results
at IoU 0.3 and 0.5 plus per-image counts. Unlike scripts/golden_demo.py it
writes no overlays and touches nothing in docs/.

    python scripts/eval_goldens.py --artifact /tmp/candidate.npz [--mode H]
"""

import argparse
import glob
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

REF_DEMO = "/root/reference/data/demo"
REF_RESULTS = "/root/reference/data/results"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--artifact", required=True)
    p.add_argument("--mode", default="H", choices=["H", "O"])
    args = p.parse_args(argv)

    from ctpn_tpu.eval import match_boxes, read_res_txt
    from ctpn_tpu.inference.pipeline import CTPNPredictor
    from ctpn_tpu.utils.image import load_image_bgr
    from ctpn_tpu.utils.weights import load_params

    predictor = CTPNPredictor(load_params(args.artifact), mode=args.mode)
    report = {"artifact": args.artifact, "mode": args.mode, "per_image": {}}
    totals = {0.3: [0, 0, 0], 0.5: [0, 0, 0]}  # matched, cand, ref
    for path in sorted(
        sum((glob.glob(osp.join(REF_DEMO, e)) for e in ("*.jpg", "*.png")),
            [])
    ):
        stem = osp.splitext(osp.basename(path))[0]
        recs = np.asarray(predictor.detect_image(load_image_bgr(path)))
        if len(recs):
            xs, ys = recs[:, 0:8:2], recs[:, 1:8:2]
            cand = np.stack(
                [xs.min(1), ys.min(1), xs.max(1), ys.max(1)], axis=1
            )
        else:
            cand = np.zeros((0, 4))
        ref = read_res_txt(osp.join(REF_RESULTS, f"res_{stem}.txt"))
        row = {"boxes": len(cand), "golden": len(ref)}
        for iou in (0.3, 0.5):
            m = match_boxes(cand, ref, iou_thresh=iou)
            row[f"matched@{iou}"] = m
            totals[iou][0] += m
            totals[iou][1] += len(cand)
            totals[iou][2] += len(ref)
        report["per_image"][stem] = row
    for iou, (m, c, r) in totals.items():
        prec, rec = m / max(c, 1), m / max(r, 1)
        report[f"summary@{iou}"] = {
            "precision": round(prec, 4),
            "recall": round(rec, 4),
            "f_measure": round(2 * prec * rec / max(prec + rec, 1e-9), 4),
        }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
