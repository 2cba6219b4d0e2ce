"""Holdout detection quality of an ARTIFACT on the seeded synthetic corpus.

The synth generator is deterministic (`data/synth.py::generate_dataset`,
seed 3), so the training corpus of any past run is reproducible from the
generator version in git — this scores a committed artifact on the same
holdout split `scripts/train_synth.py` would have used, without needing the
original /tmp training root to still exist.

    python scripts/eval_holdout.py --artifact data/artifacts/ctpn_synth_f16.npz \
        --images 800 --holdout 32

Prints one JSON object with P/R/F at several IoU thresholds under BOTH GT
line merges (connector-rule = upper bound sharing the detector's bias;
geometric = the independent number quality claims should quote).
"""

import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--artifact", default="data/artifacts/ctpn_synth_f16.npz")
    p.add_argument("--root", default="/tmp/ctpn_synth_eval")
    p.add_argument("--images", type=int, default=800,
                   help="training-set size of the run being scored (the "
                        "holdout is the stems AFTER these)")
    p.add_argument("--holdout", type=int, default=32)
    p.add_argument("--ious", default="0.3,0.5,0.6")
    args = p.parse_args(argv)

    from ctpn_tpu.data.synth import generate_dataset
    from ctpn_tpu.eval import (compare_result_dirs, merge_words_to_lines,
                               merge_words_to_lines_geometric)
    from ctpn_tpu.inference.pipeline import CTPNPredictor
    from ctpn_tpu.inference.streaming import stream_detect
    from ctpn_tpu.utils.weights import load_params

    n_total = args.images + args.holdout
    img_dir = osp.join(args.root, "raw", "image")
    have = (len([f for f in os.listdir(img_dir) if f.endswith(".jpg")])
            if osp.isdir(img_dir) else 0)
    if have != n_total:
        img_dir, gt_dir = generate_dataset(
            osp.join(args.root, "raw"), n_images=n_total)
    else:
        gt_dir = osp.join(args.root, "raw", "label")
    stems = sorted(osp.splitext(f)[0]
                   for f in os.listdir(img_dir) if f.endswith(".jpg"))
    holdout = stems[-args.holdout:]

    predictor = CTPNPredictor(load_params(args.artifact))
    res_dir = osp.join(args.root, "results")
    os.makedirs(res_dir, exist_ok=True)
    paths = [osp.join(img_dir, s + ".jpg") for s in holdout]
    for path, recs in stream_detect(paths, predictor, batch_size=4):
        stem = osp.splitext(osp.basename(path))[0]
        with open(osp.join(res_dir, f"res_{stem}.txt"), "w") as f:
            for box in recs:
                xs, ys = box[0:8:2], box[1:8:2]
                f.write(f"{int(min(xs))},{int(min(ys))},"
                        f"{int(max(xs))},{int(max(ys))}\r\n")

    merges = {"connector": merge_words_to_lines,
              "geometric": merge_words_to_lines_geometric}
    ref_dirs = {}
    for label, merge in merges.items():
        d = osp.join(args.root, f"gt_{label}")
        os.makedirs(d, exist_ok=True)
        for s in holdout:
            words = []
            with open(osp.join(gt_dir, f"gt_{s}.txt")) as f:
                for line in f:
                    v = line.strip().split(",")[:8]
                    if len(v) == 8:
                        xs = [float(v[i]) for i in (0, 2, 4, 6)]
                        ys = [float(v[i]) for i in (1, 3, 5, 7)]
                        words.append([min(xs), min(ys), max(xs), max(ys)])
            words = np.asarray(words, np.float64).reshape(-1, 4)
            with open(osp.join(d, f"res_{s}.txt"), "w") as out:
                for x0, y0, x1, y1 in merge(words):
                    out.write(f"{int(x0)},{int(y0)},{int(x1)},{int(y1)}\r\n")
        ref_dirs[label] = d

    report = {"artifact": args.artifact, "holdout_images": args.holdout}
    for label, d in ref_dirs.items():
        for iou in [float(v) for v in args.ious.split(",")]:
            score = compare_result_dirs(res_dir, d, iou_thresh=iou)
            report[f"{label}@{iou}"] = {
                k: round(score[k], 4) if isinstance(score[k], float)
                else score[k]
                for k in ("precision", "recall", "f_measure",
                          "candidate_boxes", "reference_boxes", "matched")
            }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
