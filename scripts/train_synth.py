"""End-to-end validation run: synthesize data, train, export, detect, score.

    python scripts/train_synth.py --iters 1000 --images 200 --root /tmp/ctpn_synth

Pipeline exercised: synth generator -> prepare (strip split + VOC tree) ->
VOC loader -> DP train -> orbax snapshot -> artifact export -> streaming
detection on held-out images -> box-level P/R/F vs the synthetic ground
truth (via ctpn_tpu.eval).
"""

import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/ctpn_synth")
    p.add_argument("--images", type=int, default=200)
    p.add_argument("--holdout", type=int, default=16)
    p.add_argument("--iters", type=int, default=1000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--stepsize", type=int, default=None,
                   help="LR step-decay boundary (cfg.TRAIN.STEPSIZE)")
    p.add_argument("--ohem", action="store_true",
                   help="enable online hard example mining "
                        "(cfg.TRAIN.OHEM): hardest-negative selection in "
                        "the loss instead of random bg subsampling")
    p.add_argument("--no-dp", action="store_true")
    p.add_argument("--restore", action="store_true",
                   help="resume training from the newest orbax snapshot")
    p.add_argument("--init-artifact", default=None,
                   help="initialize params from an exported inference "
                        "artifact (.npz or orbax dir) before training — "
                        "fine-tune from shipped weights instead of from "
                        "scratch (ignored once --restore finds a snapshot)")
    p.add_argument("--train-only", action="store_true",
                   help="skip export + holdout eval (segment of a longer run)")
    p.add_argument("--segment-iters", type=int, default=None,
                   help="run training in child processes of <= this many "
                        "iters each with orbax resume between them. "
                        "Workaround for the axon-tunnel client leaking "
                        "~batch-bytes of host RAM per H2D transfer "
                        "(~13 MB/iter at batch 8 -> OOM near 9k iters on a "
                        "125 GB host); each segment's leak dies with its "
                        "process. Irrelevant on real TPU hosts.")
    args = p.parse_args()

    if args.segment_iters and args.iters > args.segment_iters:
        import subprocess

        # normalize "--flag=value" to "--flag value" so rewrites below work
        base = []
        for a in sys.argv[1:]:
            if a.startswith("--") and "=" in a:
                base.extend(a.split("=", 1))
            else:
                base.append(a)
        if "--segment-iters" in base:
            i = base.index("--segment-iters")
            del base[i:i + 2]
        import time as _time

        # resume point: skip segments the checkpoint already covers
        ckpt_dir = osp.join(args.root, "output", "checkpoints")
        steps = ([int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
                 if osp.isdir(ckpt_dir) else [])
        done = max(steps) if steps else 0
        first = True
        while done < args.iters:
            done = min(done + args.segment_iters, args.iters)
            seg = [sys.executable, osp.abspath(__file__), *base]
            if "--iters" in seg:
                seg[seg.index("--iters") + 1] = str(done)
            else:
                seg.extend(["--iters", str(done)])
            if (steps or not first) and "--restore" not in seg:
                seg.append("--restore")
            if done < args.iters:
                seg.append("--train-only")
            if not first:
                _time.sleep(20)  # let the tunnel release the previous client
            first = False
            print(f"== segment -> iter {done} ==", flush=True)
            subprocess.run(seg, check=True)
        return

    from ctpn_tpu.config import cfg
    from ctpn_tpu.data.prepare import split_labels, to_voc
    from ctpn_tpu.data.synth import generate_dataset

    os.makedirs(args.root, exist_ok=True)

    print("== generating synthetic dataset ==", flush=True)
    raw = osp.join(args.root, "raw")
    img_dir, gt_dir = osp.join(raw, "image"), osp.join(raw, "label")
    n_total = args.images + args.holdout
    have = (
        len([f for f in os.listdir(img_dir) if f.endswith(".jpg")])
        if osp.isdir(img_dir) else 0
    )
    if have != n_total:  # deterministic (seeded); reuse when complete
        img_dir, gt_dir = generate_dataset(raw, n_images=n_total)
    # holdout split: move the tail out of the training set
    all_stems = sorted(
        osp.splitext(f)[0] for f in os.listdir(img_dir) if f.endswith(".jpg")
    )
    holdout = all_stems[-args.holdout:]

    work = osp.join(args.root, "work")
    stems = split_labels(img_dir, gt_dir, osp.join(work, "re_image"),
                         osp.join(work, "label_tmp"))
    # drop holdout stems from the label dir before VOC conversion
    for s in holdout:
        lp = osp.join(work, "label_tmp", s + ".txt")
        if osp.exists(lp):
            os.remove(lp)
    voc = osp.join(args.root, "VOCdevkit2007")
    to_voc(osp.join(work, "label_tmp"), osp.join(work, "re_image"),
           osp.join(voc, "VOC2007"))
    print(f"prepared {len(stems) - len(holdout)} train images", flush=True)

    print("== training ==", flush=True)
    cfg.TRAIN.LEARNING_RATE = args.lr
    if args.stepsize:
        cfg.TRAIN.STEPSIZE = args.stepsize
    cfg.TRAIN.OHEM = bool(args.ohem)
    cfg.TRAIN.SNAPSHOT_ITERS = max(200, args.iters // 6)
    cfg.TRAIN.DISPLAY = 20
    cfg.TRAIN.USE_FLIPPED = True

    from ctpn_tpu.data.roidb import get_training_roidb
    from ctpn_tpu.data.voc import PascalVOC
    from ctpn_tpu.training.solver import train_net

    imdb = PascalVOC("trainval", "2007", devkit_path=voc)
    roidb = get_training_roidb(imdb)
    out_dir = osp.join(args.root, "output")
    metrics = train_net(
        roidb, out_dir, max_iters=args.iters, restore=args.restore,
        data_parallel=not args.no_dp, batch_size=args.batch,
        pretrained_model=args.init_artifact,
    )
    print("final:", json.dumps(metrics), flush=True)
    if args.train_only:
        return

    print("== export + detect holdout ==", flush=True)
    from ctpn_tpu.cli.export_model import main as export_main

    art = osp.join(args.root, "artifact")
    export_main(["--ckpt", out_dir, "--out", art])

    from ctpn_tpu.inference.pipeline import CTPNPredictor
    from ctpn_tpu.inference.streaming import stream_detect
    from ctpn_tpu.utils.weights import load_params

    predictor = CTPNPredictor(load_params(art))
    paths = [osp.join(img_dir, s + ".jpg") for s in holdout]
    res_dir = osp.join(args.root, "results")
    ref_dir = osp.join(args.root, "gt_results")
    os.makedirs(res_dir, exist_ok=True)
    os.makedirs(ref_dir, exist_ok=True)
    for path, recs in stream_detect(paths, predictor, batch_size=4):
        stem = osp.splitext(osp.basename(path))[0]
        with open(osp.join(res_dir, f"res_{stem}.txt"), "w") as f:
            for box in recs:
                xs, ys = box[0:8:2], box[1:8:2]
                f.write(f"{int(min(xs))},{int(min(ys))},{int(max(xs))},{int(max(ys))}\r\n")
    # ground truth as res-format for the comparator. GT is PER WORD
    # (ICDAR-style); the detector emits connector-merged LINES — merge the
    # words with the connector's own grouping rule so the reference set is
    # the lines a perfect detector could produce (ctpn_tpu.eval docstring).
    import numpy as np

    from ctpn_tpu.eval import (compare_result_dirs, merge_words_to_lines,
                               merge_words_to_lines_geometric)

    # two GT line merges: "connector" uses the detector's own grouping rule
    # (upper bound, shares the detector's bias), "geometric" is the
    # independent criterion quality claims should quote (VERDICT r2 #6)
    ref_geo_dir = ref_dir + "_geo"
    os.makedirs(ref_geo_dir, exist_ok=True)
    for s in holdout:
        words = []
        with open(osp.join(gt_dir, f"gt_{s}.txt")) as f:
            for line in f:
                v = line.strip().split(",")[:8]
                if len(v) == 8:
                    xs = [float(v[i]) for i in (0, 2, 4, 6)]
                    ys = [float(v[i]) for i in (1, 3, 5, 7)]
                    words.append([min(xs), min(ys), max(xs), max(ys)])
        words = np.asarray(words).reshape(-1, 4)
        for d, merge in ((ref_dir, merge_words_to_lines),
                         (ref_geo_dir, merge_words_to_lines_geometric)):
            with open(osp.join(d, f"res_{s}.txt"), "w") as out:
                for x0, y0, x1, y1 in merge(words):
                    out.write(f"{int(x0)},{int(y0)},{int(x1)},{int(y1)}\r\n")

    for label, d in (("connector-merge", ref_dir),
                     ("geometric-merge", ref_geo_dir)):
        score = compare_result_dirs(res_dir, d)
        score.pop("per_file")
        print(f"holdout detection vs gt ({label}):",
              json.dumps(score, indent=2))


if __name__ == "__main__":
    main()
