"""Digest a training run's metrics.jsonl into the committed training report.

    python scripts/training_report.py --metrics /tmp/ctpn_synth/output/metrics.jsonl \
        --batch 8 --out docs/TRAINING.md [--extra-json '{"holdout": ...}']

Verifies the schedule end to end: windowed loss curve, the LR values around
every step-decay boundary, and the Adam UPDATE norm before/after each
boundary — the reference's decay never reached its optimizer
(`lib/fast_rcnn/train.py:96,141-175` builds Adam with the initial Python
float), so this is the behavior the re-design had to fix, not copy.
"""

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def window(rows, key, lo, hi):
    v = [r[key] for r in rows if lo <= r["step"] < hi]
    return float(np.mean(v)) if v else float("nan")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--metrics", required=True)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--out", default="docs/TRAINING.md")
    p.add_argument("--extra-json", default=None,
                   help="extra result dict to append (e.g. holdout P/R/F)")
    args = p.parse_args(argv)

    rows = [json.loads(l) for l in open(args.metrics) if l.strip()]
    rows.sort(key=lambda r: r["step"])
    steps = [r["step"] for r in rows]
    total = steps[-1]

    # LR boundaries actually crossed in this run
    lrs = [(r["step"], r["learning_rate"]) for r in rows]
    bounds = [
        (s, prev_lr, lr)
        for (ps, prev_lr), (s, lr) in zip(lrs, lrs[1:])
        if lr != prev_lr
    ]

    lines = [
        "# Training report (synthetic corpus, reference-shaped schedule)",
        "",
        f"Run: {total} iters, batch {args.batch}, single v5e chip through the",
        "tunnel backend; Adam + global-norm clip 10, step-decay LR (the",
        "50k-iter reference recipe `ctpn/text.yml:10-16` compressed: same",
        "shape, boundaries crossed for real).",
        "",
        "## Loss curve (windowed means)",
        "",
        "| steps | total loss | model loss | cls | box |",
        "|---|---|---|---|---|",
    ]
    n_win = 10
    edges = np.linspace(0, total + 1, n_win + 1).astype(int)
    for lo, hi in zip(edges, edges[1:]):
        lines.append(
            f"| {lo}-{hi} | {window(rows, 'total_loss', lo, hi):.3f} "
            f"| {window(rows, 'model_loss', lo, hi):.3f} "
            f"| {window(rows, 'rpn_cls_loss', lo, hi):.3f} "
            f"| {window(rows, 'rpn_box_loss', lo, hi):.3f} |"
        )

    lines += [
        "",
        "## LR decay boundaries: the decay reaches the optimizer",
        "",
        "The reference's LR decay mutates a TF variable its Adam never reads",
        "(`train.py:96`), so its published recipe effectively trains at a",
        "constant LR. Here the schedule feeds optax directly; the Adam",
        "*update norm* (post-preconditioning step size) must drop with it:",
        "",
        "| boundary step | lr before -> after | mean update-norm before | after | ratio |",
        "|---|---|---|---|---|",
    ]
    for s, lr0, lr1 in bounds:
        before = window(rows, "update_norm", max(0, s - 500), s)
        after = window(rows, "update_norm", s, s + 500)
        lines.append(
            f"| {s} | {lr0:.1e} -> {lr1:.1e} | {before:.4f} | {after:.4f} "
            f"| {after / before:.3f} |"
        )
    if not bounds:
        lines.append("| (no boundary crossed in this run) | | | | |")

    sec = [r["sec_per_iter"] for r in rows[5:]]
    lines += [
        "",
        "## Throughput",
        "",
        f"- steady-state wall-clock: {float(np.median(sec)):.3f} s/iter "
        f"(median) = {args.batch / float(np.median(sec)):.1f} img/s/chip "
        "including host data loading through the tunnel",
        f"- reference baseline: 0.2 s/iter at batch 1 on a GTX 1070 "
        f"(`README.md:62`) = 5 img/s -> "
        f"{args.batch / float(np.median(sec)) / 5:.1f}x",
        "",
        f"- final grad norm (mean last 10%): "
        f"{window(rows, 'grad_norm', int(total * 0.9), total + 1):.3f}",
        f"- mean fg anchors/image (last 10%): "
        f"{window(rows, 'num_fg', int(total * 0.9), total + 1):.1f}",
    ]

    if args.extra_json:
        extra = json.loads(args.extra_json)
        lines += ["", "## Holdout detection quality", "",
                  "```json", json.dumps(extra, indent=2), "```"]

    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")
    print("\n".join(lines[:40]))


if __name__ == "__main__":
    main()
