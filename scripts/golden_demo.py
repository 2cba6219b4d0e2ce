"""Golden-demo evidence run: detect the reference demo images with trained
weights, in both DETECT_MODEs, through both postprocess paths, and report
device-vs-host agreement.

    python scripts/golden_demo.py --artifact /tmp/ctpn_synth/artifact \
        [--images /root/reference/data/demo] [--out docs/demo_results]

Produces:
  <out>/H/            res_*.txt + overlays, device postprocess, mode H
  <out>/O/            same, mode O (oriented records)
  <out>/H_host/       host-postprocess (demo_pb.py-parity) mode H res_*.txt
  <out>/O_host/       same, mode O
  <out>/report.json   per-mode device-vs-host box agreement (the >=99.5%
                      self-consistency gate from BASELINE.json, measured on
                      real images with detecting weights)

The reference flow this mirrors: `ctpn/demo.py:28-68` (checkpoint path) and
`ctpn/demo_pb.py:66-98` (frozen-graph path, host decode).
"""

import argparse
import json
import os
import os.path as osp
import shutil
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--artifact", required=True)
    p.add_argument("--images", default="/root/reference/data/demo")
    p.add_argument("--out", default="docs/demo_results")
    args = p.parse_args(argv)

    from ctpn_tpu.cli.demo import main as demo_main
    from ctpn_tpu.eval import compare_result_dirs

    os.makedirs(args.out, exist_ok=True)
    runs = {
        "H": ["--mode", "H"],
        "O": ["--mode", "O"],
        "H_host": ["--mode", "H", "--host-postprocess"],
        "O_host": ["--mode", "O", "--host-postprocess"],
    }
    for name, extra in runs.items():
        out_dir = osp.join(args.out, name)
        shutil.rmtree(out_dir, ignore_errors=True)
        demo_main(
            ["--cfg", "configs/text.yml", "--artifact", args.artifact,
             "--images", args.images, "--output", out_dir] + extra
        )

    report = {}
    for mode in ("H", "O"):
        r = compare_result_dirs(
            osp.join(args.out, mode), osp.join(args.out, f"{mode}_host")
        )
        per_file = r.pop("per_file", None)
        report[f"device_vs_host_{mode}"] = r
        if per_file:
            report[f"device_vs_host_{mode}_per_file"] = per_file
    # the host path needs no overlays; drop its images to keep the tree lean
    for name in ("H_host", "O_host"):
        for f in os.listdir(osp.join(args.out, name)):
            if not f.startswith("res_"):
                os.remove(osp.join(args.out, name, f))

    with open(osp.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items()
                      if not k.endswith("per_file")}, indent=2))


if __name__ == "__main__":
    main()
