"""Integration: prepare-data -> train (2 iters) -> export -> demo, on CPU.

Exercises the whole CLI surface end to end on a tiny synthetic dataset with
small shape buckets (the reference has no equivalent coverage at all —
SURVEY.md §4).
"""

import json
import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from ctpn_tpu.config import cfg
from tests.test_data import _make_raw_dataset


@pytest.fixture
def tiny_env(tmp_path, rng, monkeypatch):
    """Small images + tiny buckets so CPU training is fast."""
    monkeypatch.chdir(tmp_path)
    cfg.ROOT_DIR = str(tmp_path)
    cfg.TPU.BUCKETS = [[64, 96], [96, 64]]
    cfg.TRAIN.SCALES = (48,)
    cfg.TRAIN.MAX_SIZE = 96
    cfg.TRAIN.SNAPSHOT_ITERS = 2
    cfg.TPU.MAX_GT = 32
    cfg.TPU.MAX_DONTCARE = 4
    # small proposal/NMS/connector programs: full-size (12000/1000) adds
    # tens of CPU-seconds per demo compile and is covered by the
    # oracle-parity tests (test_nms, test_proposal) at scale
    cfg.TEST.RPN_PRE_NMS_TOP_N = 256
    cfg.TEST.RPN_POST_NMS_TOP_N = 64
    img_dir, gt_dir = _make_raw_dataset(str(tmp_path / "raw"), rng, n=3, size=(128, 96))
    return tmp_path, img_dir, gt_dir


def test_full_cli_flow(tiny_env):
    tmp_path, img_dir, gt_dir = tiny_env

    # 1. prepare data
    from ctpn_tpu.cli.prepare_data import main as prep_main

    out_voc = str(tmp_path / "data" / "TEXTVOC")
    prep_main(["--images", img_dir, "--labels", gt_dir, "--out", out_voc])
    link = str(tmp_path / "data" / "VOCdevkit2007")
    os.symlink(osp.abspath(out_voc), link)
    assert osp.exists(osp.join(out_voc, "VOC2007", "ImageSets", "Main", "trainval.txt"))

    # 2. short training run (single device, no flip to keep it fast)
    cfg.TRAIN.USE_FLIPPED = False
    from ctpn_tpu.data.roidb import get_training_roidb
    from ctpn_tpu.data.voc import PascalVOC
    from ctpn_tpu.training.solver import train_net

    imdb = PascalVOC("trainval", "2007", devkit_path=link)
    roidb = get_training_roidb(imdb)
    out_dir = str(tmp_path / "output")
    metrics = train_net(
        roidb, out_dir, max_iters=2, data_parallel=False, batch_size=1
    )
    assert np.isfinite(metrics["total_loss"])
    assert osp.exists(osp.join(out_dir, "checkpoints"))
    # metrics JSONL written
    lines = open(osp.join(out_dir, "metrics.jsonl")).read().strip().splitlines()
    assert len(lines) >= 1 and "total_loss" in json.loads(lines[0])

    # 3. export artifact from the checkpoint
    from ctpn_tpu.cli.export_model import main as export_main

    art = str(tmp_path / "artifact")
    export_main(["--ckpt", out_dir, "--out", art])
    assert osp.isdir(osp.join(art, "params"))

    # 4. demo on the prepared images using the artifact
    from ctpn_tpu.cli.demo import main as demo_main

    results = str(tmp_path / "results")
    demo_main([
        "--artifact", art,
        "--images", osp.join(out_voc, "VOC2007", "JPEGImages"),
        "--output", results,
    ])
    outs = os.listdir(results)
    assert any(f.startswith("res_") and f.endswith(".txt") for f in outs)
    assert any(f.endswith(".jpg") for f in outs)

    # 5. oriented mode over the same artifact (reference demo.py with
    # DETECT_MODE: O -> data/oriented_results)
    results_o = str(tmp_path / "results_o")
    demo_main([
        "--artifact", art,
        "--images", osp.join(out_voc, "VOC2007", "JPEGImages"),
        "--output", results_o,
        "--mode", "O",
    ])
    outs_o = os.listdir(results_o)
    assert any(f.startswith("res_") and f.endswith(".txt") for f in outs_o)

    # 6. resume from the step-2 snapshot and continue to step 3 (reference
    # `train.py:127-137`); folded into this test to reuse the prepared
    # dataset and the already-compiled train step
    from ctpn_tpu.training.solver import SolverWrapper

    sw2 = SolverWrapper(roidb, out_dir, data_parallel=False, batch_size=1)
    m = sw2.train_model(3, restore=True)
    assert m["step"] == 3


def test_export_frozen_shapes_validation(tmp_path):
    """Malformed --frozen-shapes entries fail as pointed argparse errors,
    not opaque unpack/trace failures deep inside jax.export (ADVICE r3)."""
    from ctpn_tpu.cli.export_model import main as export_main

    for bad in ("608x912",         # 2 fields
                "1x600x912",       # H not a stride multiple
                "1x608x900",       # W not a stride multiple
                "1x608x912x3",     # 4 fields
                "axbxc",           # not ints
                "0x608x912"):      # non-positive batch
        with pytest.raises(SystemExit) as exc:
            export_main(["--out", str(tmp_path / "x.npz"), "--frozen",
                         "--frozen-shapes", bad])
        assert exc.value.code == 2, bad
