"""Config system tests: YAML merge semantics, overrides, reference compat."""

import os.path as osp

import pytest
import yaml

from ctpn_tpu.config import (
    cfg,
    cfg_from_file,
    cfg_from_list,
    get_output_dir,
    reset_cfg,
)

REF_YML = "/root/reference/ctpn/text.yml"
OUR_YML = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "configs", "text.yml")


def test_defaults_cover_ctpn_keys():
    assert cfg.ANCHOR_SCALES == [16]
    assert cfg.NCLASSES == 2
    assert cfg.TRAIN.RPN_BATCHSIZE == 300
    assert cfg.TEST.DETECT_MODE == "H"
    assert cfg.TEXT.MAX_HORIZONTAL_GAP == 50
    assert cfg.TEXT.TEXT_PROPOSALS_NMS_THRESH == 0.2
    assert len(cfg.PIXEL_MEANS) == 3


def test_load_shipped_yaml():
    cfg_from_file(OUR_YML)
    assert cfg.EXP_DIR == "ctpn_end2end"
    assert cfg.TRAIN.SOLVER == "Adam"
    assert cfg.TRAIN.LEARNING_RATE == pytest.approx(1e-5)
    assert cfg.TRAIN.max_steps == 50000
    assert cfg.TPU.COMPUTE_DTYPE == "bfloat16"


@pytest.mark.skipif(not osp.exists(REF_YML), reason="reference not mounted")
def test_reference_text_yml_loads_unchanged():
    """The reference's own run config must merge without edits."""
    cfg_from_file(REF_YML)
    assert cfg.TRAIN.STEPSIZE == 30000
    assert cfg.TRAIN.RPN_BBOX_INSIDE_WEIGHTS == [0, 1, 0, 1]
    assert cfg.TEST.checkpoints_path == "checkpoints/"


def test_unknown_key_raises(tmp_path):
    p = tmp_path / "bad.yml"
    p.write_text("NOT_A_KEY: 1\n")
    with pytest.raises(KeyError):
        cfg_from_file(str(p))


def test_type_mismatch_raises(tmp_path):
    p = tmp_path / "bad.yml"
    p.write_text("TRAIN:\n  SOLVER: [1, 2]\n")
    with pytest.raises(ValueError):
        cfg_from_file(str(p))


def test_int_widens_to_float(tmp_path):
    p = tmp_path / "ok.yml"
    p.write_text("TRAIN:\n  LEARNING_RATE: 1\n")
    cfg_from_file(str(p))
    assert cfg.TRAIN.LEARNING_RATE == 1.0
    assert isinstance(cfg.TRAIN.LEARNING_RATE, float)


def test_cfg_from_list():
    cfg_from_list(["TRAIN.SOLVER", "Momentum", "TEST.DETECT_MODE", "O",
                   "TRAIN.LEARNING_RATE", "0.001"])
    assert cfg.TRAIN.SOLVER == "Momentum"
    assert cfg.TEST.DETECT_MODE == "O"
    assert cfg.TRAIN.LEARNING_RATE == pytest.approx(0.001)
    with pytest.raises(KeyError):
        cfg_from_list(["TRAIN.NOPE", "1"])


def test_output_dir_layout(tmp_path):
    cfg.ROOT_DIR = str(tmp_path)
    cfg.EXP_DIR = "exp1"
    out = get_output_dir("voc_2007_trainval")
    assert out.endswith(osp.join("output", "exp1", "voc_2007_trainval"))
    assert osp.isdir(out)
