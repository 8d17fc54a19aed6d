"""Config serialization tests: JSON + YAML ingest (the YAML fills the
calibration-file role of the reference's zed_imu_camera_altered.yaml,
loaded via rosparam in launch/stereo.launch:5-6,16)."""

import dataclasses

import pytest

from uslam_tpu.config import UslamConfig


def test_yaml_roundtrip(tmp_path):
    cfg = UslamConfig()
    cfg = dataclasses.replace(
        cfg,
        solver=dataclasses.replace(cfg.solver, max_iterations=7),
        camera=dataclasses.replace(cfg.camera, baseline=0.1),
    )
    p = tmp_path / "cfg.yaml"
    cfg.save_yaml(str(p))
    back = UslamConfig.from_yaml(str(p))
    assert back == cfg


def test_yaml_partial_sections(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("camera:\n  fx: 1000.0\nsolver:\n  max_iterations: 3\n")
    cfg = UslamConfig.from_yaml(str(p))
    assert cfg.camera.fx == 1000.0
    assert cfg.solver.max_iterations == 3
    # untouched sections keep defaults
    assert cfg.noise == UslamConfig().noise


def test_yaml_unknown_key_raises(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("camera:\n  focal_length: 1000.0\n")
    with pytest.raises(KeyError):
        UslamConfig.from_yaml(str(p))


def test_yaml_empty_file(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("")
    assert UslamConfig.from_yaml(str(p)) == UslamConfig()


def test_json_yaml_agree(tmp_path):
    cfg = UslamConfig()
    pj, py = tmp_path / "c.json", tmp_path / "c.yaml"
    cfg.save_json(str(pj))
    cfg.save_yaml(str(py))
    assert UslamConfig.from_json(str(pj)) == UslamConfig.from_yaml(str(py))
