"""CLI (`python -m uslam_tpu`) smoke tests: synth -> info round trip and
bag summarization. The `run` subcommand's pipeline is covered by
tests/test_pipeline.py (same code path); examples/ drive it end-to-end."""

import numpy as np

from uslam_tpu.__main__ import main
from uslam_tpu.io.sequence import load_sequence

from tests.test_rosbag import make_bag


def test_synth_and_info(tmp_path, capsys):
    out = str(tmp_path / "seq.npz")
    assert main(["synth", "--duration", "4", "--landmarks", "32", "--out", out]) == 0
    seq = load_sequence(out)
    assert len(seq.dvl_pose_t) == 20  # 4 s at the default 5 Hz keyframe rate
    assert len(seq.imu_t) > 0 and len(seq.features) == 20

    assert main(["info", out]) == 0
    text = capsys.readouterr().out
    assert "dvl_pose_t" in text and "features" in text


def test_info_bag(tmp_path, capsys):
    path = str(tmp_path / "ref.bag")
    make_bag(path)
    assert main(["info", path]) == 0
    text = capsys.readouterr().out
    assert "/zedm/zed_node/imu/data" in text
    assert "sensor_msgs/Imu" in text
    # per-topic counts rendered
    assert " 40" in text
