"""Evaluation module tests: metrics (incl. the reference-compat MSE),
graphviz export, plot file output."""

import os

import numpy as np

from uslam_tpu.eval.graphviz import graph_to_dot, save_graph_dot
from uslam_tpu.eval.metrics import ate_rmse, mse_reference_compat, rpe_rmse
from uslam_tpu.eval.plot import plot_trajectory_3d


def test_mse_reference_compat():
    # Matches reference batch.py:362-367: z-shift odometry, mean sq coord diff.
    slam = np.zeros((4, 3))
    odom = np.tile([0.0, 0.0, 0.7433], (4, 1))
    assert mse_reference_compat(slam, odom) < 1e-12
    odom2 = odom + [1.0, 0, 0]
    np.testing.assert_allclose(mse_reference_compat(slam, odom2), 1.0 / 3.0)


def test_ate_and_alignment():
    rng = np.random.default_rng(0)
    ref = rng.normal(size=(50, 3))
    est = ref + np.array([5.0, -2.0, 1.0])  # pure offset
    assert ate_rmse(est, ref) > 5.0
    assert ate_rmse(est, ref, align=True) < 1e-6


def test_rpe():
    ref = np.cumsum(np.ones((20, 3)), axis=0)
    est = ref + np.array([100.0, 0, 0])  # offset is invisible to RPE
    assert rpe_rmse(est, ref) < 1e-9


def test_graphviz_and_plot(tmp_path):
    from uslam_tpu.config import UslamConfig
    from uslam_tpu.io.synthetic import SyntheticSpec, generate_synthetic_sequence
    from uslam_tpu.graph.packing import pack_sequence

    seq = generate_synthetic_sequence(SyntheticSpec(duration=2.0))
    graph, initial, odom, _ = pack_sequence(seq, UslamConfig())
    dot = graph_to_dot(graph, initial.num_poses, initial.num_landmarks)
    assert "x0" in dot and " -- " in dot and dot.startswith("graph")
    p = str(tmp_path / "g.dot")
    save_graph_dot(p, graph, initial.num_poses, initial.num_landmarks)
    assert os.path.getsize(p) > 100

    png = str(tmp_path / "t.png")
    fig = plot_trajectory_3d(np.asarray(initial.pose_trans), odom, save_path=png)
    assert fig is None or os.path.exists(png)
