"""End-to-end pipeline tests (SURVEY.md §4 config 5) + time sync (C14)."""

import numpy as np
import pytest

from uslam_tpu.config import CameraConfig, FrontendConfig, SolverConfig, UslamConfig
from uslam_tpu.eval.metrics import ate_rmse
from uslam_tpu.io.synthetic import SyntheticSpec, generate_synthetic_sequence
from uslam_tpu.io.timesync import approximate_time_join, slice_stream
from uslam_tpu.pipeline import run_sequence


class TestTimeSync:
    def test_exact_alignment(self):
        t = np.arange(0, 10, 0.2)
        out = approximate_time_join(t, [t.copy(), t.copy()], slop=0.2)
        assert len(out) == len(t)
        for pi, (a, b) in out:
            assert pi == a == b

    def test_slop_rejects_far(self):
        pivot = np.array([0.0, 1.0, 2.0])
        other = np.array([0.05, 2.9])
        out = approximate_time_join(pivot, [other], slop=0.2)
        # 0.0<->0.05 accepted; 1.0 has nearest 2.9 (too far, and join is
        # in-order so it stops matching after the miss);
        accepted_pivots = [pi for pi, _ in out]
        assert 0 in accepted_pivots
        assert 1 not in accepted_pivots

    def test_each_message_consumed_once(self):
        pivot = np.array([0.0, 0.01, 0.02])
        other = np.array([0.0])
        out = approximate_time_join(pivot, [other], slop=0.2)
        assert len(out) == 1

    def test_slice_stream(self):
        ts = np.array([0.0, 0.1, 0.2, 0.3])
        sl = slice_stream(ts, 0.05, 0.25)
        assert (sl.start, sl.stop) == (1, 3)


class TestEndToEnd:
    def test_features_path(self):
        """Precomputed (nodelet-style) features -> solve (the reference's
        exact data path)."""
        seq = generate_synthetic_sequence(
            SyntheticSpec(duration=5.0, odom_drift_rate=0.04, seed=4)
        )
        result = run_sequence(seq, UslamConfig())
        assert result.metrics["final_error"] < result.metrics["initial_error"]
        assert result.metrics["ate_rmse_vs_gt"] < 0.15
        assert "mse_vs_odom" in result.metrics

    def test_images_path(self):
        """Raw stereo imagery -> ORB front-end -> solve: the complete
        in-framework stack, no precomputed features."""
        cam = CameraConfig(
            fx=300.0, fy=300.0, cx=192.0, cy=120.0, baseline=0.12,
            resolution_x=384, resolution_y=240,
        )
        spec = SyntheticSpec(
            duration=4.0, num_landmarks=120, odom_drift_rate=0.02,
            max_feature_depth=12.0, seed=6,
        )
        seq = generate_synthetic_sequence(
            spec, cam_cfg=cam, render_images=True, omit_features=True
        )
        assert not seq.features and seq.images_left is not None

        cfg = UslamConfig(
            camera=cam,
            frontend=FrontendConfig(pyramid_levels=1, max_features_per_cell=6),
            solver=SolverConfig(max_iterations=40),
        )
        result = run_sequence(seq, cfg)
        n = result.values.num_poses
        assert n >= 15
        assert result.metrics["final_error"] < result.metrics["initial_error"]
        # Landmarks were discovered by the front-end (not ground-truth fed).
        assert result.values.num_landmarks >= 8
        assert result.metrics["ate_rmse_vs_gt"] < 0.3

    def test_images_path_klt(self):
        """Raw stereo imagery with the KLT temporal tracker (the reference
        nodelet's actual association method, stereo.launch:41-43) through
        tracking -> graph -> solve end to end."""
        cam = CameraConfig(
            fx=300.0, fy=300.0, cx=192.0, cy=120.0, baseline=0.12,
            resolution_x=384, resolution_y=240,
        )
        spec = SyntheticSpec(
            duration=4.0, num_landmarks=120, odom_drift_rate=0.02,
            max_feature_depth=12.0, seed=6,
        )
        seq = generate_synthetic_sequence(
            spec, cam_cfg=cam, render_images=True, omit_features=True
        )
        cfg = UslamConfig(
            camera=cam,
            frontend=FrontendConfig(
                pyramid_levels=1, max_features_per_cell=6,
                temporal_tracker="klt",
            ),
            solver=SolverConfig(max_iterations=40),
        )
        result = run_sequence(seq, cfg)
        assert result.values.num_poses >= 15
        assert result.values.num_landmarks >= 8
        assert result.metrics["final_error"] < result.metrics["initial_error"]
        assert result.metrics["ate_rmse_vs_gt"] < 0.3
