"""Fixed-lag marginalization stress test (SURVEY.md §4 config 4, VERDICT r1
weak #5): a long survey stream with continuous landmark churn — every
landmark enters and leaves the window, so the dropped-landmark and
dropped-cross-coupling approximations (solvers/fixed_lag.py docstring) are
exercised hundreds of times — and the window-vs-batch divergence is
measured PER TIME SEGMENT to bound its trend, not just its average.

The default run uses a 30 s stream (~150 marginalizations — the churn
regime is fully established well before that); the original 60 s variant
is kept behind the ``slow`` marker (USLAM_RUN_SLOW=1) — it adds no new
code path, only stream length.
"""

import numpy as np
import pytest

from tests.test_fixed_lag import feed
from uslam_tpu.config import UslamConfig
from uslam_tpu.eval.metrics import ate_rmse
from uslam_tpu.io.synthetic import SyntheticSpec, generate_synthetic_sequence
from uslam_tpu.pipeline import run_sequence
from uslam_tpu.solvers.fixed_lag import FixedLagSmoother


def _run_stress(duration: float) -> None:
    cfg = UslamConfig()
    spec = SyntheticSpec(
        trajectory="survey",
        duration=duration,
        # Landmark density per second kept at the original 60 s / 320
        # configuration so churn rate is identical at any duration.
        num_landmarks=int(320 * duration / 60.0),
        odom_drift_rate=0.03,
        feature_noise_px=0.3,
        max_feature_depth=10.0,   # short tracks -> heavy churn
        seed=6,
    )
    seq = generate_synthetic_sequence(spec)

    # Full-batch optimum on the same data (the gold standard the window
    # approximation is measured against).
    batch = run_sequence(seq, cfg)
    traj_batch = batch.trajectory

    fl = FixedLagSmoother(cfg, window=8, solve_during_fill=False)
    seen_ids: set[int] = set()

    def to_fl(quat, pos, imu, dvl, feats):
        if feats:
            seen_ids.update(int(f[0]) for f in feats)
        fl.add_keyframe(quat, pos, np.zeros(3), imu, dvl, feats)

    feed(seq, cfg, to_fl)
    traj_fl = fl.full_trajectory()

    n = min(len(traj_fl), len(traj_batch))
    assert n >= int(duration * 5) - 10

    # Churn really happened: far more unique landmarks than a window holds.
    assert len(seen_ids) > 2.5 * duration, len(seen_ids)

    # Segment-wise divergence from batch: bounded everywhere AND no
    # runaway trend (late segments comparable to early ones).
    seg = n // 6
    seg_err = np.array([
        ate_rmse(traj_fl[i * seg : (i + 1) * seg], traj_batch[i * seg : (i + 1) * seg])
        for i in range(6)
    ])
    # Stated drift bound: <0.30 m divergence from the batch optimum in any
    # segment (measured ~0.25 max at 60 s, mild growth — the window lacks
    # the batch's global smoothing; the r1 marginalization bug produced
    # 199 m here).
    assert seg_err.max() < 0.30, seg_err
    assert seg_err[-2:].mean() < 4.0 * max(seg_err[:2].mean(), 0.02), seg_err

    # Absolute quality: the window solution still beats raw drifted
    # odometry against ground truth over the whole stream.
    gt = seq.gt_pos[:n]
    ate_fl = ate_rmse(traj_fl[:n], gt)
    ate_odom = ate_rmse(np.asarray(seq.dvl_pose_pos[:n]), gt)
    assert ate_fl < ate_odom, (ate_fl, ate_odom)


def test_fixed_lag_long_stream_drift_bounded():
    _run_stress(30.0)


@pytest.mark.slow
def test_fixed_lag_60s_stream_drift_bounded():
    _run_stress(60.0)
