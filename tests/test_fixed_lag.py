"""Fixed-lag smoother vs batch solution (SURVEY.md §4 config 4)."""

import numpy as np

from uslam_tpu.config import UslamConfig
from uslam_tpu.eval.metrics import ate_rmse
from uslam_tpu.io.synthetic import SyntheticSpec, generate_synthetic_sequence
from uslam_tpu.io.timesync import slice_stream
from uslam_tpu.pipeline import AUVSlam
from uslam_tpu.solvers.fixed_lag import FixedLagSmoother


def feed(seq, cfg, consumer):
    """Replay keyframes into `consumer(quat, pos, vel0, imu, dvl, feats)`."""
    slam = AUVSlam(cfg)  # borrow landmark triangulation for feature init
    prev_t = None
    for i, t in enumerate(seq.dvl_pose_t):
        sl = slice_stream(seq.imu_t, prev_t if prev_t is not None else -np.inf, float(t))
        imu = None
        if sl.stop > sl.start:
            rows = []
            for k in range(sl.start, sl.stop):
                rows.append(
                    np.concatenate([seq.imu_acc[k], seq.imu_gyro[k], [0.005]])
                )
            imu = np.stack(rows)
        prev_t = float(t)
        ff = seq.features[i]
        feats = None
        if len(ff.ids):
            feats = slam.get_landmarks(
                ff.ids, ff.u0, ff.v0, ff.u1, ff.v1,
                seq.dvl_pose_quat[i], seq.dvl_pose_pos[i],
            )
        consumer(seq.dvl_pose_quat[i], seq.dvl_pose_pos[i], imu, seq.dvl_twist_vel[i], feats)


def test_fixed_lag_tracks_batch():
    cfg = UslamConfig()
    spec = SyntheticSpec(duration=5.0, odom_drift_rate=0.03, num_landmarks=60, seed=2)
    seq = generate_synthetic_sequence(spec)

    # Batch reference via the public pipeline.
    batch = AUVSlam(cfg)

    def to_batch(quat, pos, imu, dvl, feats):
        if imu is not None:
            for row in imu:
                batch.update_imu(row[:3], row[3:6], row[6])
        ff_ids, u0, v0, u1, v1 = [], [], [], [], []
        # re-encode features as normalized coords for batch_update
        rx, ry = cfg.camera.resolution_x, cfg.camera.resolution_y
        if feats:
            for lm_id, uL, uR, v, _xyz in feats:
                ff_ids.append(lm_id)
                u0.append(uL / (0.5 * rx) - 1)
                u1.append(uR / (0.5 * rx) - 1)
                v0.append(v / (0.5 * ry) - 1)
                v1.append(v / (0.5 * ry) - 1)
        batch.batch_update(
            quat, pos, dvl, pos[2], (np.array(ff_ids), np.array(u0), np.array(v0), np.array(u1), np.array(v1))
        )

    feed(seq, cfg, to_batch)
    batch_result = batch.solve()

    # Fixed-lag smoother.
    fl = FixedLagSmoother(cfg, window=6, solve_during_fill=False)

    def to_fl(quat, pos, imu, dvl, feats):
        fl.add_keyframe(quat, pos, np.zeros(3), imu, dvl, feats)

    feed(seq, cfg, to_fl)

    traj_fl = fl.full_trajectory()
    traj_batch = batch_result.trajectory
    n = min(len(traj_fl), len(traj_batch))
    assert n >= 20
    diff = ate_rmse(traj_fl[:n], traj_batch[:n])
    # Window solution should stay close to the full batch optimum.
    assert diff < 0.08, diff

    # And both should beat the drifted odometry against ground truth.
    gt = seq.gt_pos[:n]
    assert ate_rmse(traj_fl[:n], gt) < ate_rmse(np.asarray(seq.dvl_pose_pos[:n]), gt) * 1.2


def test_device_resident_matches_host_path():
    """The device-resident steady-state window (one upload + one fetch per
    keyframe, graph built on device) must track the host-path smoother: the
    same math with a different (sorted vs first-appearance) landmark
    interning order, so agreement is at f32 solver-noise level."""
    cfg = UslamConfig()
    # Drift 0.06 (not 0.03): with near-perfect odometry the ground-truth
    # quality gates below measure luck, not estimation — here raw odometry
    # degrades to ~0.15 ATE and the window smoother's correction is real.
    spec = SyntheticSpec(duration=6.0, odom_drift_rate=0.06, num_landmarks=60, seed=2)
    seq = generate_synthetic_sequence(spec)

    host = FixedLagSmoother(cfg, window=6, solve_during_fill=False)
    dev = FixedLagSmoother(
        cfg, window=6, solve_during_fill=False, device_resident=True
    )
    feed(seq, cfg, lambda q, p, i, d, f: host.add_keyframe(q, p, np.zeros(3), i, d, f))
    feed(seq, cfg, lambda q, p, i, d, f: dev.add_keyframe(q, p, np.zeros(3), i, d, f))

    th, td = host.full_trajectory(), dev.full_trajectory()
    assert len(td) == len(th)
    assert dev._dev_state is not None  # the device path actually engaged
    err = np.linalg.norm(th - td, axis=1)
    # The two paths differ only in f32 summation/interning order, but each
    # step's difference is baked into the next marginal, so divergence
    # compounds CHAOTICALLY over ~25 marginalizations — and the
    # amplification depends on backend rounding order, not code: the
    # IDENTICAL build measures 0.047 max on a 1-device CPU backend vs
    # 0.212 under conftest's 8-virtual-device backend (different XLA:CPU
    # intra-op partitioning => different f32 sums). Bound gross
    # divergence loosely; the real invariants are the QUALITY-PARITY and
    # ground-truth gates below (step-level device==host semantics are
    # pinned by the fused online equivalence tests).
    assert err.max() < 0.35, err.max()

    from uslam_tpu.eval.metrics import ate_rmse

    n = min(len(td), len(seq.gt_pos))
    ate_host = ate_rmse(th[:n], seq.gt_pos[:n])
    ate_dev = ate_rmse(td[:n], seq.gt_pos[:n])
    ate_odom = ate_rmse(np.asarray(seq.dvl_pose_pos[:n]), seq.gt_pos[:n])
    # Device-path quality tracks the host path (measured 0.112 vs 0.074
    # under the 8-device backend, 0.048 vs 0.047 single-device)...
    assert ate_dev < ate_host + 0.10, (ate_dev, ate_host)
    # ...and both beat raw odometry vs ground truth.
    assert ate_host < ate_odom * 1.2, (ate_host, ate_odom)
    assert ate_dev < ate_odom * 1.2, (ate_dev, ate_odom)


def test_smoother_checkpoint_resume(tmp_path):
    """Snapshot mid-stream, resume in a fresh smoother, finish the stream:
    the resumed trajectory must match the uninterrupted run exactly (same
    arrays in, same compiled programs)."""
    from uslam_tpu.solvers.fixed_lag import load_smoother_state, save_smoother_state

    cfg = UslamConfig()
    spec = SyntheticSpec(duration=5.0, odom_drift_rate=0.03, num_landmarks=60, seed=2)
    seq = generate_synthetic_sequence(spec)

    frames = []
    feed(seq, cfg, lambda *a: frames.append(a))
    cut = len(frames) // 2

    full = FixedLagSmoother(cfg, window=6, solve_during_fill=False)
    for q, p, i, d, f in frames:
        full.add_keyframe(q, p, np.zeros(3), i, d, f)

    first = FixedLagSmoother(cfg, window=6, solve_during_fill=False)
    for q, p, i, d, f in frames[:cut]:
        first.add_keyframe(q, p, np.zeros(3), i, d, f)
    path = str(tmp_path / "state.npz")
    save_smoother_state(path, first)

    resumed = load_smoother_state(path, cfg, solve_during_fill=False)
    for q, p, i, d, f in frames[cut:]:
        resumed.add_keyframe(q, p, np.zeros(3), i, d, f)

    np.testing.assert_allclose(
        resumed.full_trajectory(), full.full_trajectory(), atol=1e-5
    )
