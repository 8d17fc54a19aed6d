"""Benchmark: full batch bundle adjustment on a 1000-pose synthetic sequence.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: real-time factor of the end-to-end batch solve (sequence duration /
wall-clock of the steady-state jitted LM solve). Baseline target is the
BASELINE.json north star: >10x real-time on one TPU v5e for front-end +
1k-pose batch BA (the reference's own runtime is a 5 Hz ROS loop + one
GTSAM LM solve, reference batch.py:328,337 — never benchmarked,
BASELINE.md).

Environment knobs: BENCH_POSES (default 1000), BENCH_LANDMARKS (512).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    n_poses = int(os.environ.get("BENCH_POSES", "1000"))
    n_lms = int(os.environ.get("BENCH_LANDMARKS", "512"))

    import jax

    # Persistent compilation cache: the LM program compile (~minutes through
    # this environment's TPU tunnel) amortizes across bench runs.
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/uslam_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    log(f"bench: platform={jax.default_backend()} devices={jax.devices()}")

    from uslam_tpu.config import SolverConfig, UslamConfig
    from uslam_tpu.factors.depth import pressure_to_depth
    from uslam_tpu.io.synthetic import SyntheticSpec, generate_synthetic_sequence
    from uslam_tpu.io.timesync import slice_stream
    from uslam_tpu.pipeline import AUVSlam, run_solver

    keyframe_rate = 5.0
    duration = n_poses / keyframe_rate
    spec = SyntheticSpec(
        duration=duration,
        keyframe_rate=keyframe_rate,
        num_landmarks=n_lms,
        omega=0.15,
        odom_drift_rate=0.02,
        feature_noise_px=0.3,
        seed=0,
    )
    t0 = time.perf_counter()
    seq = generate_synthetic_sequence(spec)
    log(f"bench: generated {duration:.0f}s sequence in {time.perf_counter()-t0:.1f}s")

    cfg = UslamConfig(solver=SolverConfig(max_iterations=50))
    slam = AUVSlam(cfg)
    t0 = time.perf_counter()
    prev_t = None
    for i, t in enumerate(seq.dvl_pose_t):
        depth = float(pressure_to_depth(seq.pressure_mbar[i], cfg.pressure))
        sl = slice_stream(seq.imu_t, prev_t if prev_t is not None else -np.inf, float(t))
        for k in range(sl.start, sl.stop):
            slam.update_imu(seq.imu_acc[k], seq.imu_gyro[k], 0.005)
        prev_t = float(t)
        ff = seq.features[i]
        slam.batch_update(
            seq.dvl_pose_quat[i], seq.dvl_pose_pos[i], seq.dvl_twist_vel[i],
            depth, (ff.ids, ff.u0, ff.v0, ff.u1, ff.v1),
        )
    graph, initial = slam.batch_create()
    log(
        f"bench: built graph in {time.perf_counter()-t0:.1f}s — "
        f"{initial.num_poses} poses, {initial.num_landmarks} landmarks, "
        f"{graph.stereo.meas.shape[0]} stereo obs slots "
        f"({int(np.asarray(graph.stereo.mask).sum())} real), "
        f"K={graph.stereo.lm_obs_idx.shape[1]}"
    )

    solve_args = (
        graph, initial, slam.cam,
        cfg.noise.dvl_sigma, cfg.noise.stereo_sigma, cfg.imu.gravity, cfg.solver,
    )

    # Warm-up: compile + first solve.
    t0 = time.perf_counter()
    values, stats = run_solver(*solve_args)
    jax.block_until_ready(values)
    warm = time.perf_counter() - t0
    log(
        f"bench: warm-up solve {warm:.1f}s (incl. compile), "
        f"{int(stats.iterations)} LM iters, error "
        f"{float(stats.initial_error):.3e} -> {float(stats.final_error):.3e}"
    )

    # Steady state: re-solve (cached executable).
    t0 = time.perf_counter()
    values, stats = run_solver(*solve_args)
    jax.block_until_ready(values)
    solve_s = time.perf_counter() - t0

    if seq.gt_pos is not None:
        from uslam_tpu.eval.metrics import ate_rmse

        ate = ate_rmse(np.asarray(values.pose_trans), seq.gt_pos[: initial.num_poses])
        init_ate = ate_rmse(np.asarray(initial.pose_trans), seq.gt_pos[: initial.num_poses])
        log(f"bench: ATE {init_ate:.4f} -> {ate:.4f} m")

    rtf = duration / solve_s
    log(
        f"bench: steady solve {solve_s:.2f}s for {duration:.0f}s of data "
        f"=> {rtf:.1f}x real-time ({int(stats.iterations)} iters)"
    )
    print(
        json.dumps(
            {
                "metric": f"batch_ba_{initial.num_poses}poses_realtime_factor",
                "value": round(rtf, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / 10.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
