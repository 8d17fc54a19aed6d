"""Profile the online (streaming) keyframe latency split on the live backend.

Renders (once, cached to /tmp) a synthetic stereo stream, drives
OnlineSlam in fused device-resident mode, and prints the per-keyframe
latency split + LM iteration counts — the measurement tool behind the
VERDICT r2 "online < 200 ms median" target.

Env knobs:
  ONLINE_DURATION   stream seconds (default 20)
  ONLINE_WINDOW     window size (default 10)
  ONLINE_MAX_ITERS  SolverConfig.max_iterations override (default library)
  ONLINE_PLATEAU    SolverConfig.plateau_patience override
  ONLINE_FUSED      1 (default) fused program, 0 split device-resident
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_stream(duration: float):
    path = f"/tmp/uslam_online_stream_{int(duration)}s.npz"
    from uslam_tpu.io.synthetic import SyntheticSpec, generate_synthetic_sequence

    if os.path.exists(path):
        log(f"stream: loading cached {path}")
        z = np.load(path)
        seq = generate_synthetic_sequence(
            SyntheticSpec(duration=duration, odom_drift_rate=0.03, seed=3),
            render_images=False,
            omit_features=True,
        )
        seq.images_left = z["left"]
        seq.images_right = z["right"]
        seq.image_t = z["image_t"]
        return seq
    t0 = time.perf_counter()
    seq = generate_synthetic_sequence(
        SyntheticSpec(duration=duration, odom_drift_rate=0.03, seed=3),
        render_images=True,
        omit_features=True,
    )
    seq.images_left = np.clip(seq.images_left, 0, 255).astype(np.uint8)
    seq.images_right = np.clip(seq.images_right, 0, 255).astype(np.uint8)
    log(f"stream: rendered {len(seq.image_t)} pairs in {time.perf_counter()-t0:.1f}s")
    np.savez(path, left=seq.images_left, right=seq.images_right, image_t=seq.image_t)
    return seq


def main():
    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/uslam_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception:
        pass
    log(f"platform={jax.default_backend()}")

    import dataclasses

    from uslam_tpu import OnlineSlam
    from uslam_tpu.config import UslamConfig
    from uslam_tpu.eval.metrics import ate_rmse

    duration = float(os.environ.get("ONLINE_DURATION", "20"))
    window = int(os.environ.get("ONLINE_WINDOW", "10"))
    fused = os.environ.get("ONLINE_FUSED", "1") == "1"
    pipelined = os.environ.get("ONLINE_PIPELINED", "0") == "1"
    seq = load_stream(duration)

    cfg = UslamConfig()
    sc = cfg.solver
    if os.environ.get("ONLINE_MAX_ITERS"):
        sc = dataclasses.replace(sc, max_iterations=int(os.environ["ONLINE_MAX_ITERS"]))
    if os.environ.get("ONLINE_PLATEAU"):
        sc = dataclasses.replace(sc, plateau_patience=int(os.environ["ONLINE_PLATEAU"]))
    cfg = dataclasses.replace(cfg, solver=sc)
    update_iters = int(os.environ.get("ONLINE_UPDATE_ITERS", "8"))
    log(f"solver: max_iters={sc.max_iterations} plateau={sc.plateau_patience} "
        f"update_cap={update_iters}")

    # Raw transport probe: fresh 4 MB uint8 upload (the stereo pair size).
    H, W = seq.images_left.shape[1:3]
    for i in range(3):
        buf = np.full((2, H, W), i, np.uint8)
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(buf))
        log(f"probe: pair upload ({2*H*W/1e6:.1f} MB) {1e3*(time.perf_counter()-t0):.1f} ms")

    online = OnlineSlam(
        cfg, window=window, device_resident=True, fused=fused,
        pipelined=pipelined, solve_during_fill=False,
        max_update_iters=update_iters,
    )
    events = (
        [("imu", t, i) for i, t in enumerate(seq.imu_t)]
        + [("press", t, i) for i, t in enumerate(seq.pressure_t)]
        + [("pose", t, i) for i, t in enumerate(seq.dvl_pose_t)]
        + [("twist", t, i) for i, t in enumerate(seq.dvl_twist_t)]
        + [("frame", t, i) for i, t in enumerate(seq.image_t)]
    )
    events.sort(key=lambda e: e[1])
    probe_on = os.environ.get("ONLINE_PROBE", "0") == "1"
    import jax.numpy as jnp

    probe_fn = jax.jit(lambda x: x + 1.0)
    jax.block_until_ready(probe_fn(jnp.float32(0.0)))
    t_wall = time.perf_counter()
    for kind, t, i in events:
        if kind == "imu":
            online.add_imu(t, seq.imu_acc[i], seq.imu_gyro[i])
        elif kind == "press":
            online.add_pressure(t, seq.pressure_mbar[i])
        elif kind == "pose":
            online.add_dvl_pose(t, seq.dvl_pose_quat[i], seq.dvl_pose_pos[i])
        elif kind == "twist":
            online.add_dvl_twist(t, seq.dvl_twist_vel[i])
        else:
            n0 = len(online.timings)
            online.add_stereo_frame(t, seq.images_left[i], seq.images_right[i])
            if probe_on and len(online.timings) > n0:
                # Fixed-cost dispatch probe: if THIS grows over the stream
                # the tunnel/system is slowing down, not our program.
                tp = time.perf_counter()
                jax.block_until_ready(probe_fn(jnp.float32(i)))
                online.timings[-1]["probe_ms"] = (
                    time.perf_counter() - tp
                ) * 1e3
                online.timings[-1]["wall_s"] = time.perf_counter() - t_wall
    wall = time.perf_counter() - t_wall

    online.flush()
    steady = [e for e in online.timings if e.get("fused")][2:]
    for e in steady:
        log(
            f"  kf: total {e['total_ms']:6.1f}  "
            + (f"solve {e['solve_ms']:6.1f}  fetch {e['fetch_ms']:5.1f}  "
               if "solve_ms" in e
               else f"dispatch {e['dispatch_ms']:6.1f}  "
                    f"harvest {e.get('harvest_ms', -1):5.1f}  ")
            + f"rec {e['record_ms']:4.1f}  iters {e.get('lm_iters', -1)}"
            + (f"  probe {e['probe_ms']:5.1f}" if "probe_ms" in e else "")
            + (f"  wall {e['wall_s']:6.1f}" if "wall_s" in e else "")
        )
    med = lambda k: float(  # noqa: E731
        np.median([e[k] for e in steady if k in e] or [-1])
    )
    iters = [e["lm_iters"] for e in steady if "lm_iters" in e]
    traj = online.trajectory()
    n = min(len(traj), len(seq.gt_pos))
    log(
        f"steady n={len(steady)}  median total {med('total_ms'):.1f} ms  "
        f"solve {med('solve_ms'):.1f}  fetch {med('fetch_ms'):.1f}  "
        f"record {med('record_ms'):.1f}  dispatch {med('dispatch_ms'):.1f}  "
        f"harvest {med('harvest_ms'):.1f}"
    )
    log(
        f"iters median {np.median(iters) if iters else -1}  "
        f"max {max(iters) if iters else -1}  "
        f"ate {ate_rmse(traj[:n], seq.gt_pos[:n]):.4f}  "
        f"wall {wall:.1f}s for {online.keyframes} keyframes"
    )


if __name__ == "__main__":
    main()
