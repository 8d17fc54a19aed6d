"""Public SLAM pipeline API.

Mirrors the surface of the reference's ``AUV_ISAM`` class + ``__main__``
(reference batch.py:74-343) without ROS: callbacks become plain method
calls, the ApproximateTimeSynchronizer becomes the offline join in
:mod:`uslam_tpu.io.timesync`, and the solve is the jitted LM+Schur program.

Method map (reference -> here):

    process_depth   (batch.py:122)  -> process_depth
    process_odom    (batch.py:128)  -> process_odom
    update_imu      (batch.py:138)  -> update_imu
    get_landmarks   (batch.py:144)  -> get_landmarks
    batch_update    (batch.py:253)  -> batch_update
    batch_create    (batch.py:270)  -> batch_create
    LM solve        (batch.py:337)  -> solve
    graph.saveGraph (batch.py:338)  -> save_graph_dot
    constr3DPoints  (batch.py:57)   -> trajectory / eval.trajectory_from_values
    plot + MSE      (batch.py:345+) -> plot / evaluate

Deliberate fixes vs the reference (SURVEY.md §2.1 — parity targets the
intended math): landmarks triangulate from the *current keyframe pose*
rather than a stale TF lookup; DVL Jacobians come from AD; dt can follow
real stamps (config); velocities/bias handled identically otherwise.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from uslam_tpu.config import DEFAULT_CONFIG, UslamConfig
from uslam_tpu.eval.graphviz import save_graph_dot as _save_dot
from uslam_tpu.eval.metrics import ate_rmse, mse_reference_compat, trajectory_from_values
from uslam_tpu.eval.plot import plot_trajectory_3d
from uslam_tpu.factors.depth import pressure_to_depth
from uslam_tpu.geometry.camera import StereoCamera, triangulate_stereo_np
from uslam_tpu.geometry.se3 import Pose3
from uslam_tpu.graph.builder import GraphArrays, GraphBuilder
from uslam_tpu.graph.values import Values
from uslam_tpu.io.sequence import SensorSequence
from uslam_tpu.io.timesync import approximate_time_join, slice_stream
from uslam_tpu.solvers.lm import LMStats, optimize_lm
from uslam_tpu.utils.logging import get_logger

log = get_logger("pipeline")


@dataclass
class SlamResult:
    values: Values
    stats: LMStats
    graph: GraphArrays
    odom_compare: np.ndarray      # unmodified DVL odometry (eval baseline,
                                  # the reference's pose_norm accumulation)
    solve_seconds: float
    metrics: dict = field(default_factory=dict)

    @property
    def trajectory(self) -> np.ndarray:
        return trajectory_from_values(self.values)


class AUVSlam:
    """Batch SLAM pipeline with the reference's public API surface."""

    def __init__(self, config: UslamConfig = DEFAULT_CONFIG):
        self.config = config
        self.cam = StereoCamera.from_config(config.camera)
        self.builder = GraphBuilder(config)
        self.depth: float | None = None
        self._imu_buffer: list = []
        self.odom_compare: list = []   # unmodified DVL poses (batch.py:257)
        self._graph_cache = None

    # ---- measurement processing (reference L3) --------------------------

    def process_depth(self, press_abs_mbar: float) -> float:
        """Pressure (mbar) -> depth (m); also latches it like the reference
        callback does (batch.py:37-38,122-126)."""
        self.depth = float(pressure_to_depth(press_abs_mbar, self.config.pressure))
        return self.depth

    def process_odom(self, quat_wxyz, pos_xyz, depth):
        """DVL pose -> (pose_adjust, pose_norm): z replaced by pressure depth
        for the initial estimate; untouched copy kept as the eval baseline
        (batch.py:128-136)."""
        quat = np.asarray(quat_wxyz, np.float64)
        pos = np.asarray(pos_xyz, np.float64)
        pos_adjust = np.array([pos[0], pos[1], depth])
        return (quat, pos_adjust), (quat, pos)

    def update_imu(self, acc, gyro, dt: float | None = None):
        """Buffer one IMU sample (batch.py:138-141). ``dt`` defaults to the
        reference's fixed 0.005 s (batch.py:34,290)."""
        if dt is None:
            dt = self.config.imu.default_dt
        self._imu_buffer.append(np.concatenate([np.asarray(acc), np.asarray(gyro), [dt]]))

    def get_landmarks(self, ids, u0, v0, u1, v1, pose_quat, pose_trans):
        """De-normalize features and triangulate to world points
        (batch.py:144-176), using the given keyframe pose (instead of the
        reference's stale latest-TF transform — batch.py:166 bug).

        Returns list of (id, uL, uR, v, world_xyz).
        """
        cfg = self.config.camera
        u0 = np.asarray(u0, np.float64)
        v0 = np.asarray(v0, np.float64)
        u1 = np.asarray(u1, np.float64)
        v1 = np.asarray(v1, np.float64)
        uL = (u0 + 1.0) * 0.5 * cfg.resolution_x
        uR = (u1 + 1.0) * 0.5 * cfg.resolution_x
        v = ((v0 + v1) / 2.0 + 1.0) * 0.5 * cfg.resolution_y
        # Plain numpy: per-keyframe host-side triangulation must not pay an
        # XLA compile or a TPU-tunnel dispatch (see CLAUDE.md).
        world = triangulate_stereo_np(
            self.config.camera,
            np.asarray(pose_quat, np.float64),
            np.asarray(pose_trans, np.float64),
            np.stack([uL, uR, v], axis=-1),
        ).astype(np.float32)
        return [
            (int(ids[k]), float(uL[k]), float(uR[k]), float(v[k]), world[k])
            for k in range(len(ids))
        ]

    # ---- accumulation (reference batch_update, batch.py:253-267) ---------

    def batch_update(self, odom_quat, odom_pos, dvl_vel_body, depth, features=None):
        """Add one synchronized keyframe.

        features: (ids, u0, v0, u1, v1) normalized coords, or None.
        Swaps out the IMU buffer exactly like batch.py:261-262.
        """
        (quat, pos_adj), (quat_n, pos_n) = self.process_odom(odom_quat, odom_pos, depth)
        self.odom_compare.append(pos_n)
        imu = np.stack(self._imu_buffer) if self._imu_buffer else None
        self._imu_buffer = []
        feats = None
        if features is not None and len(features[0]) > 0:
            ids, u0, v0, u1, v1 = features
            feats = self.get_landmarks(ids, u0, v0, u1, v1, quat, pos_adj)
        self.builder.add_keyframe(quat, pos_adj, imu, np.asarray(dvl_vel_body), feats)
        self._graph_cache = None
        return self.builder.num_keyframes - 1

    # ---- graph build + solve --------------------------------------------

    def batch_create(self, with_landmark: bool = True):
        """Finalize accumulated keyframes into (GraphArrays, Values)
        (reference batch_create, batch.py:270-305)."""
        graph, initial = self.builder.finalize(with_landmarks=with_landmark)
        self._graph_cache = (graph, initial)
        return graph, initial

    def solve(self, with_landmark: bool = True) -> SlamResult:
        """LM optimize (reference batch.py:336-338) and package results."""
        if self._graph_cache is None:
            self.batch_create(with_landmark)
        graph, initial = self._graph_cache
        cfg = self.config
        solver_cfg = cfg.solver
        if solver_cfg.reduced_solver == "banded":
            from uslam_tpu.solvers.banded import (
                measure_band_width,
                measure_corr_window,
            )

            if solver_cfg.band_width <= 0:
                # Auto band width + correction window: measured off the
                # packed graph (host-side; both are static jit parameters).
                import dataclasses

                solver_cfg = dataclasses.replace(
                    solver_cfg,
                    band_width=measure_band_width(graph.stereo),
                    banded_corr_window=measure_corr_window(graph.stereo),
                )
            else:
                # User-supplied band parameters: validate here, where the
                # arrays are concrete — an undersized band/window silently
                # DROPS Hessian correction mass inside the jitted solve
                # (out-of-range pairs get an all-zero one-hot).
                bw = measure_band_width(graph.stereo)
                if solver_cfg.band_width < bw:
                    raise ValueError(
                        f"band_width {solver_cfg.band_width} < max landmark "
                        f"track span {bw} (measure_band_width)"
                    )
                if solver_cfg.banded_corr_window > 0:
                    cw = measure_corr_window(graph.stereo)
                    if solver_cfg.banded_corr_window < cw:
                        raise ValueError(
                            f"banded_corr_window {solver_cfg.banded_corr_window}"
                            f" < measured chunk frame span {cw} "
                            f"(measure_corr_window)"
                        )
        t0 = time.perf_counter()
        values, stats = run_solver(
            graph,
            initial,
            self.cam,
            cfg.noise.dvl_sigma,
            cfg.noise.stereo_sigma,
            cfg.imu.gravity,
            solver_cfg,
            cfg.noise.stereo_huber_delta,
        )
        jax.block_until_ready(values)
        polish_info = None
        if cfg.solver.f64_polish:
            # Hybrid-precision tail (solvers/polish.py): f32 reaches its
            # error floor with weak-mode ATE ~2-3x the f64 optimum; a few
            # f64 host-CPU iterations from the f32 solution close that gap
            # (the precision GTSAM gets for free, reference batch.py:337).
            from uslam_tpu.solvers.polish import polish_f64

            values, polish_info = polish_f64(
                graph, values, self.cam,
                cfg.noise.dvl_sigma, cfg.noise.stereo_sigma, cfg.imu.gravity,
                solver_cfg, huber_delta=cfg.noise.stereo_huber_delta,
            )
        dt = time.perf_counter() - t0
        odom = np.stack(self.odom_compare) if self.odom_compare else np.zeros((0, 3))
        result = SlamResult(
            values=values,
            stats=stats,
            graph=graph,
            odom_compare=odom,
            solve_seconds=dt,
        )
        result.metrics = self.evaluate(result)
        if polish_info is not None:
            result.metrics.update(polish_info)
        log.info(
            "solve: %d poses, %d landmarks, %d LM iters, error %.3e -> %.3e, %.2fs",
            initial.num_poses,
            initial.num_landmarks,
            int(stats.iterations),
            float(stats.initial_error),
            float(stats.final_error),
            dt,
        )
        return result

    def marginals(
        self,
        result: SlamResult,
        pose_indices=(),
        vel_indices=(),
        landmark_indices=(),
        include_bias: bool = False,
    ):
        """Marginal covariances at the solution (GTSAM ``Marginals``
        parity — the engine capability at reference batch.py:337; see
        solvers/marginals.py and :func:`compute_marginals`)."""
        return compute_marginals(
            result, self.config,
            pose_indices=pose_indices,
            vel_indices=vel_indices,
            landmark_indices=landmark_indices,
            include_bias=include_bias,
        )

    def joint_marginals(self, result: SlamResult, keys):
        """JOINT covariance over a set of states (GTSAM
        ``Marginals::jointMarginalCovariance`` parity): ``keys`` is a
        sequence of ``("pose", i)``, ``("vel", i)``, ``("bias",)``,
        ``("landmark", j)``; returns the dense covariance over the
        concatenated tangents in request order. f64-on-host, like
        :meth:`marginals` (see :func:`compute_joint_marginals`)."""
        return compute_joint_marginals(result, self.config, keys)

    # ---- evaluation / export --------------------------------------------

    def evaluate(self, result: SlamResult) -> dict[str, Any]:
        traj = result.trajectory
        metrics: dict[str, Any] = {
            "num_poses": int(result.values.num_poses),
            "num_landmarks": int(result.values.num_landmarks),
            "lm_iterations": int(result.stats.iterations),
            "initial_error": float(result.stats.initial_error),
            "final_error": float(result.stats.final_error),
            "converged": bool(result.stats.converged),
            "solve_seconds": result.solve_seconds,
        }
        if len(result.odom_compare) == len(traj) and len(traj) > 0:
            metrics["mse_vs_odom"] = mse_reference_compat(
                traj, result.odom_compare, self.config.eval.z_datum_shift
            )
            metrics["ate_rmse_vs_odom"] = ate_rmse(traj, result.odom_compare)
        return metrics

    def save_graph_dot(self, path: str) -> None:
        if self._graph_cache is None:
            self.batch_create()
        graph, initial = self._graph_cache
        _save_dot(path, graph, initial.num_poses, initial.num_landmarks)

    def plot(self, result: SlamResult, save_path: str | None = None, show: bool = False):
        return plot_trajectory_3d(
            result.trajectory, result.odom_compare, save_path=save_path, show=show
        )


def compute_marginals(
    result: SlamResult,
    config: UslamConfig = DEFAULT_CONFIG,
    pose_indices=(),
    vel_indices=(),
    landmark_indices=(),
    include_bias: bool = False,
):
    """Marginal covariances of selected states at a ``SlamResult``'s
    solution (GTSAM ``Marginals`` parity — reference batch.py:337's
    engine capability; solvers/marginals.py).

    Runs in f64 on the host CPU: covariance recovery solves selected
    columns of the inverse THROUGH the weakly-observable global modes
    (curvature ~1e-8 of the strong modes), which an f32 assembly cannot
    represent — the same accuracy wall the f64-polish tail exists for
    (solvers/polish.py). A one-shot post-solve query, so the f64 host
    cost is irrelevant next to correctness.
    """
    from uslam_tpu.solvers.marginals import marginal_covariances
    from uslam_tpu.solvers.polish import _to_dtype

    cam = StereoCamera.from_config(config.camera)
    cpu = jax.devices("cpu")[0]
    with jax.enable_x64():
        graph64 = jax.device_put(_to_dtype(result.graph, jnp.float64), cpu)
        vals64 = jax.device_put(_to_dtype(result.values, jnp.float64), cpu)
        return marginal_covariances(
            graph64, vals64, cam,
            config.noise.dvl_sigma, config.noise.stereo_sigma,
            config.imu.gravity,
            pose_indices=pose_indices,
            vel_indices=vel_indices,
            landmark_indices=landmark_indices,
            include_bias=include_bias,
            jitter=0.0, refine_iters=2,
        )


def compute_joint_marginals(
    result: SlamResult,
    config: UslamConfig = DEFAULT_CONFIG,
    keys=(),
):
    """Joint covariance over selected states at a ``SlamResult``'s solution
    (GTSAM ``Marginals::jointMarginalCovariance`` parity). f64 on the host
    CPU for the same reason as :func:`compute_marginals` — selected-column
    solves ride the weakly-observable modes, unrepresentable in f32."""
    from uslam_tpu.solvers.marginals import joint_marginal_covariance
    from uslam_tpu.solvers.polish import _to_dtype

    cam = StereoCamera.from_config(config.camera)
    cpu = jax.devices("cpu")[0]
    with jax.enable_x64():
        graph64 = jax.device_put(_to_dtype(result.graph, jnp.float64), cpu)
        vals64 = jax.device_put(_to_dtype(result.values, jnp.float64), cpu)
        return joint_marginal_covariance(
            graph64, vals64, cam,
            config.noise.dvl_sigma, config.noise.stereo_sigma,
            config.imu.gravity, keys,
            jitter=0.0, refine_iters=2,
        )


def run_solver(
    graph, initial, cam, dvl_sigma, stereo_sigma, gravity, solver_cfg,
    huber_delta=None,
):
    """Jitted LM entry (shared by pipeline, bench and __graft_entry__).

    Matmul precision is pinned to 'highest': v5e MXU f32 matmuls default to
    bf16-accumulate passes, which is not enough for normal-equation solves.
    ``solver_cfg.debug_nans`` enables JAX's NaN sanitizer for the solve
    (SURVEY.md §5 — the rebuild's replacement for race/NaN debugging).
    """
    import contextlib

    import numpy as _np

    nan_guard = (
        jax.debug_nans(True) if solver_cfg.debug_nans else contextlib.nullcontext()
    )
    # Host-resident inputs (the pack_sequence output) ship as ONE
    # consolidated buffer per dtype and are unpacked inside the LM program:
    # a per-leaf transfer costs a full round trip on remote-TPU transports
    # (~27 ms x 31 leaves on this environment's tunnel; see PackedPytree).
    leaves = jax.tree.leaves((graph, initial))
    if leaves and all(isinstance(l, (_np.ndarray, _np.generic)) for l in leaves):
        from uslam_tpu.graph.packing import PackedPytree

        packed = PackedPytree.pack((graph, initial))
        with jax.default_matmul_precision("highest"), nan_guard:
            return _jitted_lm_packed(
                packed, cam, dvl_sigma, stereo_sigma, gravity, solver_cfg,
                huber_delta,
            )
    with jax.default_matmul_precision("highest"), nan_guard:
        return _jitted_lm(
            graph, initial, cam, dvl_sigma, stereo_sigma, gravity, solver_cfg,
            huber_delta,
        )


from functools import partial as _partial  # noqa: E402


@_partial(
    jax.jit,
    static_argnames=("dvl_sigma", "stereo_sigma", "gravity", "solver_cfg", "huber_delta"),
)
def _jitted_lm(
    graph, initial, cam, dvl_sigma, stereo_sigma, gravity, solver_cfg, huber_delta
):
    return optimize_lm(
        graph, initial, cam, dvl_sigma, stereo_sigma, gravity, solver_cfg,
        huber_delta,
    )


@_partial(
    jax.jit,
    static_argnames=("dvl_sigma", "stereo_sigma", "gravity", "solver_cfg", "huber_delta"),
)
def _jitted_lm_packed(
    packed, cam, dvl_sigma, stereo_sigma, gravity, solver_cfg, huber_delta
):
    """LM over a consolidated (graph, initial) upload — the unpack slicing
    runs inside this program, so ingest pays only the 2-buffer transfer."""
    graph, initial = packed.unpack()
    return optimize_lm(
        graph, initial, cam, dvl_sigma, stereo_sigma, gravity, solver_cfg,
        huber_delta,
    )


def run_sequence(
    seq: SensorSequence,
    config: UslamConfig = DEFAULT_CONFIG,
    with_landmarks: bool = True,
    fast_ingest: bool = True,
) -> SlamResult:
    """Offline end-to-end driver: replaces the reference ``__main__`` loop
    (batch.py:309-343) — replay the sequence through time sync, accumulate
    keyframes, then solve once at the end (the rosbag-exit trigger becomes
    simply reaching EOF; SURVEY.md C13).

    ``fast_ingest`` uses the vectorized packer (graph/packing.py); False
    replays through the reference-shaped per-keyframe API (slow, kept for
    parity testing).
    """
    slam = AUVSlam(config)

    # No precomputed feature stream but raw imagery present: run the ORB
    # front-end (the in-framework replacement for the nodelet features the
    # reference consumes pre-extracted, SURVEY.md C18).
    if not seq.features and seq.images_left is not None:
        from uslam_tpu.frontend.tracker import StereoFrontend, integrate_gyro_rotvec

        fe = StereoFrontend(config.camera, config.frontend)
        t0 = time.perf_counter()
        n_frames = len(seq.image_t)
        # Integrated gyro rotation per inter-frame interval (host numpy,
        # cheap) — enables rotation-compensated temporal RANSAC everywhere.
        rotvecs = np.zeros((n_frames, 3), np.float32)
        prev_im_t = None
        for i in range(n_frames):
            im_t = float(seq.image_t[i])
            if prev_im_t is not None and len(seq.imu_t):
                sl = slice_stream(seq.imu_t, prev_im_t, im_t)
                if sl.stop > sl.start:
                    rotvecs[i] = integrate_gyro_rotvec(
                        seq.imu_gyro[sl.start : sl.stop], config.imu.default_dt
                    )
            prev_im_t = im_t
        # Chunked device pipeline: one program + one device_get per CHUNK
        # frames (per-frame dispatch is latency-bound on remote-TPU links —
        # the batched path is the nodelet thread pool's throughput axis,
        # reference launch/stereo.launch:33).
        chunk = max(1, int(config.frontend.offline_chunk))
        seq.features = []
        for c0 in range(0, n_frames, chunk):
            c1 = min(c0 + chunk, n_frames)
            seq.features.extend(
                fe.process_chunk(
                    seq.images_left[c0:c1], seq.images_right[c0:c1],
                    seq.image_t[c0:c1], rotvecs[c0:c1],
                    pad_to=chunk if c1 - c0 < chunk else None,
                )
            )
        log.info(
            "frontend: %d stereo frames in %.2fs (%.1f fps, chunk=%d)",
            len(seq.features),
            time.perf_counter() - t0,
            len(seq.features) / max(time.perf_counter() - t0, 1e-9),
            chunk,
        )

    if fast_ingest:
        from uslam_tpu.graph.packing import pack_sequence

        t0 = time.perf_counter()
        graph, initial, odom_compare, _rows = pack_sequence(
            seq, config, with_landmarks=with_landmarks
        )
        log.info(
            "ingest: %d keyframes, %d landmarks packed in %.2fs",
            initial.num_poses, initial.num_landmarks, time.perf_counter() - t0,
        )
        slam._graph_cache = (graph, initial)
        slam.odom_compare = list(odom_compare)
        result = slam.solve(with_landmark=with_landmarks)
        if seq.gt_pos is not None and len(seq.gt_pos) >= len(result.trajectory):
            result.metrics["ate_rmse_vs_gt"] = ate_rmse(
                result.trajectory, seq.gt_pos[: len(result.trajectory)]
            )
        return result

    feat_t = np.array([f.t for f in seq.features]) if seq.features else np.zeros(0)
    streams = [seq.dvl_twist_t] + ([feat_t] if len(feat_t) else [])
    triples = approximate_time_join(seq.dvl_pose_t, streams, config.timesync.slop)

    prev_t = None
    fixed_dt = config.imu.default_dt
    for pivot_i, picks in triples:
        t = float(seq.dvl_pose_t[pivot_i])
        # Latest pressure at or before t (the reference uses the most recent
        # callback value, batch.py:54).
        pi = int(np.searchsorted(seq.pressure_t, t, side="right")) - 1
        if pi < 0:
            continue  # reference drops triples until a depth exists (batch.py:54)
        depth = float(pressure_to_depth(seq.pressure_mbar[pi], config.pressure))

        # IMU samples since the previous keyframe.
        lo_t = prev_t if prev_t is not None else -np.inf
        sl = slice_stream(seq.imu_t, lo_t, t)
        for k in range(sl.start, sl.stop):
            slam.update_imu(seq.imu_acc[k], seq.imu_gyro[k], fixed_dt)
        prev_t = t

        features = None
        if len(feat_t):
            ff = seq.features[picks[1]]
            features = (ff.ids, ff.u0, ff.v0, ff.u1, ff.v1)

        slam.batch_update(
            seq.dvl_pose_quat[pivot_i],
            seq.dvl_pose_pos[pivot_i],
            seq.dvl_twist_vel[picks[0]],
            depth,
            features,
        )

    result = slam.solve(with_landmark=with_landmarks)
    if seq.gt_pos is not None and len(seq.gt_pos) >= len(result.trajectory):
        result.metrics["ate_rmse_vs_gt"] = ate_rmse(
            result.trajectory, seq.gt_pos[: len(result.trajectory)]
        )
    return result
