"""Fixed-lag incremental smoother — the *working* replacement for the
reference's ISAM2 pipeline (isam.py, documented as non-working at
reference README.md:41; bugs cataloged in SURVEY.md §2.1).

Instead of re-implementing ISAM2's incremental Bayes-tree updates (a
pointer-heavy C++ design that maps poorly to XLA), this is a sliding-window
smoother with dense marginalization — the standard TPU-friendly
formulation:

- a window of the last W keyframes is re-solved with the batch LM+Schur
  machinery (one fixed-shape compiled program, reused every step);
- when a keyframe leaves the window, the full dense window Hessian is
  built, the departing frame's 9 dof are Schur-eliminated, and the
  resulting marginal information on [new-oldest pose, vel, bias] becomes a
  dense prior factor (Priors.marg_*) for subsequent windows.

Approximations (documented, standard): marginal cross-couplings to frames
other than the new-oldest are dropped (sparsification), and landmarks whose
observations have all left the window are dropped rather than marginalized.
Accuracy vs the full batch solution is tested in
tests/test_fixed_lag.py (SURVEY.md §4 config 4).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from uslam_tpu.config import UslamConfig
from uslam_tpu.geometry.camera import StereoCamera
from uslam_tpu.graph.builder import GraphBuilder
from uslam_tpu.graph.values import BIAS_DIM, FRAME_DIM, Values
from uslam_tpu.pipeline import run_solver
from uslam_tpu.solvers.lm import optimize_lm
from uslam_tpu.solvers.linearize import linearize_graph
from uslam_tpu.utils.logging import get_logger

log = get_logger("fixed_lag")


def _marginal_information(graph, values: Values, cam, dvl_sigma, stereo_sigma, gravity):
    """15x15 marginal information on [new-oldest pose (6), vel (3),
    bias (6)] from the factors being DROPPED with the departing frame.

    Correct recursive marginalization eliminates the departing frame from
    the factors that leave the graph — the previous marginal prior, the
    frame's own priors, and the frame0->frame1 IMU interval — NOT from
    the whole window Hessian: the window's remaining factors stay in the
    next window, so including them would double-count their information
    every step (measured: marginal eigenvalues growing ~1.5e7 per keyframe
    without bound, overconfidence exploding a long stream — the round-1
    implementation's bug). The departing frame's stereo observations are
    dropped without marginalization (conservative, standard
    sparsification); its DVL factor re-indexes out of the window by the
    i>=1 cadence. The marginal MEAN is taken as the window solution
    (the dropped-subset gradient at the solution is neglected — standard
    fixed-lag practice)."""
    lin = linearize_graph(graph, values, cam, dvl_sigma, stereo_sigma, gravity)
    F = FRAME_DIM
    D = 2 * F + BIAS_DIM                    # [f0(9) | f1(9) | bias(6)] = 24
    dtype = lin.imu_r.dtype
    z = lambda r, c: jnp.zeros((r, c), dtype)  # noqa: E731

    # IMU interval 0 couples f0 -> f1 (+ bias); leaves with frame 0.
    J_imu = jnp.concatenate(
        [
            lin.imu_J_pose_i[0], lin.imu_J_vel_i[0],
            lin.imu_J_pose_j[0], lin.imu_J_vel_j[0],
            lin.imu_J_bias[0],
        ],
        axis=1,
    )                                        # (9, 24)

    # Frame-0 pose/vel priors (first window only; later windows carry them
    # through the marginal and the builder disables the explicit ones).
    J_pp = jnp.concatenate([lin.prior_pose_J, z(6, D - 6)], axis=1)
    J_pv = jnp.concatenate([z(3, 6), lin.prior_vel_J, z(3, D - 9)], axis=1)
    # Bias prior: added once at t=0 (reference batch.py:274 keeps a single
    # run-wide bias); after the first marginalization the builder zeroes
    # it and the marginal carries bias information forward.
    J_pb = jnp.concatenate([z(6, 2 * F), lin.prior_bias_J], axis=1)

    # Previous marginal prior on [f0(9), bias(6)].
    Jm = lin.marg_J                          # (15, 15) over [p0, v0, b]
    J_marg = jnp.concatenate([Jm[:, :F], z(15, F), Jm[:, F:]], axis=1)

    H = (
        J_imu.T @ J_imu
        + J_pp.T @ J_pp
        + J_pv.T @ J_pv
        + J_pb.T @ J_pb
        + J_marg.T @ J_marg
    )
    H00 = H[:F, :F] + 1e-9 * jnp.eye(F, dtype=dtype)
    Hr0 = H[F:, :F]
    return H[F:, F:] - Hr0 @ jnp.linalg.solve(H00, Hr0.T)


@partial(
    jax.jit,
    static_argnames=("dvl_sigma", "stereo_sigma", "gravity", "solver_cfg"),
)
def _jitted_solve_and_marginalize(
    graph, initial, cam, dvl_sigma, stereo_sigma, gravity, solver_cfg
):
    """Window LM solve + departing-frame marginal information in ONE
    compiled program (the steady-state online hot path: two separate
    dispatches cost two device round trips per keyframe)."""
    return _solve_and_marginalize_impl(
        graph, initial, cam, dvl_sigma, stereo_sigma, gravity, solver_cfg
    )


@partial(
    jax.jit,
    static_argnames=("dvl_sigma", "stereo_sigma", "gravity", "solver_cfg"),
)
def _jitted_solve_and_marginalize_packed(
    packed, cam, dvl_sigma, stereo_sigma, gravity, solver_cfg
):
    """Consolidated-upload variant: (graph, initial) arrive as one flat
    buffer per dtype and are unpacked inside the program — 2 transfers per
    keyframe instead of ~31 (see graph.packing.PackedPytree)."""
    graph, initial = packed.unpack()
    return _solve_and_marginalize_impl(
        graph, initial, cam, dvl_sigma, stereo_sigma, gravity, solver_cfg
    )


def _solve_and_marginalize_impl(
    graph, initial, cam, dvl_sigma, stereo_sigma, gravity, solver_cfg
):
    with jax.default_matmul_precision("highest"):
        values, stats = optimize_lm(
            graph, initial, cam, dvl_sigma, stereo_sigma, gravity, solver_cfg
        )
        lam = _marginal_information(graph, values, cam, dvl_sigma, stereo_sigma, gravity)
    return values, stats, lam


@dataclass
class _Keyframe:
    quat: np.ndarray
    trans: np.ndarray
    vel: np.ndarray
    imu: np.ndarray | None          # (S, 7)
    dvl: np.ndarray
    features: list | None           # [(id, uL, uR, v, init_xyz)]


@dataclass
class FixedLagSmoother:
    """Sliding-window smoother with the reference ``isam.py`` usage shape:
    feed measurements per keyframe, get an updated estimate back each step
    (the working analog of isam.update + calculateEstimate,
    reference isam.py:341-342)."""

    config: UslamConfig
    window: int = 10
    # Solve while the window is still filling (reference isam.py updates on
    # every keyframe). False skips those solves: each distinct window size
    # is a separate XLA compilation, so filling without solving avoids
    # window-1 compilations; the frames still get smoothed once the window
    # is full, only the earliest *online* estimates are the raw odometry.
    solve_during_fill: bool = True
    _frames: deque = field(default_factory=deque)
    _marg: dict | None = None
    _trajectory: list = field(default_factory=list)

    def __post_init__(self):
        self.cam = StereoCamera.from_config(self.config.camera)

    def add_keyframe(
        self,
        pose_quat,
        pose_trans,
        vel,
        imu_samples,
        dvl_vel,
        features=None,
    ) -> Values:
        """Append one keyframe, solve the window, marginalize if full.

        Returns the current window estimate (last entry = newest pose)."""
        self._frames.append(
            _Keyframe(
                np.asarray(pose_quat, np.float64),
                np.asarray(pose_trans, np.float64),
                np.asarray(vel, np.float64),
                None if imu_samples is None else np.asarray(imu_samples, np.float64),
                np.zeros(3) if dvl_vel is None else np.asarray(dvl_vel, np.float64),
                features,
            )
        )

        if len(self._frames) <= self.window and not self.solve_during_fill:
            b = GraphBuilder(self.config)
            for i, fr in enumerate(self._frames):
                b.add_keyframe(fr.quat, fr.trans, None, fr.dvl, None, vel_init=fr.vel)
            _, initial = b.finalize(with_landmarks=False)
            return initial

        graph, initial = self._window_graph()
        cfg = self.config
        full = len(self._frames) > self.window
        if full:
            # Steady state: solve + marginal info in one program, one
            # device_get — every separate dispatch or device->host read is
            # a full round trip on high-latency device links.
            from uslam_tpu.graph.packing import PackedPytree

            values, stats, lam_dev = _jitted_solve_and_marginalize_packed(
                PackedPytree.pack((graph, initial)), self.cam,
                cfg.noise.dvl_sigma, cfg.noise.stereo_sigma,
                cfg.imu.gravity, cfg.solver,
            )
            pq, pt, vv, Lam = jax.device_get(
                (values.pose_quat, values.pose_trans, values.vel, lam_dev)
            )
        else:
            values, stats = run_solver(
                graph, initial, self.cam,
                cfg.noise.dvl_sigma, cfg.noise.stereo_sigma,
                cfg.imu.gravity, cfg.solver,
            )
            pq, pt, vv = jax.device_get(
                (values.pose_quat, values.pose_trans, values.vel)
            )
        # Write the refined estimates back into the window keyframes so the
        # next window linearizes at the smoothed state.
        for i, fr in enumerate(self._frames):
            fr.quat, fr.trans, fr.vel = pq[i], pt[i], vv[i]

        if full:
            self._store_marginal(np.asarray(Lam, np.float64), values)
            oldest = self._frames.popleft()
            self._trajectory.append(
                np.concatenate([oldest.quat, oldest.trans, oldest.vel])
            )
        return values

    # ------------------------------------------------------------------

    def _window_graph(self):
        """Build GraphArrays for the current window, injecting the marginal
        prior if one exists."""
        b = GraphBuilder(self.config)
        for i, fr in enumerate(self._frames):
            b.add_keyframe(
                fr.quat, fr.trans,
                fr.imu if i > 0 else None,   # interval belongs to arrival
                fr.dvl, fr.features, vel_init=fr.vel,
            )
        # Host numpy leaves: the window graph is rebuilt EVERY keyframe, so
        # per-leaf device transfers (~31 round trips on high-latency links)
        # are replaced by the consolidated 2-buffer upload (PackedPytree)
        # at the solve dispatch.
        graph, initial = b.finalize(as_numpy=True)
        if self._marg is not None:
            m = self._marg
            graph = graph._replace(
                priors=graph.priors._replace(
                    marg_sqrt_info=np.asarray(m["sqrt_info"], np.float32),
                    marg_pose_quat=np.asarray(m["pose_quat"], np.float32),
                    marg_pose_trans=np.asarray(m["pose_trans"], np.float32),
                    marg_vel=np.asarray(m["vel"], np.float32),
                    marg_bias=np.asarray(m["bias"], np.float32),
                    marg_weight=np.asarray(1.0, np.float32),
                    # The explicit first-pose/vel/bias priors only apply to
                    # the very first window (reference adds them at t=0
                    # only, isam.py:316-319); afterwards the marginal
                    # carries them — re-adding any of them every window
                    # would double-count that information each step.
                    pose_sigmas=np.full(6, 1e6, np.float32),
                    vel_sigma=np.asarray(1e6, np.float32),
                    bias_weight=np.asarray(0.0, np.float32),
                )
            )
        return graph, initial

    def _store_marginal(self, Lam: np.ndarray, values: Values) -> None:
        """PSD-project the 15x15 marginal information and store it as the
        dense prior for the next window."""
        # PSD-project (sparsification can leave tiny negative eigs).
        w, V = np.linalg.eigh((Lam + Lam.T) / 2.0)
        w = np.clip(w, 0.0, None)
        sqrt_info = (V * np.sqrt(w)).T        # rows scaled: sqrt_info^T sqrt_info = Lam

        self._marg = {
            "sqrt_info": sqrt_info,
            "pose_quat": np.asarray(values.pose_quat[1]),
            "pose_trans": np.asarray(values.pose_trans[1]),
            "vel": np.asarray(values.vel[1]),
            "bias": np.asarray(values.bias),
        }

    # ------------------------------------------------------------------

    @property
    def trajectory(self) -> np.ndarray:
        """Marginalized (finalized) poses so far: (T, 10) [quat, trans, vel]."""
        if not self._trajectory:
            return np.zeros((0, 10))
        return np.stack(self._trajectory)

    def full_trajectory(self) -> np.ndarray:
        """Finalized + current-window translations (T_total, 3)."""
        done = self.trajectory[:, 4:7] if len(self._trajectory) else np.zeros((0, 3))
        cur = np.stack([f.trans for f in self._frames]) if self._frames else np.zeros((0, 3))
        return np.concatenate([done, cur], axis=0)
