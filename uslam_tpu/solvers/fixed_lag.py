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


def _imu_whitener_record(imu_samples, config):
    """Raw buffered IMU samples (n, 7) or None -> fixed-shape
    (imu (S,7) f32, whitener (9,9) f32, valid f32).

    Whiteners from the UNQUANTIZED f64 samples (same contract as the batch
    ingest path — see CLAUDE.md); the graph data itself is f32."""
    S = config.imu.max_samples_per_keyframe
    imu64 = np.zeros((S, 7), np.float64)
    valid = 0.0
    if imu_samples is not None and len(imu_samples):
        s = min(len(imu_samples), S)
        imu64[:s] = np.asarray(imu_samples, np.float64)[:s]
        valid = 1.0
    from uslam_tpu.factors.imu import ImuIntervalData
    from uslam_tpu.graph.builder import _compute_imu_whiteners

    whit = _compute_imu_whiteners(
        ImuIntervalData(
            acc=imu64[None, :, 0:3], gyro=imu64[None, :, 3:6],
            dt=imu64[None, :, 6],
        ),
        config,
    )[0].astype(np.float32)
    return imu64.astype(np.float32), whit, np.float32(valid)


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
    # Steady-state window kept ON DEVICE between keyframes: one
    # consolidated upload (the new keyframe record) + one fetch per step
    # instead of rebuilding and shipping the whole window graph (see the
    # device-resident section below). Fill and the first marginalization
    # still use the host path.
    device_resident: bool = False
    feat_slots: int = 64          # static per-frame feature budget (device mode)
    # Solver policy for STEADY-STATE window updates (window full, oldest
    # frame marginalized each step) — e.g. an iteration-bounded config for
    # real-time streams (ISAM2's bounded incremental update). None = use
    # config.solver. FILL-phase solves always run config.solver: they
    # start from raw odometry and their result is baked into the first
    # marginal, so they need full convergence.
    steady_solver: object = None
    _frames: deque = field(default_factory=deque)
    _marg: dict | None = None
    _trajectory: list = field(default_factory=list)
    _dev_state: object = None
    # Per-keyframe latency split for the device-resident steady state:
    # dicts with record/solve/fetch milliseconds (solve = upload + device
    # execution up to block_until_ready; fetch = the device->host round
    # trip). Appended by _device_step; bench.py's online block reads it.
    timings: list = field(default_factory=list)

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

        if (
            self.device_resident
            and self._marg is not None
            and len(self._frames) > self.window
        ):
            return self._device_step()

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
                cfg.imu.gravity, self.steady_solver or cfg.solver,
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

    # ---- device-resident steady state --------------------------------

    def _frame_record_arrays(self, fr: "_Keyframe"):
        """One keyframe -> fixed-shape f32/int32 record arrays."""
        Kf = self.feat_slots
        imu, whit, valid = _imu_whitener_record(fr.imu, self.config)
        ids = np.full(Kf, int(_ID_SENTINEL), np.int32)
        meas = np.zeros((Kf, 3), np.float32)
        init = np.zeros((Kf, 3), np.float32)
        fmask = np.zeros(Kf, np.float32)
        if fr.features:
            for k, (lm_id, uL, uR, v, xyz) in enumerate(fr.features[:Kf]):
                ids[k] = np.int32(lm_id)
                meas[k] = (uL, uR, v)
                init[k] = np.asarray(xyz, np.float32)
                fmask[k] = 1.0
        return DeviceWindowRecord(
            quat=np.asarray(fr.quat, np.float32),
            trans=np.asarray(fr.trans, np.float32),
            vel=np.asarray(fr.vel, np.float32),
            imu=imu,
            imu_whitener=whit,
            imu_valid=np.asarray(valid, np.float32),
            dvl=np.asarray(fr.dvl, np.float32),
            feat_ids=ids,
            feat_meas=meas,
            feat_init=init,
            feat_mask=fmask,
        )

    def _init_device_state(self, frames=None):
        """One-time upload of the current W-frame window + marginal."""
        if frames is None:
            frames = list(self._frames)[:-1]  # all but the just-appended one
        recs = [self._frame_record_arrays(fr) for fr in frames]
        stack = lambda name: np.stack([getattr(r, name) for r in recs])  # noqa: E731
        m = self._marg
        state = DeviceWindowState(
            quat=stack("quat"), trans=stack("trans"), vel=stack("vel"),
            bias=np.asarray(m["bias"], np.float32),
            imu=stack("imu"), imu_whitener=stack("imu_whitener"),
            imu_valid=stack("imu_valid"), dvl=stack("dvl"),
            feat_ids=stack("feat_ids"), feat_meas=stack("feat_meas"),
            feat_init=stack("feat_init"), feat_mask=stack("feat_mask"),
            marg_sqrt_info=np.asarray(m["sqrt_info"], np.float32),
            marg_quat=np.asarray(m["pose_quat"], np.float32),
            marg_trans=np.asarray(m["pose_trans"], np.float32),
            marg_vel=np.asarray(m["vel"], np.float32),
            marg_bias=np.asarray(m["bias"], np.float32),
        )
        self._dev_state = jax.device_put(state)

    def _device_step(self) -> Values:
        import time as _time

        from uslam_tpu.graph.packing import PackedPytree

        if self._dev_state is None:
            self._init_device_state()
        cfg = self.config
        t0 = _time.perf_counter()
        rec = self._frame_record_arrays(self._frames[-1])
        t1 = _time.perf_counter()
        self._dev_state, outputs = _device_window_step(
            self._dev_state, PackedPytree.pack(rec), self.cam,
            cfg.noise.dvl_sigma, cfg.noise.stereo_sigma, cfg.imu.gravity,
            self.steady_solver or cfg.solver, cfg,
        )
        jax.block_until_ready(outputs)
        t2 = _time.perf_counter()
        pq, pt, vv, departing, _stats = _unpack_step_outputs(
            jax.device_get(outputs)
        )
        t3 = _time.perf_counter()
        self.timings.append(
            {
                "record_ms": (t1 - t0) * 1e3,
                "solve_ms": (t2 - t1) * 1e3,   # upload + device execution
                "fetch_ms": (t3 - t2) * 1e3,   # device->host round trip
                "lm_iters": int(_stats.iterations),
            }
        )

        # Roll the host mirror (kept for full_trajectory / API parity).
        self._frames.popleft()
        for i, fr in enumerate(self._frames):
            fr.quat, fr.trans, fr.vel = pq[i + 1], pt[i + 1], vv[i + 1]
        self._trajectory.append(np.asarray(departing, np.float64))
        return Values(
            pose_quat=pq, pose_trans=pt, vel=vv,
            bias=np.zeros(6, np.float32), landmarks=np.zeros((1, 3), np.float32),
        )

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


# ==========================================================================
# Device-resident rolling window (steady state)
# ==========================================================================
#
# The host path above rebuilds the window graph in numpy and ships it every
# keyframe (~2 uploads + 1 fetch; plus host GraphBuilder time). On a
# high-latency device link every round trip is ~27 ms, so the online
# keyframe latency was dominated by transport. Here the whole window state
# lives ON DEVICE between keyframes: the host uploads ONE consolidated
# record (the new keyframe's measurements), and one compiled program rolls
# the window, re-builds the graph arrays device-side (landmark interning
# via sized unique + rank grouping), runs the production LM, computes the
# dropped-factor marginal, PSD-projects it, and hands back only the small
# estimate arrays — 1 upload + 1 fetch per keyframe.

from typing import NamedTuple  # noqa: E402

_ID_SENTINEL = np.int32(np.iinfo(np.int32).max)


class DeviceWindowState(NamedTuple):
    """Everything the steady-state window needs, resident on device.
    Frame axis length = window W (post-marginalization)."""

    quat: jnp.ndarray          # (W, 4)
    trans: jnp.ndarray         # (W, 3)
    vel: jnp.ndarray           # (W, 3)
    bias: jnp.ndarray          # (6,)
    imu: jnp.ndarray           # (W, S, 7) samples that arrived AT frame i
    imu_whitener: jnp.ndarray  # (W, 9, 9)
    imu_valid: jnp.ndarray     # (W,)
    dvl: jnp.ndarray           # (W, 3)
    feat_ids: jnp.ndarray      # (W, Kf) int32, _ID_SENTINEL padding
    feat_meas: jnp.ndarray     # (W, Kf, 3) pixels (uL, uR, v)
    feat_init: jnp.ndarray     # (W, Kf, 3) world init
    feat_mask: jnp.ndarray     # (W, Kf)
    marg_sqrt_info: jnp.ndarray  # (15, 15)
    marg_quat: jnp.ndarray     # (4,)
    marg_trans: jnp.ndarray    # (3,)
    marg_vel: jnp.ndarray      # (3,)
    marg_bias: jnp.ndarray     # (6,)


class DeviceWindowRecord(NamedTuple):
    """One new keyframe, host-built, shipped as a consolidated upload."""

    quat: jnp.ndarray          # (4,)
    trans: jnp.ndarray         # (3,)
    vel: jnp.ndarray           # (3,)
    imu: jnp.ndarray           # (S, 7)
    imu_whitener: jnp.ndarray  # (9, 9)
    imu_valid: jnp.ndarray     # ()
    dvl: jnp.ndarray           # (3,)
    feat_ids: jnp.ndarray      # (Kf,)
    feat_meas: jnp.ndarray     # (Kf, 3)
    feat_init: jnp.ndarray     # (Kf, 3)
    feat_mask: jnp.ndarray     # (Kf,)


def _device_window_graph(st: DeviceWindowState, rec: DeviceWindowRecord, cfg):
    """(W+1)-frame GraphArrays + Values built entirely on device."""
    from uslam_tpu.factors.imu import ImuIntervalData
    from uslam_tpu.graph.builder import (
        DvlMeasurements, GraphArrays, ImuIntervals, Priors, StereoObservations,
    )

    W, Kf = st.feat_ids.shape
    n = W + 1
    f32 = st.trans.dtype

    quat = jnp.concatenate([st.quat, rec.quat[None]], 0)
    trans = jnp.concatenate([st.trans, rec.trans[None]], 0)
    vel = jnp.concatenate([st.vel, rec.vel[None]], 0)
    imu = jnp.concatenate([st.imu, rec.imu[None]], 0)
    whit = jnp.concatenate([st.imu_whitener, rec.imu_whitener[None]], 0)
    imu_valid = jnp.concatenate([st.imu_valid, rec.imu_valid[None]], 0)
    dvl = jnp.concatenate([st.dvl, rec.dvl[None]], 0)
    ids = jnp.concatenate([st.feat_ids, rec.feat_ids[None]], 0)
    meas = jnp.concatenate([st.feat_meas, rec.feat_meas[None]], 0)
    init = jnp.concatenate([st.feat_init, rec.feat_init[None]], 0)
    fmask = jnp.concatenate([st.feat_mask, rec.feat_mask[None]], 0)

    noise = cfg.noise
    priors = Priors(
        pose_quat=quat[0],
        pose_trans=trans[0],
        # Steady state: explicit first-frame priors are OFF — the marginal
        # carries them (adding both would double-count, see
        # _marginal_information).
        pose_sigmas=jnp.full((6,), 1e6, f32),
        vel=vel[0],
        vel_sigma=jnp.asarray(1e6, f32),
        bias=st.bias,
        bias_weight=jnp.asarray(0.0, f32),
        marg_sqrt_info=st.marg_sqrt_info,
        marg_pose_quat=st.marg_quat,
        marg_pose_trans=st.marg_trans,
        marg_vel=st.marg_vel,
        marg_bias=st.marg_bias,
        marg_weight=jnp.asarray(1.0, f32),
    )
    imu_iv = ImuIntervals(
        data=ImuIntervalData(
            acc=imu[1:, :, 0:3], gyro=imu[1:, :, 3:6], dt=imu[1:, :, 6]
        ),
        whitener=whit[1:],
        mask=imu_valid[1:],
    )
    dvl_arr = DvlMeasurements(
        vel_body=dvl,
        mask=jnp.concatenate([jnp.zeros((1,), f32), jnp.ones((n - 1,), f32)]),
    )

    # ---- stereo: flatten, intern ids, group by landmark -------------------
    F = n * Kf
    frame_of = jnp.repeat(jnp.arange(n, dtype=jnp.int32), Kf)
    obs_ok = (fmask.reshape(-1) > 0) & (frame_of >= 1)   # i >= 1 cadence
    ids_flat = jnp.where(obs_ok, ids.reshape(-1), _ID_SENTINEL)
    M = W * Kf + 1                                       # >= 1 sentinel slot
    uniq = jnp.unique(ids_flat, size=M, fill_value=_ID_SENTINEL)
    rows = jnp.clip(jnp.searchsorted(uniq, ids_flat), 0, M - 1).astype(jnp.int32)

    # Occurrence rank within each landmark's obs (O(F^2), F = (W+1)*Kf).
    same = (rows[None, :] == rows[:, None]) & obs_ok[None, :]
    rank = jnp.sum(
        same & (jnp.arange(F)[None, :] < jnp.arange(F)[:, None]), axis=1
    )
    K = n  # a landmark appears at most once per frame
    lm_obs_idx = (
        jnp.zeros((M, K), jnp.int32)
        .at[rows, jnp.clip(rank, 0, K - 1)]
        .set(jnp.arange(F, dtype=jnp.int32), mode="drop")
    )
    lm_obs_mask = (
        jnp.zeros((M, K), f32)
        .at[rows, jnp.clip(rank, 0, K - 1)]
        .set(obs_ok.astype(f32), mode="drop")
    )
    # Only writes from valid obs with rank < K survive; ranks >= K only
    # occur for the sentinel group, whose mask stays 0 via obs_ok.
    lm_obs_mask = lm_obs_mask * (uniq != _ID_SENTINEL)[:, None]

    # Landmark init = first (lowest flat index) observation's init point.
    first_obs = (
        jnp.full((M,), F, jnp.int32)
        .at[rows]
        .min(jnp.where(obs_ok, jnp.arange(F, dtype=jnp.int32), F), mode="drop")
    )
    lm_init = init.reshape(F, 3)[jnp.clip(first_obs, 0, F - 1)]
    lm_init = lm_init * (first_obs < F)[:, None]

    stereo = StereoObservations(
        cam_idx=frame_of,
        lm_idx=rows,
        meas=meas.reshape(F, 3) * obs_ok[:, None],
        mask=obs_ok.astype(f32),
        lm_obs_idx=lm_obs_idx,
        lm_obs_mask=lm_obs_mask,
    )
    graph = GraphArrays(priors=priors, imu=imu_iv, dvl=dvl_arr, stereo=stereo)
    values = Values(
        pose_quat=quat, pose_trans=trans, vel=vel, bias=st.bias, landmarks=lm_init
    )
    arrays = dict(
        imu=imu, whit=whit, imu_valid=imu_valid, dvl=dvl,
        ids=ids, meas=meas, init=init, fmask=fmask,
    )
    return graph, values, arrays


@partial(
    jax.jit,
    static_argnames=("dvl_sigma", "stereo_sigma", "gravity", "solver_cfg", "config"),
    donate_argnums=(0,),
)
def _device_window_step(
    state, packed_record, cam, dvl_sigma, stereo_sigma, gravity,
    solver_cfg, config,
):
    """One steady-state keyframe, entirely on device.

    ``state`` is a DeviceWindowState of device-resident arrays (donated —
    the rolled buffers reuse them); only ``packed_record`` (the new
    keyframe, a consolidated PackedPytree) crosses host->device. Returns
    (new_state, outputs), outputs = ONE flat f32 buffer (window
    quat/trans/vel, departing finalized frame (10,), stats —
    ``_unpack_step_outputs``), fetched in ONE single-buffer device_get by
    the caller."""
    return _window_step_core(
        state, packed_record.unpack(), cam, dvl_sigma, stereo_sigma, gravity,
        solver_cfg, config,
    )


def _window_step_core(
    st: DeviceWindowState,
    rec: DeviceWindowRecord,
    cam, dvl_sigma, stereo_sigma, gravity, solver_cfg, config,
):
    """Traced body shared by the host-record path and the fused
    (frontend-on-device) path: window graph build, LM solve, dropped-factor
    marginalization, state roll."""
    graph, initial, _ = _device_window_graph(st, rec, config)

    with jax.default_matmul_precision("highest"):
        values, stats = optimize_lm(
            graph, initial, cam, dvl_sigma, stereo_sigma, gravity, solver_cfg
        )
        Lam = _marginal_information(
            graph, values, cam, dvl_sigma, stereo_sigma, gravity
        )
        # PSD projection on device (sparsification can leave tiny negative
        # eigenvalues; 15x15 eigh is trivial).
        w, V = jnp.linalg.eigh(0.5 * (Lam + Lam.T))
        sqrt_info = (V * jnp.sqrt(jnp.clip(w, 0.0, None))).T

    new_state = DeviceWindowState(
        quat=values.pose_quat[1:],
        trans=values.pose_trans[1:],
        vel=values.vel[1:],
        bias=values.bias,
        imu=jnp.concatenate([st.imu[1:], rec.imu[None]], 0),
        imu_whitener=jnp.concatenate(
            [st.imu_whitener[1:], rec.imu_whitener[None]], 0
        ),
        imu_valid=jnp.concatenate([st.imu_valid[1:], rec.imu_valid[None]], 0),
        dvl=jnp.concatenate([st.dvl[1:], rec.dvl[None]], 0),
        feat_ids=jnp.concatenate([st.feat_ids[1:], rec.feat_ids[None]], 0),
        feat_meas=jnp.concatenate([st.feat_meas[1:], rec.feat_meas[None]], 0),
        feat_init=jnp.concatenate([st.feat_init[1:], rec.feat_init[None]], 0),
        feat_mask=jnp.concatenate([st.feat_mask[1:], rec.feat_mask[None]], 0),
        marg_sqrt_info=sqrt_info,
        marg_quat=values.pose_quat[1],
        marg_trans=values.pose_trans[1],
        marg_vel=values.vel[1],
        marg_bias=values.bias,
    )
    departing = jnp.concatenate(
        [values.pose_quat[0], values.pose_trans[0], values.vel[0]]
    )
    # ONE flat f32 output buffer: every separate output leaf pays its own
    # first-transfer round trip through a remote-TPU link (~27 ms each,
    # CLAUDE.md); the packed fetch is one round trip. Layout is
    # self-describing (_unpack_step_outputs derives n from the length).
    outputs = jnp.concatenate(
        [
            values.pose_quat.reshape(-1),
            values.pose_trans.reshape(-1),
            values.vel.reshape(-1),
            departing,
            jnp.stack(
                [
                    stats.initial_error.astype(jnp.float32),
                    stats.final_error.astype(jnp.float32),
                    stats.iterations.astype(jnp.float32),
                    stats.final_lambda.astype(jnp.float32),
                    stats.converged.astype(jnp.float32),
                ]
            ),
        ]
    )
    return new_state, outputs


def _unpack_step_outputs(flat):
    """Host-side inverse of the packed step output: flat (10n + 15,) f32 ->
    (pose_quat (n,4), pose_trans (n,3), vel (n,3), departing (10,),
    LMStats of f32 scalars)."""
    flat = np.asarray(flat)
    n = (flat.size - 15) // 10
    o = 0
    pq = flat[o : o + 4 * n].reshape(n, 4); o += 4 * n
    pt = flat[o : o + 3 * n].reshape(n, 3); o += 3 * n
    vv = flat[o : o + 3 * n].reshape(n, 3); o += 3 * n
    departing = flat[o : o + 10]; o += 10
    from uslam_tpu.solvers.lm import LMStats

    stats = LMStats(*flat[o : o + 5])
    return pq, pt, vv, departing, stats


# ==========================================================================
# Fused steady state: front-end + window solve in ONE device program
# ==========================================================================
#
# The split device-resident path still pays per keyframe: stereo-pair
# upload + ORB-program fetch (the host needs match indices for id
# interning) + record upload + window fetch — ~4 transport round trips on
# a high-latency link, plus the host triangulation in between. Here the id
# interning, landmark triangulation, record assembly, and window step all
# move INTO the program: per keyframe the host uploads the stereo pair
# (one uint8 buffer) and one small f32 record, and fetches the estimates —
# 3 round trips, one program dispatch, zero host math on the critical
# path.


class FusedFrontendState(NamedTuple):
    """Tracker state resident on device (the host mirror of
    ``StereoFrontend._prev`` + id interning counters)."""

    desc: jnp.ndarray      # (K, 8) uint32 — previous left descriptors
    xy: jnp.ndarray        # (K, 2) f32
    mask: jnp.ndarray      # (K,) bool
    ids: jnp.ndarray       # (K,) int32, -1 = no persistent id
    next_id: jnp.ndarray   # () int32


class FusedRecord(NamedTuple):
    """Per-keyframe small inputs (all f32 -> ONE consolidated buffer)."""

    imu: jnp.ndarray         # (S, 7)
    whitener: jnp.ndarray    # (9, 9)
    imu_valid: jnp.ndarray   # ()
    dvl: jnp.ndarray         # (3,)
    quat: jnp.ndarray        # (4,) odom orientation (wxyz)
    pos_xy: jnp.ndarray      # (2,) odom x, y
    depth: jnp.ndarray       # () pressure depth (keyframe z)
    vel0: jnp.ndarray        # (3,) velocity init (mavros or zeros)
    rotvec: jnp.ndarray      # (3,) integrated gyro rotation prev->cur


@partial(
    jax.jit,
    static_argnames=("dvl_sigma", "stereo_sigma", "gravity", "solver_cfg", "config"),
    donate_argnums=(0, 1),
)
def _fused_keyframe_step(
    state, fe_state, pair, packed_rec, cam, kvec,
    dvl_sigma, stereo_sigma, gravity, solver_cfg, config,
):
    """One steady-state keyframe: ORB pair extraction + stereo/temporal
    matching + RANSAC + persistent-id interning + landmark triangulation +
    window solve + marginalization, all in one compiled program.

    ``pair``: (2, H, W) uint8 (one upload buffer); ``packed_rec``: the
    FusedRecord as one consolidated f32 buffer. Returns
    (new_window_state, new_frontend_state, outputs) — outputs identical to
    :func:`_window_step_core`'s.
    """
    from uslam_tpu.frontend.tracker import _orb_pair_step
    from uslam_tpu.geometry.camera import triangulate_stereo
    from uslam_tpu.geometry.se3 import Pose3

    st: DeviceWindowState = state
    fe: FusedFrontendState = fe_state
    rec: FusedRecord = packed_rec.unpack()
    fcfg = config.frontend
    f32 = jnp.float32

    kp_l, kp_r, sm_idx, sm_mask, tm_idx = _orb_pair_step(
        pair, fe.desc, fe.xy, fe.mask, fcfg, rec.rotvec, kvec
    )

    # ---- persistent-id interning, vectorized (same semantics as the host
    # loop in tracker.process: stereo-matched keypoints inherit the tracked
    # previous id; otherwise they get fresh sequential ids in slot order).
    j = jnp.maximum(tm_idx, 0)
    prev_id_j = fe.ids[j]
    tracked = (tm_idx >= 0) & (prev_id_j >= 0)
    inherit = sm_mask & tracked
    needs_new = sm_mask & ~tracked
    nn = needs_new.astype(jnp.int32)
    fresh = fe.next_id + jnp.cumsum(nn) - nn
    ids = jnp.where(
        inherit, prev_id_j, jnp.where(needs_new, fresh, -1)
    ).astype(jnp.int32)
    next_id = fe.next_id + jnp.sum(nn)

    # ---- landmark init: triangulate at the depth-adjusted keyframe pose.
    trans = jnp.concatenate([rec.pos_xy, rec.depth[None]]).astype(f32)
    xy_r = kp_r.xy[jnp.maximum(sm_idx, 0)]
    meas3 = jnp.stack(
        [kp_l.xy[:, 0], xy_r[:, 0], 0.5 * (kp_l.xy[:, 1] + xy_r[:, 1])],
        axis=-1,
    )
    world = triangulate_stereo(cam, Pose3(rec.quat, trans), meas3)

    fmask = sm_mask.astype(f32)
    win_rec = DeviceWindowRecord(
        quat=rec.quat, trans=trans, vel=rec.vel0,
        imu=rec.imu, imu_whitener=rec.whitener, imu_valid=rec.imu_valid,
        dvl=rec.dvl,
        feat_ids=jnp.where(sm_mask, ids, jnp.int32(_ID_SENTINEL)),
        feat_meas=meas3 * fmask[:, None],
        feat_init=world * fmask[:, None],
        feat_mask=fmask,
    )
    new_state, outputs = _window_step_core(
        st, win_rec, cam, dvl_sigma, stereo_sigma, gravity, solver_cfg, config
    )
    new_fe = FusedFrontendState(
        desc=kp_l.desc, xy=kp_l.xy, mask=kp_l.mask, ids=ids, next_id=next_id
    )
    return new_state, new_fe, outputs


# ==========================================================================
# Checkpoint / resume (SURVEY.md §5: fixed-lag state snapshot)
# ==========================================================================


def save_smoother_state(path: str, sm: FixedLagSmoother) -> None:
    """Serialize the smoother's resumable state (window keyframes, marginal
    prior, finalized trajectory) to one npz. The device-resident mirror is
    rebuilt lazily on the first steady-state step after load."""
    arrays: dict[str, np.ndarray] = {
        "window": np.asarray(sm.window),
        "n_frames": np.asarray(len(sm._frames)),
        "trajectory": (
            np.stack(sm._trajectory) if sm._trajectory else np.zeros((0, 10))
        ),
        "has_marg": np.asarray(1 if sm._marg is not None else 0),
    }
    if sm._marg is not None:
        for k, v in sm._marg.items():
            arrays[f"marg_{k}"] = np.asarray(v)
    for i, fr in enumerate(sm._frames):
        arrays[f"f{i}_quat"] = fr.quat
        arrays[f"f{i}_trans"] = fr.trans
        arrays[f"f{i}_vel"] = fr.vel
        arrays[f"f{i}_imu"] = fr.imu if fr.imu is not None else np.zeros((0, 7))
        arrays[f"f{i}_dvl"] = fr.dvl
        feats = fr.features or []
        arrays[f"f{i}_feat"] = np.array(
            [[f[0], f[1], f[2], f[3], *np.asarray(f[4], np.float64)] for f in feats],
            np.float64,
        ).reshape(len(feats), 7)
    np.savez_compressed(path, **arrays)


def load_smoother_state(path: str, config: UslamConfig, **kwargs) -> FixedLagSmoother:
    """Rebuild a FixedLagSmoother from :func:`save_smoother_state` output.
    Extra kwargs (solve_during_fill, device_resident, ...) pass through."""
    z = np.load(path, allow_pickle=False)
    sm = FixedLagSmoother(config, window=int(z["window"]), **kwargs)
    for row in z["trajectory"]:
        sm._trajectory.append(row)
    if int(z["has_marg"]):
        sm._marg = {
            k[len("marg_"):]: z[k] for k in z.files if k.startswith("marg_")
        }
    for i in range(int(z["n_frames"])):
        feats_arr = z[f"f{i}_feat"]
        feats = [
            (int(r[0]), float(r[1]), float(r[2]), float(r[3]), r[4:7])
            for r in feats_arr
        ] or None
        imu = z[f"f{i}_imu"]
        sm._frames.append(
            _Keyframe(
                quat=z[f"f{i}_quat"],
                trans=z[f"f{i}_trans"],
                vel=z[f"f{i}_vel"],
                imu=imu if len(imu) else None,
                dvl=z[f"f{i}_dvl"],
                features=feats,
            )
        )
    return sm
