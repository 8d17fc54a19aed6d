"""Host-side graph assembly -> static-shape device arrays.

Replaces the per-keyframe Python loop in the reference's ``batch_create``
(reference batch.py:270-305) — push ImuFactor + DVL factor per step, then
insert-if-new landmark + stereo factor per feature — with an append-style
builder that finalizes into struct-of-arrays the jit solver consumes.

Replication notes (SURVEY.md §2.1):
- Factor cadence matches the reference: priors only at keyframe 0; IMU + DVL
  factors for every i >= 1; stereo factors for every feature at i >= 1
  (the reference's ``else`` branch, batch.py:285-305).
- Landmark ids are interned to dense rows; first observation wins for the
  initial estimate (insert-if-new, batch.py:297-298).
- IMU sample buffers are padded to a static S per interval (dt = 0 rows are
  no-ops) and feature counts to bucketed F so jit shapes stay static.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from uslam_tpu.config import UslamConfig
from uslam_tpu.factors.imu import ImuIntervalData, preintegrate_with_cov, whitener_from_cov
from uslam_tpu.geometry.se3 import Pose3
from uslam_tpu.graph.values import Values


class Priors(NamedTuple):
    pose_quat: jnp.ndarray        # (4,)
    pose_trans: jnp.ndarray       # (3,)
    pose_sigmas: jnp.ndarray      # (6,) [rot x3, trans x3]
    vel: jnp.ndarray              # (3,)
    vel_sigma: jnp.ndarray        # ()
    bias: jnp.ndarray             # (6,)
    bias_weight: jnp.ndarray      # () = 1/sigma; 0 disables the bias prior
    # Dense marginal prior on [pose_0(6), vel_0(3), bias(6)] — produced by
    # fixed-lag marginalization (solvers/fixed_lag.py). sqrt_info is the
    # transposed Cholesky factor of the 15x15 marginal information;
    # weight 0 disables (batch mode).
    marg_sqrt_info: jnp.ndarray   # (15, 15)
    marg_pose_quat: jnp.ndarray   # (4,) linearization point
    marg_pose_trans: jnp.ndarray  # (3,)
    marg_vel: jnp.ndarray         # (3,)
    marg_bias: jnp.ndarray        # (6,)
    marg_weight: jnp.ndarray      # ()


class ImuIntervals(NamedTuple):
    data: ImuIntervalData         # (N-1, S, ...) interval i couples frames (i, i+1)
    whitener: jnp.ndarray         # (N-1, 9, 9) inv sqrt preintegration cov
    mask: jnp.ndarray             # (N-1,) 1.0 where the interval has samples


class DvlMeasurements(NamedTuple):
    vel_body: jnp.ndarray         # (N, 3)
    mask: jnp.ndarray             # (N,) 1.0 where a DVL factor exists (i >= 1)


class StereoObservations(NamedTuple):
    cam_idx: jnp.ndarray          # (F,) frame index
    lm_idx: jnp.ndarray           # (F,) landmark row
    meas: jnp.ndarray             # (F, 3) (uL, uR, v) pixels
    mask: jnp.ndarray             # (F,) 1.0 valid
    # Per-landmark observation grouping for the Schur complement:
    lm_obs_idx: jnp.ndarray       # (M, K) indices into F (0-padded)
    lm_obs_mask: jnp.ndarray      # (M, K)


class GraphArrays(NamedTuple):
    """The whole factor graph as one pytree of static-shape arrays."""

    priors: Priors
    imu: ImuIntervals
    dvl: DvlMeasurements
    stereo: StereoObservations


def _bucket(n: int, minimum: int = 8) -> int:
    """Round up to the next power of two (bounds jit recompilations)."""
    b = minimum
    while b < n:
        b *= 2
    return b


@dataclass
class GraphBuilder:
    """Accumulates keyframes then finalizes to (GraphArrays, Values).

    The public add-* surface mirrors what the reference's ``batch_update``
    accumulates per synchronized triple (batch.py:253-267).
    """

    config: UslamConfig
    poses: list = field(default_factory=list)        # (quat wxyz, trans) np
    vels: list = field(default_factory=list)
    imu_buffers: list = field(default_factory=list)  # per keyframe: (S_i, 7) [acc, gyro, dt]
    dvl_vels: list = field(default_factory=list)
    features: list = field(default_factory=list)     # per keyframe: list of (id, uL, uR, v)
    landmark_init: dict = field(default_factory=dict)  # id -> np (3,)
    _lm_rows: dict = field(default_factory=dict)     # id -> dense row

    def add_keyframe(
        self,
        pose_quat: np.ndarray,
        pose_trans: np.ndarray,
        imu_samples: np.ndarray | None,
        dvl_vel_body: np.ndarray | None,
        features: list | None = None,
        vel_init: np.ndarray | None = None,
    ) -> int:
        """Append one keyframe.

        imu_samples: (S_i, 7) columns [ax, ay, az, gx, gy, gz, dt] buffered
        since the previous keyframe (reference buffers 6-vectors and uses a
        fixed dt, batch.py:138-141,290 — pass dt explicitly here).
        features: iterable of (landmark_id, uL, uR, v, init_world_xyz).
        """
        self.poses.append((np.asarray(pose_quat, np.float64), np.asarray(pose_trans, np.float64)))
        # Reference initializes every velocity to zero (batch.py:279).
        self.vels.append(
            np.zeros(3) if vel_init is None else np.asarray(vel_init, np.float64)
        )
        self.imu_buffers.append(
            np.zeros((0, 7)) if imu_samples is None else np.asarray(imu_samples, np.float64)
        )
        self.dvl_vels.append(
            np.zeros(3) if dvl_vel_body is None else np.asarray(dvl_vel_body, np.float64)
        )
        frame_feats = []
        if features:
            for lm_id, uL, uR, v, init_xyz in features:
                if lm_id not in self._lm_rows:
                    self._lm_rows[lm_id] = len(self._lm_rows)
                    self.landmark_init[lm_id] = np.asarray(init_xyz, np.float64)
                frame_feats.append((self._lm_rows[lm_id], uL, uR, v))
        self.features.append(frame_feats)
        return len(self.poses) - 1

    @property
    def num_keyframes(self) -> int:
        return len(self.poses)

    @property
    def num_landmarks(self) -> int:
        return len(self._lm_rows)

    def finalize(
        self, dtype=jnp.float32, with_landmarks: bool = True, as_numpy: bool = False
    ):
        """Build (GraphArrays, Values). ``with_landmarks`` mirrors the
        reference's ``batch_create(with_landmark=...)`` switch (batch.py:270).

        ``as_numpy`` keeps the leaves host-side numpy: per-leaf jnp.asarray
        is a device transfer each, and callers that re-finalize every
        keyframe (the fixed-lag window) ship the result as ONE consolidated
        buffer per dtype instead (graph.packing.PackedPytree).
        """
        cfg = self.config
        n = len(self.poses)
        if n < 1:
            raise ValueError("graph needs at least one keyframe")

        quats = np.stack([q for q, _ in self.poses])
        trans = np.stack([t for _, t in self.poses])
        vels = np.stack(self.vels)

        # --- IMU intervals: interval i uses samples buffered AT keyframe i+1
        # (what arrived since keyframe i) — reference integrates
        # imu_accum[i] right before pushing the factor for step i
        # (batch.py:289-291).
        S = max(
            cfg.imu.max_samples_per_keyframe,
            _bucket(max((b.shape[0] for b in self.imu_buffers[1:]), default=1)),
        )
        acc = np.zeros((max(n - 1, 1), S, 3))
        gyro = np.zeros((max(n - 1, 1), S, 3))
        dts = np.zeros((max(n - 1, 1), S))
        imu_mask = np.zeros(max(n - 1, 1))
        for i in range(1, n):
            buf = self.imu_buffers[i]
            s = min(buf.shape[0], S)
            if s > 0:
                acc[i - 1, :s] = buf[:s, 0:3]
                gyro[i - 1, :s] = buf[:s, 3:6]
                dts[i - 1, :s] = buf[:s, 6]
                imu_mask[i - 1] = 1.0

        # --- DVL: factor exists for i >= 1 (batch.py:292).
        dvl = np.stack(self.dvl_vels)
        dvl_mask = np.ones(n)
        dvl_mask[0] = 0.0

        # --- Stereo observations (i >= 1, batch.py:295-305), budgeted at
        # max_obs_per_landmark per landmark (Schur group budget; dropped
        # observations leave the flat factor set and the per-landmark
        # groups consistent). The budget is STRATIFIED over each track —
        # same policy as graph.packing.stratified_obs_mask — so loop-
        # closure re-observations survive on revisiting trajectories.
        from uslam_tpu.graph.packing import stratified_obs_mask

        cap = self.config.solver.max_obs_per_landmark
        obs_all = []
        for i in range(1, n):
            if not with_landmarks:
                break
            for lm_row, uL, uR, v, in self.features[i]:
                obs_all.append((i, lm_row, uL, uR, v))
        if obs_all:
            lm_keys = np.array([o[1] for o in obs_all])
            keep_mask = stratified_obs_mask(lm_keys, cap)
            obs = [o for o, k in zip(obs_all, keep_mask) if k]
        else:
            obs = []
        m = len(self._lm_rows) if with_landmarks else 0
        f_real = len(obs)
        F = _bucket(max(f_real, 1))
        cam_idx = np.zeros(F, np.int32)
        lm_idx = np.zeros(F, np.int32)
        meas = np.zeros((F, 3))
        s_mask = np.zeros(F)
        for k, (ci, li, uL, uR, v) in enumerate(obs):
            cam_idx[k], lm_idx[k] = ci, li
            meas[k] = (uL, uR, v)
            s_mask[k] = 1.0

        # Per-landmark obs grouping (for Schur elimination). The landmark
        # axis is bucketed to a power of two: static shapes for jit AND even
        # divisibility over power-of-two device meshes (parallel/mesh.py).
        M = _bucket(max(m, 1))
        per_lm = [[] for _ in range(M)]
        for k in range(f_real):
            per_lm[lm_idx[k]].append(k)
        K = _bucket(max((len(o) for o in per_lm), default=1), minimum=2)
        lm_obs_idx = np.zeros((M, K), np.int32)
        lm_obs_mask = np.zeros((M, K))
        for j, o in enumerate(per_lm):
            lm_obs_idx[j, : len(o)] = o
            lm_obs_mask[j, : len(o)] = 1.0

        landmarks = np.zeros((M, 3))
        if with_landmarks:
            for lm_id, row in self._lm_rows.items():
                landmarks[row] = self.landmark_init[lm_id]

        noise = cfg.noise
        bias_weight = (
            0.0 if noise.prior_bias_sigma is None else 1.0 / noise.prior_bias_sigma
        )
        if as_numpy:
            npt = np.float64 if dtype == jnp.float64 else np.float32
            arr = lambda x, dt=npt: np.asarray(x, dt)          # noqa: E731
            zeros = lambda sh, dt=npt: np.zeros(sh, dt)        # noqa: E731
        else:
            arr = lambda x, dt=dtype: jnp.asarray(x, dt)       # noqa: E731
            zeros = lambda sh, dt=dtype: jnp.zeros(sh, dt)     # noqa: E731
        idt = np.int32 if as_numpy else None
        priors = Priors(
            pose_quat=arr(quats[0]),
            pose_trans=arr(trans[0]),
            pose_sigmas=arr(noise.prior_pose_sigmas),
            vel=arr(vels[0]),
            vel_sigma=arr(noise.prior_vel_sigma),
            bias=zeros(6),
            bias_weight=arr(bias_weight),
            marg_sqrt_info=zeros((15, 15)),
            marg_pose_quat=arr([1.0, 0, 0, 0]),
            marg_pose_trans=zeros(3),
            marg_vel=zeros(3),
            marg_bias=zeros(6),
            marg_weight=zeros(()),
        )

        imu_data_host = ImuIntervalData(acc=acc, gyro=gyro, dt=dts)
        whitener = _compute_imu_whiteners(imu_data_host, cfg)
        imu = ImuIntervals(
            data=ImuIntervalData(acc=arr(acc), gyro=arr(gyro), dt=arr(dts)),
            whitener=arr(whitener),
            mask=arr(imu_mask),
        )
        dvl_arr = DvlMeasurements(vel_body=arr(dvl), mask=arr(dvl_mask))
        stereo = StereoObservations(
            cam_idx=np.asarray(cam_idx, idt) if as_numpy else jnp.asarray(cam_idx),
            lm_idx=np.asarray(lm_idx, idt) if as_numpy else jnp.asarray(lm_idx),
            meas=arr(meas),
            mask=arr(s_mask),
            lm_obs_idx=np.asarray(lm_obs_idx, idt) if as_numpy else jnp.asarray(lm_obs_idx),
            lm_obs_mask=arr(lm_obs_mask),
        )
        graph = GraphArrays(priors=priors, imu=imu, dvl=dvl_arr, stereo=stereo)
        values = Values(
            pose_quat=arr(quats),
            pose_trans=arr(trans),
            vel=arr(vels),
            bias=zeros(6),
            landmarks=arr(landmarks),
        )
        return graph, values

    def landmark_rows(self) -> dict:
        """id -> dense row mapping (for result extraction)."""
        return dict(self._lm_rows)


def _compute_imu_whiteners(data: ImuIntervalData, cfg: UslamConfig) -> np.ndarray:
    """Preintegration covariance at zero bias -> whitening, over intervals.
    Fixed at linearization like GTSAM's PreintegratedImuMeasurements
    (reference batch.py:289-293).

    Host-side work with ZERO XLA involvement — the jitted variant
    recompiled ~1s per process (this host's CPU AOT cache doesn't reload)
    and cost ~2s dispatched through the TPU tunnel. Prefers the native C++
    recursion (uslam_tpu.native, ~4x the vectorized-numpy path — the
    ingest hot spot at 1k poses); numpy fallback when no toolchain.
    Equivalence with the jit oracle (_whitener_fn) and between the native
    and numpy paths is tested."""
    from uslam_tpu import native

    out = native.imu_whiteners(
        data.acc, data.gyro, data.dt,
        cfg.imu.accel_cov, cfg.imu.gyro_cov, cfg.imu.integration_cov,
    )
    if out is not None:
        return out
    return _whiteners_numpy(
        data, cfg.imu.accel_cov, cfg.imu.gyro_cov, cfg.imu.integration_cov
    )


def _np_hat(w: np.ndarray) -> np.ndarray:
    """(F, 3) -> (F, 3, 3) skew-symmetric."""
    F = w.shape[0]
    H = np.zeros((F, 3, 3))
    H[:, 0, 1], H[:, 0, 2] = -w[:, 2], w[:, 1]
    H[:, 1, 0], H[:, 1, 2] = w[:, 2], -w[:, 0]
    H[:, 2, 0], H[:, 2, 1] = -w[:, 1], w[:, 0]
    return H


def _np_exp_and_left_jacobian(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Batched Rodrigues Exp(w) and SO(3) left Jacobian Jl(w), f64 numpy."""
    th2 = np.sum(w * w, axis=1)
    th = np.sqrt(th2)
    small = th < 1e-8
    with np.errstate(invalid="ignore", divide="ignore"):
        s = np.where(small, 1.0 - th2 / 6.0, np.sin(th) / np.where(small, 1.0, th))
        c = np.where(small, 0.5 - th2 / 24.0, (1.0 - np.cos(th)) / np.where(small, 1.0, th2))
        j2 = np.where(
            small, 1.0 / 6.0 - th2 / 120.0,
            (th - np.sin(th)) / np.where(small, 1.0, th2 * th),
        )
    H = _np_hat(w)
    H2 = H @ H
    eye = np.broadcast_to(np.eye(3), H.shape)
    R = eye + s[:, None, None] * H + c[:, None, None] * H2
    Jl = eye + c[:, None, None] * H + j2[:, None, None] * H2
    return R, Jl


def _whiteners_numpy(
    data: ImuIntervalData, accel_cov: float, gyro_cov: float, integration_cov: float
) -> np.ndarray:
    """The covariance recursion of factors.imu.preintegrate_with_cov
    (Forster TRO'17 eq. 62-63, GTSAM continuous-time noise semantics) at
    zero bias, vectorized over intervals in f64; returns inv(chol(P))."""
    acc = np.asarray(data.acc, np.float64)
    gyro = np.asarray(data.gyro, np.float64)
    dts = np.asarray(data.dt, np.float64)
    F, S, _ = acc.shape
    eye3 = np.broadcast_to(np.eye(3), (F, 3, 3))
    R = np.tile(np.eye(3), (F, 1, 1))
    P = np.zeros((F, 9, 9))
    for k in range(S):
        a, w, h = acc[:, k], gyro[:, k], dts[:, k]
        active = h > 0.0
        if not active.any():
            continue
        hs = h[:, None, None]
        dR, Jl_neg = _np_exp_and_left_jacobian(-w * h[:, None])
        # Exp(wdt) = dR^T (since dR = Exp(-wdt)); Jr(wdt) = Jl(-wdt).
        Rh = _np_hat(a) * hs
        A = np.zeros((F, 9, 9))
        A[:, 0:3, 0:3] = dR                      # Exp(wdt)^T
        A[:, 3:6, 0:3] = -R @ Rh
        A[:, 3:6, 3:6] = np.eye(3)
        A[:, 6:9, 0:3] = -0.5 * (R @ Rh) * hs
        A[:, 6:9, 3:6] = eye3 * hs
        A[:, 6:9, 6:9] = np.eye(3)

        G_g = Jl_neg * hs
        G_av = R * hs
        G_ap = 0.5 * R * hs * hs
        with np.errstate(divide="ignore"):
            inv_h = np.where(active, 1.0 / np.maximum(h, 1e-9), 0.0)[:, None, None]
        Q = np.zeros((F, 9, 9))
        Q[:, 0:3, 0:3] = gyro_cov * inv_h * (G_g @ G_g.transpose(0, 2, 1))
        Q[:, 3:6, 3:6] = accel_cov * inv_h * (G_av @ G_av.transpose(0, 2, 1))
        Q[:, 3:6, 6:9] = accel_cov * inv_h * (G_av @ G_ap.transpose(0, 2, 1))
        Q[:, 6:9, 3:6] = Q[:, 3:6, 6:9].transpose(0, 2, 1)
        Q[:, 6:9, 6:9] = (
            accel_cov * inv_h * (G_ap @ G_ap.transpose(0, 2, 1))
            + integration_cov * hs * np.eye(3)
        )

        P_new = A @ P @ A.transpose(0, 2, 1) + Q
        m = active[:, None, None]
        P = np.where(m, P_new, P)
        # R_{k+1} = R_k @ Exp(wdt); Exp(wdt) = Exp(-wdt)^T = dR^T.
        R = np.where(m, R @ dR.transpose(0, 2, 1), R)

    L = np.linalg.cholesky(P + 1e-10 * np.eye(9))
    return np.linalg.solve(L, np.broadcast_to(np.eye(9), L.shape))


@functools.lru_cache(maxsize=None)
def _whitener_fn(accel_cov: float, gyro_cov: float, integration_cov: float):
    """Module-cached jit of the whitener computation: a fresh closure per
    pack call caused a ~1s XLA recompile on EVERY ingest (profiled)."""

    @jax.jit
    def run(d):
        with jax.default_matmul_precision("highest"):
            def one(interval):
                _, P = preintegrate_with_cov(
                    interval, jnp.zeros(6, d.acc.dtype),
                    accel_cov, gyro_cov, integration_cov,
                )
                return whitener_from_cov(P, jitter=1e-10)

            return jax.vmap(one)(d)

    return run
