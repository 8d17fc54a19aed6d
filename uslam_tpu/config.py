"""Typed configuration for the whole framework.

The reference hard-codes every constant inside class ``__init__``s and the ROS
launch file (reference batch.py:95-118,183-189; launch/stereo.launch:36-47).
Here everything lives in one frozen dataclass tree, loadable from a plain dict
(and therefore from YAML/JSON) — this plays the role the
``zed_imu_camera_altered.yaml`` calibration file plays in the reference
(launch/stereo.launch:5-6).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class CameraConfig:
    """Stereo camera calibration.

    Defaults are the ZED-mini constants pinned by the reference
    (batch.py:110-117): ``Cal3_S2Stereo(1827.0, 1827.5999755859375, 0.0,
    968.9000244140625, 561.4000244140625, 0.063)`` at 1920x1080.
    """

    fx: float = 1827.0
    fy: float = 1827.5999755859375
    skew: float = 0.0
    cx: float = 968.9000244140625
    cy: float = 561.4000244140625
    baseline: float = 0.063  # metres
    resolution_x: int = 1920
    resolution_y: int = 1080

    @property
    def f_mean(self) -> float:
        # batch.py:112 — f = (fx + fy) / 2 used for back-projection.
        return (self.fx + self.fy) / 2.0


@dataclass(frozen=True)
class ImuConfig:
    """IMU preintegration parameters (reference batch.py:178-193)."""

    gravity: float = 9.81
    accel_cov: float = 8.999999999999999e-08
    gyro_cov: float = 1.2184696791468346e-07
    integration_cov: float = 1e-07
    bias_acc_cov: float = 0.1   # isotropic variance, batch.py:189
    bias_gyro_cov: float = 0.1
    default_dt: float = 0.005   # 200 Hz assumed, batch.py:34,290
    # 'fixed': every sample uses default_dt (reference behavior,
    # batch.py:290 hard-codes 0.005 regardless of stamps);
    # 'stamps': per-sample dt from the IMU timestamps (the correct physics,
    # available because the loader keeps stamps — SURVEY.md §2.1).
    dt_mode: str = "fixed"
    # Max IMU samples buffered between two keyframes (static-shape pad).
    # 200 Hz IMU at 5 Hz keyframes -> ~40; leave headroom.
    max_samples_per_keyframe: int = 64


@dataclass(frozen=True)
class NoiseConfig:
    """Factor noise sigmas (reference batch.py:95-98,118,189)."""

    # PriorFactorPose3 on X(0): rot sigmas then trans sigmas (batch.py:95).
    prior_pose_sigmas: tuple = (0.1, 0.1, 0.1, 0.3, 0.3, 0.3)
    prior_vel_sigma: float = 0.1       # batch.py:96
    dvl_sigma: float = 0.1             # batch.py:98
    stereo_sigma: float = 10.0         # landmark_noise, batch.py:118
    # The reference inserts B(0) with NO prior (batch.py:274); the bias is
    # constrained only through IMU factors. We keep a configurable bias prior
    # (sigma on all 6 components); None disables it for strict reference
    # semantics. SURVEY.md §2.1 recommends keeping it configurable.
    prior_bias_sigma: float | None = 0.316227766016838  # sqrt(0.1)
    # Huber robust loss on stereo reprojection residuals (whitened units);
    # None keeps the reference's plain Gaussian noise (batch.py:118).
    stereo_huber_delta: float | None = None


@dataclass(frozen=True)
class PressureConfig:
    """Depth-from-pressure conversion constants (reference batch.py:122-126).

    depth = (press_abs_mbar * 100 - atm_pressure) / (water_density * g)
    """

    atm_pressure_pa: float = 98250.0
    water_density: float = 997.0
    gravity: float = 9.81


@dataclass(frozen=True)
class FrontendConfig:
    """ORB front-end parameters.

    Grid/feature budget mirrors the reference nodelet configuration
    (launch/stereo.launch:37-47): 3 rows x 4 cols grid, <=4 features/cell,
    FAST threshold 10, 3 pyramid levels, patch size 15, RANSAC threshold
    3 px, stereo match threshold 5 px.
    """

    grid_rows: int = 3
    grid_cols: int = 4
    max_features_per_cell: int = 4
    fast_threshold: float = 10.0
    fast_arc_length: int = 9      # FAST-9
    pyramid_levels: int = 3
    pyramid_scale: float = 2.0
    patch_size: int = 15          # orientation / descriptor patch radius base
    descriptor_bits: int = 256
    # Hamming matching
    match_max_distance: int = 64          # max Hamming distance for a match
    match_ratio: float = 0.8              # Lowe ratio test
    stereo_max_v_diff: float = 5.0        # epipolar tolerance, stereo.launch:47
    stereo_min_disparity: float = 0.25
    ransac_threshold_px: float = 3.0      # stereo.launch:46
    # Static shapes: features kept per frame = grid_rows*grid_cols*per_cell
    # rounded up; candidate pool size before grid top-K.
    max_candidates: int = 1024
    # Fused Pallas TPU kernels (frontend/pallas_kernels.py) for detection
    # and matching instead of the pure-XLA paths. "auto" (default) enables
    # them whenever the backend is a real TPU (profiled faster there and
    # bit-exact vs the XLA oracle) and falls back to XLA elsewhere —
    # interpret-mode Pallas on CPU is orders of magnitude slower.
    use_pallas: bool | str = "auto"
    # Temporal association: 'orb' (descriptor matching, the north-star
    # design) or 'klt' (pyramidal Lucas-Kanade prediction + nearest
    # detection, the reference nodelet's method — stereo.launch:41-43).
    temporal_tracker: str = "orb"
    klt_gate_px: float = 2.0
    # Offline ingest batching: stereo pairs per fused device program in
    # pipeline.run_sequence (StereoFrontend.process_chunk). Amortizes the
    # per-dispatch device-link latency; 1 = per-frame (the online shape).
    offline_chunk: int = 8

    @property
    def max_features(self) -> int:
        return self.grid_rows * self.grid_cols * self.max_features_per_cell


@dataclass(frozen=True)
class SolverConfig:
    """Nonlinear solver parameters (GTSAM LM defaults, batch.py:337)."""

    max_iterations: int = 100
    lambda_initial: float = 1e-5
    lambda_factor: float = 10.0
    lambda_upper_bound: float = 1e5
    # With damping_mode='diag', lambda is relative to the diagonal; values
    # below the Cholesky jitter (~1e-7 on the scaled system) change nothing
    # about the solve, and letting lambda dive to 1e-10+ just costs rejects
    # climbing back when a noise-corrupted step finally fails. 0 restores
    # the GTSAM default (no floor).
    lambda_lower_bound: float = 1e-7
    relative_error_tol: float = 1e-5
    absolute_error_tol: float = 1e-5
    error_tol: float = 0.0
    # 'schur'   — blocked Schur complement over landmarks (default)
    # 'dense'   — dense normal equations (small problems / tests)
    linear_solver: str = "schur"
    # Observation budget per landmark (caps the Schur group dimension K and
    # with it the M*K^2 correction tensor; observations beyond the cap are
    # dropped at graph build — standard BA budgeting).
    max_obs_per_landmark: int = 64
    # Reduced camera system solve: 'cholesky' (dense block), 'cg', or
    # 'banded' (solvers/banded.py — block-banded panelized factorization
    # for large N with bounded landmark track span; O(N P^2) memory vs the
    # dense path's O(N^2), which OOMs HBM near N=4000). 'banded' requires
    # band_width >= the max track span in frames
    # (solvers.banded.measure_band_width on the packed graph).
    reduced_solver: str = "cholesky"
    band_width: int = 0
    # Panel size (frames) for the banded factorization; 0 = auto (next
    # power of two >= max(band_width, 16), snapped down to the next
    # multiple of 32 above 64 — the measured per-step-overhead sweet spot,
    # solvers.banded.solve_schur_banded).
    banded_panel: int = 0
    # Frame-window width for the banded Schur-correction placement
    # one-hot (solvers.banded.measure_corr_window on the packed graph;
    # landmark interning follows first appearance so chunks are
    # trajectory-local). 0 = full-width placement (always safe); a
    # measured window cuts the placement FLOPs by ~N/window.
    banded_corr_window: int = 0
    # Refinement passes for the BANDED reduced solve (< 0 = use
    # refine_iters). The banded apply is two lax.scan sweeps over panels —
    # per-step-overhead-bound on TPU — so each refinement pass costs ~15 ms
    # at 4k poses, and the panelized Cholesky with Jacobi scaling needs
    # less cleanup than the one big dense factor: measured at the 4k
    # survey (TPU v5e), refine 2 -> 1 is 143 -> ~120 ms/iter at the same
    # outer iteration count and a LOWER final cost (6.30e4 -> 6.03e4 —
    # within the f32 accept/reject luck band), after r4 already measured
    # 4 -> 2 as free. One pass keeps the f32 residual cleanup; the lambda
    # floor, not refinement depth, limits the LM tail (CLAUDE.md).
    banded_refine_iters: int = 1
    # lax.scan unroll factor for the Thomas factor/apply sweeps (each scan
    # step costs ~50 us of loop overhead on TPU regardless of body size;
    # at 4k poses one banded solve runs ~6 sweeps of N/panel steps, so
    # unrolling trades compile time for a few ms/iteration: measured at
    # the 4k survey, unroll 1 -> 2 is ~120 -> ~115 ms/iter at equal cost.
    banded_unroll: int = 2
    # Eliminate the velocity chain (dense scaled Cholesky of the 3N
    # velocity block + one symmetric G^T G correction matmul) before the
    # reduced factorization: the big Cholesky shrinks from 9N+6 to 6N+6
    # (3.4x fewer FLOPs at N=1000, ~20% per-iteration wall time) and the
    # velocities get an exact refinement-free solve — measurably BETTER
    # convergence on small problems (17 vs 23 outer iters on the clean-
    # corner test). f64-locked equivalence with the full solve
    # (tests/test_solver.py). Ignored by the 'cg' reduced solver.
    eliminate_velocities: bool = True
    # LM damping matrix: 'diag' (Marquardt lambda*diag(H) — lambda is
    # dimensionless/scale-invariant, so reject-escalation bites immediately
    # against the ~1e6 normal-equation diagonal) or 'identity' (GTSAM's
    # lambda*I, reference batch.py:337 policy).
    damping_mode: str = "diag"
    # Cholesky-path linear-solve quality (see solvers.dense.scaled_cho_solve):
    # iterative-refinement passes and the PD-safety jitter on the Jacobi-
    # scaled system. Step quality along weakly-observable modes sets the LM
    # OUTER iteration count — (1e-6, 3) needs ~3x the outer iterations of
    # an accurate solve for a worse final error (tools/solver_lab.py).
    # With damping_mode='diag' the lambda floor itself keeps the scaled
    # diagonal at >= 1+1e-7 — exactly the PD margin the old standalone
    # 1e-7 jitter provided — so the jitter drops to a vestigial 1e-8 and
    # refinement only has f32 factorization rounding to clean up (4
    # passes; convergence measured equal to jitter 1e-7 + 10 passes on the
    # 200-pose lab problem and the 1k-pose bench, ~7 ms/iter cheaper on
    # v5e, tools/lm_trace.py). With damping_mode='identity' an absolute
    # lambda gives no relative PD protection, so the LM loop floors the
    # jitter at 1e-7 regardless of this setting.
    refine_iters: int = 4
    cholesky_jitter: float = 1e-8
    cg_max_iterations: int = 200
    cg_tol: float = 1e-8
    # Sanitizer (SURVEY.md §5): raise on NaN/Inf inside the jitted solve —
    # JAX's jax_debug_nans, enabled around run_solver.
    debug_nans: bool = False
    # Plateau stop: end LM after this many consecutive iterations whose
    # error change is within the progress band (plateau_rtol * error).
    # Near its f32 floor, LM either oscillates accept/reject on evaluation
    # noise or crawls along weakly-observable modes (curvature below the
    # f32 damping floor) — both make "progress" by GTSAM's relative test
    # forever while the estimate stops improving; strict GTSAM policy (0)
    # then burns tens of iterations. Informative rejects (error degraded
    # substantially => lambda escalating) neither count nor reset.
    plateau_patience: int = 5
    plateau_rtol: float = 5e-3
    # Hybrid-precision tail (solvers/polish.py): after the f32 TPU solve
    # converges, continue LM in float64 on the host CPU from the f32
    # solution. f32 assembly cannot represent weak-mode curvature (~1e-8
    # of the strong modes), leaving the pose estimate ~2-3x the f64
    # optimum's ATE away at the same error; a few f64 iterations close
    # that gap (tests/test_oracle_parity.py). O((6N)^3) f64 host cost —
    # opt-in, for offline quality runs.
    f64_polish: bool = False


@dataclass(frozen=True)
class TimeSyncConfig:
    """Approximate time synchronization (reference batch.py:325):
    queue 10, slop 0.2 s, allow_headerless."""

    slop: float = 0.2
    queue_size: int = 10
    # Keyframe pose source — the role of the reference's tf_fix.py node
    # (rebroadcast DVL dead-reckoned pose as world->base_link instead of the
    # bad ZED odometry, tf_fix.py:22-41) reduced to a config choice
    # (SURVEY.md C3): 'dvl' (default) or 'gt' (synthetic debugging).
    pose_source: str = "dvl"


@dataclass(frozen=True)
class EvalConfig:
    """Evaluation options (reference batch.py:362-367)."""

    # Magic z-datum shift applied to odometry before MSE (batch.py:363).
    # Eval-only; never enters the solver (SURVEY.md §7 'Gauge/datum').
    z_datum_shift: float = 0.7433


@dataclass(frozen=True)
class UslamConfig:
    camera: CameraConfig = field(default_factory=CameraConfig)
    imu: ImuConfig = field(default_factory=ImuConfig)
    noise: NoiseConfig = field(default_factory=NoiseConfig)
    pressure: PressureConfig = field(default_factory=PressureConfig)
    frontend: FrontendConfig = field(default_factory=FrontendConfig)
    solver: SolverConfig = field(default_factory=SolverConfig)
    timesync: TimeSyncConfig = field(default_factory=TimeSyncConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "UslamConfig":
        sub_types = {f.name: f.default_factory for f in dataclasses.fields(cls)}
        built = {}
        for k, v in d.items():
            if k not in sub_types:
                raise KeyError(f"Unknown config section {k!r}")
            klass = type(sub_types[k]())
            built[k] = _build_dataclass(klass, v) if isinstance(v, dict) else v
        return cls(**built)

    @classmethod
    def from_json(cls, path: str) -> "UslamConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def save_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    @classmethod
    def from_yaml(cls, path: str) -> "UslamConfig":
        """YAML config ingest — fills the role of the reference's
        calibration YAML (``zed_imu_camera_altered.yaml``, loaded by
        ``rosparam`` in launch/stereo.launch:5-6,16): the same section/key
        schema as ``from_json``, any subset of keys."""
        import yaml

        with open(path) as f:
            d = yaml.safe_load(f)
        return cls.from_dict(d or {})

    def save_yaml(self, path: str) -> None:
        import yaml

        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)


def _build_dataclass(klass, d: dict):
    fields = {f.name for f in dataclasses.fields(klass)}
    kwargs = {}
    for k, v in d.items():
        if k not in fields:
            raise KeyError(f"Unknown config key {klass.__name__}.{k}")
        kwargs[k] = tuple(v) if isinstance(v, list) else v
    return klass(**kwargs)


DEFAULT_CONFIG = UslamConfig()
