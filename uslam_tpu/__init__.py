"""uslam_tpu — TPU-native stereo + DVL + IMU + pressure underwater visual SLAM.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
`hvak/visual-underwater-slam` stack (reference mounted at /root/reference):

- ORB visual front-end (FAST + Harris + orientation + rBRIEF + Hamming
  matching) as batched TPU kernels — replaces the external OpenCV
  `gtsam_vio/ImageProcessorNodelet` (reference launch/stereo.launch:33-47).
- Factor-graph back-end (priors, IMU preintegration, DVL velocity, stereo
  projection) with a Levenberg-Marquardt solver using a blocked Schur
  complement over landmarks — replaces GTSAM (reference batch.py:270-338).
- A working fixed-lag incremental smoother — replaces the broken isam.py.
- Time-synchronized sequence loader — replaces ROS bag ingest + the
  ApproximateTimeSynchronizer (reference batch.py:319-326).

Public API lives in :mod:`uslam_tpu.pipeline` and mirrors the reference's
``batch.py`` surface (reference batch.py:74-305).
"""

__version__ = "0.1.0"

from uslam_tpu.config import (  # noqa: F401
    CameraConfig,
    FrontendConfig,
    ImuConfig,
    NoiseConfig,
    SolverConfig,
    UslamConfig,
)


def __getattr__(name):
    # Lazy top-level conveniences (avoid importing jax-heavy modules on
    # bare `import uslam_tpu`).
    if name in ("AUVSlam", "run_sequence", "SlamResult"):
        from uslam_tpu import pipeline

        return getattr(pipeline, name)
    if name == "OnlineSlam":
        from uslam_tpu.online import OnlineSlam

        return OnlineSlam
    if name == "FixedLagSmoother":
        from uslam_tpu.solvers.fixed_lag import FixedLagSmoother

        return FixedLagSmoother
    raise AttributeError(name)
