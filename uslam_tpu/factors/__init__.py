"""Factor residuals — whitened, pure, differentiable.

One module per factor family the reference graph contains
(reference batch.py:281-305):

- :mod:`priors`  — PriorFactorPose3 / PriorFactorVector / bias prior
- :mod:`imu`     — IMU preintegration (lax.scan) + ImuFactor residual
- :mod:`dvl`     — DVL body-frame velocity factor (the CustomFactor at
  batch.py:196-233, with *correct* Jacobians via AD — SURVEY.md §2.1)
- :mod:`stereo`  — GenericStereoFactor3D equivalent

Every residual is returned *whitened* (divided by sigma / multiplied by the
inverse sqrt covariance) so the solver can treat the problem as plain
nonlinear least squares: error = 0.5 * ||r||^2 — GTSAM's definition.
"""

from uslam_tpu.factors.imu import (  # noqa: F401
    ImuIntervalData,
    preintegrate,
    preintegrate_with_cov,
    imu_residual,
)
from uslam_tpu.factors.dvl import dvl_residual  # noqa: F401
from uslam_tpu.factors.stereo import stereo_residual  # noqa: F401
from uslam_tpu.factors.priors import (  # noqa: F401
    prior_pose_residual,
    prior_vel_residual,
    prior_bias_residual,
)
from uslam_tpu.factors.depth import pressure_to_depth, depth_residual  # noqa: F401
