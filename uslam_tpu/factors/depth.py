"""Depth from pressure.

The reference converts the JSON pressure message to depth
(reference batch.py:122-126):

    depth = (press_abs_mbar * 100 - 98250) / (997 * 9.81)

and substitutes that depth for the z of the DVL pose used as the initial
estimate (batch.py:133). It never adds a depth *factor*; we expose one as an
optional extension (a unary prior on pose z) for pipelines that want the
pressure sensor in the graph rather than only in the initialization.
"""

from __future__ import annotations

import jax.numpy as jnp

from uslam_tpu.config import PressureConfig
from uslam_tpu.geometry.se3 import Pose3


def pressure_to_depth(press_abs_mbar, cfg: PressureConfig = PressureConfig()):
    """Pure, jit-friendly version of reference batch.py:122-126."""
    pressure_pa = press_abs_mbar * 100.0
    return (pressure_pa - cfg.atm_pressure_pa) / (cfg.water_density * cfg.gravity)


def depth_residual(pose: Pose3, depth_meas, sigma: float) -> jnp.ndarray:
    """Whitened 1-dim residual on the pose z coordinate.

    Convention: depth measured positive-down equals -z in the world frame is
    NOT assumed — the reference treats the converted value directly as z
    (batch.py:133), so we do too.
    """
    return jnp.atleast_1d((pose.trans[..., 2] - depth_meas) / sigma)
