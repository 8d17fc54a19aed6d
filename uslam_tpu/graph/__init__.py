"""Factor graph as struct-of-arrays.

Replaces GTSAM ``NonlinearFactorGraph``/``Values``/symbol keys
(reference batch.py:26,270-305) with static-shape index arrays + stacked
measurements, so the whole graph linearizes/solves under one ``jit``.
"""

from uslam_tpu.graph.values import Values, values_retract, tangent_dim  # noqa: F401
from uslam_tpu.graph.builder import (  # noqa: F401
    GraphArrays,
    GraphBuilder,
    StereoObservations,
    ImuIntervals,
    DvlMeasurements,
    Priors,
)
