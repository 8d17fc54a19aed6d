"""Evaluation, plotting and graph export.

Replaces the reference's end-of-run block (batch.py:345-367): trajectory
extraction, 3-D plot, MSE-vs-odometry (with the 0.7433 m z-datum shift as a
config option), plus ATE metrics the reference lacks and a Graphviz export
mirroring ``graph.saveGraph("graph.dot")`` (batch.py:338).
"""

from uslam_tpu.eval.metrics import (  # noqa: F401
    ate_rmse,
    mse_reference_compat,
    rpe_rmse,
    trajectory_from_values,
)
from uslam_tpu.eval.plot import plot_trajectory_3d  # noqa: F401
from uslam_tpu.eval.graphviz import graph_to_dot, save_graph_dot  # noqa: F401
