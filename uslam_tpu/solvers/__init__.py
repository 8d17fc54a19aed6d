"""Nonlinear least-squares solvers.

Replaces GTSAM's ``LevenbergMarquardtOptimizer`` + SuiteSparse factorization
(reference batch.py:337) with:

- :mod:`linearize` — vmapped residuals + exact tangent Jacobians (AD)
- :mod:`dense`     — dense normal-equations Gauss-Newton (tests / small)
- :mod:`schur`     — blocked Schur complement over landmarks
- :mod:`lm`        — Levenberg-Marquardt outer loop (lax.while_loop)
- :mod:`fixed_lag` — sliding-window incremental smoother (working isam.py
  replacement)
"""

from uslam_tpu.solvers.linearize import (  # noqa: F401
    Linearization,
    linearize_graph,
    graph_error,
)
from uslam_tpu.solvers.dense import assemble_dense, solve_dense_gn  # noqa: F401
from uslam_tpu.solvers.schur import solve_schur  # noqa: F401
from uslam_tpu.solvers.lm import LMState, optimize_lm  # noqa: F401
from uslam_tpu.solvers.marginals import (  # noqa: F401
    MarginalCovariances,
    marginal_covariances,
    marginal_sigmas,
)
