"""Hybrid-precision tail solve: f64 LM polish on the host CPU.

The TPU production path runs f32 end to end. That hits an accuracy wall
the *error* can't see: weakly-observable modes (long-wavelength trajectory
bends, global yaw) have curvature ~1e-8 of the strong modes, below what an
f32 ``J^T J`` assembly can represent — the optimizer reaches its f32 error
floor while the pose estimate still sits ~2-3x the f64-exact optimum's ATE
away (tests/test_oracle_parity.py measures this directly). No amount of
f32 iteration or refinement recovers information destroyed at assembly.

The fix mirrors what the reference stack gets for free (GTSAM runs f64 on
CPU, reference batch.py:337): after the f32 TPU solve converges, continue
the SAME optimization in float64 on the host CPU, starting from the f32
solution. Starting near the optimum it needs only a handful of iterations,
and the loop is host-driven (separately jitted linearize/solve/error) so
there is no giant while_loop compile.

Cost scales as the reduced Cholesky, O((6N)^3) in f64 on host — seconds at
hundreds of poses, tens of seconds at 1k. It is opt-in
(``SolverConfig.f64_polish``), aimed at offline/batch quality runs; the
real-time TPU path stays pure f32.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from uslam_tpu.config import SolverConfig
from uslam_tpu.graph.values import Values, values_retract
from uslam_tpu.solvers.linearize import graph_error, linearize_graph
from uslam_tpu.solvers.schur import solve_schur


def _to_dtype(tree, dtype):
    return jax.tree.map(
        lambda x: jnp.asarray(x, dtype) if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else jnp.asarray(x),
        tree,
    )


def polish_f64(
    graph,
    values: Values,
    cam,
    dvl_sigma: float,
    stereo_sigma: float,
    gravity: float,
    cfg: SolverConfig = SolverConfig(),
    max_iters: int = 12,
    huber_delta: float | None = None,
) -> tuple[Values, dict]:
    """Continue LM in f64 on the host CPU from an f32 solution.

    ``graph`` may be f32 (it is promoted); ``values`` is the converged f32
    estimate. Returns (f64 Values, info dict with iterations/errors).

    Runs entirely on the CPU device so the TPU (possibly a high-latency
    tunnel) is never touched, under ``jax.enable_x64``.
    """
    cpu = jax.devices("cpu")[0]
    with jax.enable_x64():
        graph64 = jax.device_put(_to_dtype(graph, jnp.float64), cpu)
        vals = jax.device_put(_to_dtype(values, jnp.float64), cpu)
        n, m = values.num_poses, values.num_landmarks

        kw = dict(
            cam=cam, dvl_sigma=dvl_sigma, stereo_sigma=stereo_sigma,
            gravity=gravity, huber_delta=huber_delta,
        )
        err_fn = jax.jit(partial(graph_error, graph64, **kw))
        lin_fn = jax.jit(partial(linearize_graph, graph64, **kw))
        if cfg.reduced_solver == "banded" and cfg.band_width > 0:
            # Banded reduced solve in f64: keeps the polish O(N P^2) at
            # survey scale where the dense path's O((6N)^3) host cost
            # would dominate (banded==dense is f64-locked in
            # tests/test_banded.py, so this changes nothing but cost).
            from uslam_tpu.solvers.banded import solve_schur_banded

            solve_fn = jax.jit(
                lambda lin, lam: solve_schur_banded(
                    lin, graph64.stereo, n, m, lam,
                    band_w=cfg.band_width,
                    panel=cfg.banded_panel or None,
                    refine_iters=2, jitter=1e-12,
                    diag_damping=cfg.damping_mode == "diag",
                    corr_window=cfg.banded_corr_window,
                )
            )
        else:
            solve_fn = jax.jit(
                lambda lin, lam: solve_schur(
                    lin, graph64.stereo, n, m, lam,
                    # f64: rounding-level jitter, light refinement.
                    refine_iters=2, jitter=1e-12,
                    diag_damping=cfg.damping_mode == "diag",
                    eliminate_velocities=cfg.eliminate_velocities,
                )
            )
        retract = jax.jit(values_retract)

        error0 = error = float(err_fn(vals))
        lam, nu = 1e-7, 10.0
        iters = 0
        lin = lin_fn(vals)
        for _ in range(max_iters):
            delta = solve_fn(lin, lam)
            candidate = retract(vals, delta)
            new_error = float(err_fn(candidate))
            iters += 1
            if np.isfinite(new_error) and new_error < error:
                decrease = error - new_error
                vals, error = candidate, new_error
                lin = lin_fn(vals)
                lam, nu = max(lam / 10.0, 1e-12), 10.0
                if decrease <= 1e-9 or decrease <= 1e-7 * error:
                    break
            else:
                lam, nu = max(lam, 1e-10) * nu, nu * 10.0
                if lam > 1e6:
                    break
        info = {
            "polish_iterations": iters,
            "polish_initial_error": error0,
            "polish_final_error": error,
        }
        return vals, info
