"""Levenberg-Marquardt outer loop as a ``lax.while_loop``.

Mirrors GTSAM's ``LevenbergMarquardtOptimizer`` policy with default params
(the exact configuration the reference runs at batch.py:337): lambda starts
at 1e-5, multiplies/divides by 10 on reject/accept, and convergence follows
GTSAM's ``checkConvergence`` (absolute decrease, relative decrease, or error
floor). The whole optimization — linearize, Schur solve, retract, evaluate —
is one compiled XLA program; no host round-trips per iteration.

A rejected step re-linearizes at the unchanged values; XLA's CSE cannot
remove that across loop iterations, but rejections are rare and
linearization is cheap next to the reduced solve.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from uslam_tpu.config import SolverConfig
from uslam_tpu.geometry.camera import StereoCamera
from uslam_tpu.graph.builder import GraphArrays
from uslam_tpu.graph.values import Values, values_retract
from uslam_tpu.solvers.dense import assemble_dense_with_landmarks, solve_dense_gn
from uslam_tpu.solvers.linearize import graph_error, linearize_graph
from uslam_tpu.solvers.schur import solve_schur


class LMState(NamedTuple):
    values: Values
    lin: object            # Linearization at `values` (reused on reject)
    error: jnp.ndarray
    lam: jnp.ndarray
    iterations: jnp.ndarray
    stall: jnp.ndarray     # consecutive iterations without meaningful decrease
    converged: jnp.ndarray


class LMStats(NamedTuple):
    initial_error: jnp.ndarray
    final_error: jnp.ndarray
    iterations: jnp.ndarray
    final_lambda: jnp.ndarray
    converged: jnp.ndarray


def optimize_lm(
    graph: GraphArrays,
    initial: Values,
    cam: StereoCamera,
    dvl_sigma: float,
    stereo_sigma: float,
    gravity: float,
    cfg: SolverConfig = SolverConfig(),
    huber_delta: float | None = None,
    axis_name: str | None = None,
) -> tuple[Values, LMStats]:
    """Run LM to convergence. Fully jittable (static shapes from the graph).

    ``axis_name``: set when called inside a ``shard_map`` whose landmark
    grouping (``graph.stereo.lm_obs_idx/mask``) is sharded over that mesh
    axis — the FULL production policy (velocity elimination, Marquardt
    damping, accept/reject while_loop, plateau stop) then runs with
    shard-local landmark elimination and psum/all_gather collectives (see
    ``uslam_tpu.parallel.mesh.sharded_optimize_lm``). Everything except
    the landmark grouping must be replicated.
    """
    n = initial.num_poses
    m = initial.num_landmarks
    if axis_name is not None and cfg.linear_solver != "schur":
        raise ValueError("sharded LM requires the schur linear solver")

    err_fn = partial(
        graph_error,
        graph,
        cam=cam,
        dvl_sigma=dvl_sigma,
        stereo_sigma=stereo_sigma,
        gravity=gravity,
        huber_delta=huber_delta,
    )
    lin_fn = partial(
        linearize_graph,
        graph,
        cam=cam,
        dvl_sigma=dvl_sigma,
        stereo_sigma=stereo_sigma,
        gravity=gravity,
        huber_delta=huber_delta,
    )

    use_schur = cfg.linear_solver == "schur"
    use_cg = cfg.reduced_solver == "cg"
    use_banded = cfg.reduced_solver == "banded"
    if use_banded and cfg.band_width <= 0:
        raise ValueError(
            "reduced_solver='banded' needs band_width >= the max track "
            "span (solvers.banded.measure_band_width)"
        )
    diag_damping = cfg.damping_mode == "diag"
    # Marquardt damping keeps the Jacobi-scaled diagonal at >= 1 + lambda
    # (lambda floored at lambda_lower_bound), which is itself the PD margin
    # f32 Cholesky needs — so the configured (vestigial) jitter is enough
    # ONLY while that floor holds. With the floor disabled
    # (lambda_lower_bound below ~1e-7, e.g. the GTSAM-default 0) or with
    # identity damping (an absolute lambda*I against a ~1e6 diagonal
    # provides no relative protection), restore the full 1e-7 PD jitter.
    floored_diag = (
        diag_damping
        and min(cfg.lambda_initial, cfg.lambda_lower_bound) >= 1e-7
    )
    jitter = cfg.cholesky_jitter if floored_diag else max(cfg.cholesky_jitter, 1e-7)

    def solve(lin, lam):
        if use_banded:
            from uslam_tpu.solvers.banded import solve_schur_banded

            return solve_schur_banded(
                lin,
                graph.stereo,
                n,
                m,
                lam,
                band_w=cfg.band_width,
                panel=cfg.banded_panel or None,
                refine_iters=(
                    cfg.banded_refine_iters
                    if cfg.banded_refine_iters >= 0
                    else cfg.refine_iters
                ),
                jitter=jitter,
                diag_damping=diag_damping,
                corr_window=cfg.banded_corr_window,
                axis_name=axis_name,
                unroll=cfg.banded_unroll,
            )
        if use_schur:
            return solve_schur(
                lin,
                graph.stereo,
                n,
                m,
                lam,
                cg=use_cg,
                cg_iters=cfg.cg_max_iterations,
                cg_tol=cfg.cg_tol,
                refine_iters=cfg.refine_iters,
                jitter=jitter,
                diag_damping=diag_damping,
                eliminate_velocities=cfg.eliminate_velocities,
                axis_name=axis_name,
            )
        H, g = assemble_dense_with_landmarks(
            lin, graph.stereo.cam_idx, graph.stereo.lm_idx, n, m
        )
        return solve_dense_gn(
            H, g, lam, refine_iters=cfg.refine_iters, jitter=jitter,
            diag_damping=diag_damping,
        )

    def step(state: LMState) -> LMState:
        # GTSAM inner-loop semantics: a rejected step re-solves at a larger
        # lambda with the SAME linearization (carried in the state); only an
        # accepted step re-linearizes.
        delta = solve(state.lin, state.lam)
        candidate = values_retract(state.values, delta)
        new_error = err_fn(values=candidate)
        # Guard NaN/Inf (divergence detection — SURVEY.md §5 failure handling).
        new_error = jnp.where(jnp.isfinite(new_error), new_error, jnp.inf)
        accept = new_error < state.error

        values = jax.tree.map(
            lambda new, old: jnp.where(accept, new, old), candidate, state.values
        )
        # lax.cond executes one branch: rejects skip the re-linearization.
        lin = jax.lax.cond(
            accept, lambda: lin_fn(values=values), lambda: state.lin
        )
        error = jnp.where(accept, new_error, state.error)
        lam = jnp.where(
            accept,
            jnp.maximum(state.lam / cfg.lambda_factor, cfg.lambda_lower_bound),
            state.lam * cfg.lambda_factor,
        )

        # GTSAM checkConvergence on accepted steps.
        decrease = jnp.abs(state.error - new_error)
        converged = accept & (
            (new_error <= cfg.error_tol)
            | (decrease <= cfg.absolute_error_tol)
            | (decrease <= cfg.relative_error_tol * state.error)
        )
        # Lambda blow-up => stuck; stop.
        converged = converged | (lam > cfg.lambda_upper_bound)
        # Plateau stop (optional): near its f32 floor LM either oscillates
        # accept/reject on evaluation noise or crawls along weakly-
        # observable modes (scaled curvature below the damping floor,
        # capturing ~15%/iteration) — both keep "meaningful" progress by
        # GTSAM's relative test forever while the estimate stops improving.
        # Count consecutive iterations whose error CHANGE is inside the
        # progress band (plateau_rtol, default 0.5%); a rejected step that
        # degraded the error substantially is informative (lambda too
        # small, escalating), so it neither counts nor resets.
        signed_decrease = state.error - new_error
        band = jnp.maximum(
            cfg.plateau_rtol * state.error, 10.0 * cfg.absolute_error_tol
        )
        fast = accept & (signed_decrease > band)
        slow = decrease <= band
        stall = jnp.where(
            fast, 0, jnp.where(slow, state.stall + 1, state.stall)
        )
        if cfg.plateau_patience > 0:
            converged = converged | (stall >= cfg.plateau_patience)
        return LMState(values, lin, error, lam, state.iterations + 1, stall, converged)

    def cond(state: LMState):
        return (state.iterations < cfg.max_iterations) & (~state.converged)

    init_error = err_fn(values=initial)
    state0 = LMState(
        values=initial,
        lin=lin_fn(values=initial),
        error=init_error,
        lam=jnp.asarray(cfg.lambda_initial, init_error.dtype),
        iterations=jnp.asarray(0),
        stall=jnp.asarray(0),
        converged=jnp.asarray(False),
    )
    final = jax.lax.while_loop(cond, step, state0)
    stats = LMStats(
        initial_error=init_error,
        final_error=final.error,
        iterations=final.iterations,
        final_lambda=final.lam,
        converged=final.converged,
    )
    return final.values, stats
