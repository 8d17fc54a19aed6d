"""Device-mesh sharding of the SLAM solve.

Scaling design (SURVEY.md §2.2): the only parallel axes this problem has
are frames (front-end, embarrassingly parallel) and landmarks (Schur
elimination). Here the solve is sharded over **landmarks**:

- every device holds the (small, replicated) camera-state arrays and the
  flat stereo linearization;
- the per-landmark observation groups (``lm_obs_idx``/``lm_obs_mask``) are
  sharded along the landmark axis;
- each device eliminates its landmark shard and produces a partial reduced
  camera Hessian/gradient; one ``psum`` over the mesh combines them
  (this psum is the entire "communication backend" — it rides ICI);
- the reduced solve is replicated (tiny next to elimination);
- landmark back-substitution is shard-local, with one ``all_gather`` of
  the landmark delta.

The collectives live inside :func:`uslam_tpu.solvers.schur.solve_schur`
and :func:`uslam_tpu.solvers.banded.solve_schur_banded`
(``axis_name=...``), so the sharded path IS the production solver — the
full LM policy (velocity elimination, Marquardt diag damping, the
accept/reject ``lax.while_loop``, plateau stop) runs unmodified via
:func:`sharded_optimize_lm`, with either reduced solver
(``SolverConfig.reduced_solver``: dense Cholesky or the banded
large-N factorization).

The reference has no distributed anything (single-host ROS pub/sub,
reference batch.py:319-326); this module is the TPU-native scaling story.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uslam_tpu.config import SolverConfig
from uslam_tpu.graph.builder import GraphArrays
from uslam_tpu.graph.values import Values, values_retract
from uslam_tpu.solvers.linearize import linearize_graph
from uslam_tpu.solvers.lm import LMStats, optimize_lm
from uslam_tpu.solvers.schur import solve_schur

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_mesh(n_devices: int | None = None, axis: str = "devices") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_landmarks(graph: GraphArrays, values: Values, mesh: Mesh, axis: str = "devices"):
    """Place arrays on the mesh: landmark-grouping arrays sharded, rest
    replicated. (Landmark *estimates* stay replicated — they are tiny and
    the flat stereo linearization indexes the full table.)"""
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))
    stereo = graph.stereo._replace(
        cam_idx=jax.device_put(graph.stereo.cam_idx, repl),
        lm_idx=jax.device_put(graph.stereo.lm_idx, repl),
        meas=jax.device_put(graph.stereo.meas, repl),
        mask=jax.device_put(graph.stereo.mask, repl),
        lm_obs_idx=jax.device_put(graph.stereo.lm_obs_idx, shard),
        lm_obs_mask=jax.device_put(graph.stereo.lm_obs_mask, shard),
    )
    graph = GraphArrays(
        priors=jax.device_put(graph.priors, repl),
        imu=jax.device_put(graph.imu, repl),
        dvl=jax.device_put(graph.dvl, repl),
        stereo=stereo,
    )
    values = jax.device_put(values, repl)
    return graph, values


def _split_graph(graph: GraphArrays):
    """(replicated graph skeleton, lm_obs_idx, lm_obs_mask)."""
    skel = GraphArrays(
        priors=graph.priors,
        imu=graph.imu,
        dvl=graph.dvl,
        stereo=graph.stereo._replace(
            lm_obs_idx=jnp.zeros((0,), graph.stereo.lm_obs_idx.dtype),
            lm_obs_mask=jnp.zeros((0,), graph.stereo.lm_obs_mask.dtype),
        ),
    )
    return skel, graph.stereo.lm_obs_idx, graph.stereo.lm_obs_mask


def sharded_optimize_lm(
    graph: GraphArrays,
    initial: Values,
    cam,
    dvl_sigma: float,
    stereo_sigma: float,
    gravity: float,
    mesh: Mesh,
    cfg: SolverConfig = SolverConfig(),
    huber_delta: float | None = None,
    axis: str = "devices",
) -> tuple[Values, LMStats]:
    """The PRODUCTION LM solve (solvers.lm.optimize_lm — velocity
    elimination, Marquardt diag damping, full accept/reject while_loop,
    plateau stop), landmark-sharded over the mesh.

    Semantically identical to the single-chip ``optimize_lm`` up to f32
    reduction-order rounding; tests/test_parallel.py pins the two together
    at solver-noise tolerance.
    """
    if initial.num_landmarks % mesh.devices.size != 0:
        raise ValueError(
            f"num_landmarks {initial.num_landmarks} must divide the mesh "
            f"size {mesh.devices.size} (builder buckets to powers of two)"
        )
    skel, lm_obs_idx, lm_obs_mask = _split_graph(graph)

    def run(skel, lm_obs_idx, lm_obs_mask, initial):
        g = skel._replace(
            stereo=skel.stereo._replace(
                lm_obs_idx=lm_obs_idx, lm_obs_mask=lm_obs_mask
            )
        )
        return optimize_lm(
            g, initial, cam, dvl_sigma, stereo_sigma, gravity,
            cfg=cfg, huber_delta=huber_delta, axis_name=axis,
        )

    spec_lm = P(axis)
    spec_rep = P()
    run_sharded = shard_map(
        run,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: spec_rep, skel),
            spec_lm,
            spec_lm,
            jax.tree.map(lambda _: spec_rep, initial),
        ),
        out_specs=(
            jax.tree.map(lambda _: spec_rep, initial),
            LMStats(spec_rep, spec_rep, spec_rep, spec_rep, spec_rep),
        ),
        # Outputs are replicated by construction (the reduced solve runs on
        # psum'd inputs and the landmark delta is all_gathered); the
        # varying-mesh-axes inference can't see that.
        check_vma=False,
    )
    return run_sharded(skel, lm_obs_idx, lm_obs_mask, initial)


def sharded_lm_step(
    graph: GraphArrays,
    values: Values,
    cam,
    dvl_sigma: float,
    stereo_sigma: float,
    gravity: float,
    damping,
    mesh: Mesh,
    axis: str = "devices",
    refine_iters: int = 4,
    jitter: float = 1e-7,
    diag_damping: bool = True,
    eliminate_velocities: bool = True,
) -> Values:
    """One fixed-lambda Gauss-Newton/LM step, landmark-sharded.

    Thin wrapper over the production linear solver
    (``solve_schur(axis_name=...)``) — same defaults as production
    (velocity elimination + Marquardt diag damping). Useful as a cheap
    compile probe; the full solve is :func:`sharded_optimize_lm`.
    """
    n = values.num_poses
    skel, lm_obs_idx, lm_obs_mask = _split_graph(graph)

    def step(skel, lm_obs_idx, lm_obs_mask, values):
        g = skel._replace(
            stereo=skel.stereo._replace(
                lm_obs_idx=lm_obs_idx, lm_obs_mask=lm_obs_mask
            )
        )
        lin = linearize_graph(g, values, cam, dvl_sigma, stereo_sigma, gravity)
        delta = solve_schur(
            lin, g.stereo, n, values.num_landmarks, damping,
            refine_iters=refine_iters, jitter=jitter,
            diag_damping=diag_damping,
            eliminate_velocities=eliminate_velocities,
            axis_name=axis,
        )
        return values_retract(values, delta)

    spec_lm = P(axis)
    spec_rep = P()
    step_sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: spec_rep, skel),
            spec_lm,
            spec_lm,
            jax.tree.map(lambda _: spec_rep, values),
        ),
        out_specs=jax.tree.map(lambda _: spec_rep, values),
        check_vma=False,
    )
    return step_sharded(skel, lm_obs_idx, lm_obs_mask, values)
