"""Device-mesh sharding of the SLAM solve.

Scaling design (SURVEY.md §2.2): the only parallel axes this problem has
are frames (front-end, embarrassingly parallel) and landmarks (Schur
elimination). Here the LM linear-solve step is sharded over **landmarks**:

- every device holds the (small, replicated) camera-state arrays and the
  flat stereo linearization;
- the per-landmark observation groups (``lm_obs_idx``/``lm_obs_mask``) and
  the landmark estimates are sharded along the landmark axis;
- each device eliminates its landmark shard and produces a partial reduced
  camera Hessian/gradient; one ``psum`` over the mesh combines them
  (this psum is the entire "communication backend" — it rides ICI);
- the reduced solve is replicated (tiny next to elimination);
- landmark back-substitution happens shard-locally.

The reference has no distributed anything (single-host ROS pub/sub,
reference batch.py:319-326); this module is the TPU-native scaling story.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uslam_tpu.graph.builder import GraphArrays
from uslam_tpu.graph.values import LM_DIM, POSE_DIM, Values, values_retract
from uslam_tpu.solvers.bands import assemble_cam_bands, expand_cam_dense
from uslam_tpu.solvers.dense import scaled_cho_solve
from uslam_tpu.solvers.linearize import linearize_graph
from uslam_tpu.solvers.schur import landmark_elimination

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
    """Place arrays on the mesh: landmark-axis arrays sharded, rest replicated."""
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
    values = Values(
        pose_quat=jax.device_put(values.pose_quat, repl),
        pose_trans=jax.device_put(values.pose_trans, repl),
        vel=jax.device_put(values.vel, repl),
        bias=jax.device_put(values.bias, repl),
        landmarks=jax.device_put(values.landmarks, shard),
    )
    return graph, values


def sharded_lm_step(
    graph: GraphArrays,
    values: Values,
    cam,
    dvl_sigma: float,
    stereo_sigma: float,
    gravity: float,
    damping: float,
    mesh: Mesh,
    axis: str = "devices",
    refine_iters: int = 4,
    jitter: float = 1e-7,
    diag_damping: bool = False,
) -> Values:
    """One full Gauss-Newton/LM step (linearize -> landmark-sharded Schur ->
    replicated reduced solve -> shard-local back-substitution -> retract).

    This is the "training step" the multi-chip dry-run compiles: real
    landmark-axis sharding with psum/all_gather collectives.
    """
    n = values.num_poses

    # Everything the step needs, split into replicated vs landmark-sharded.
    graph_rep = GraphArrays(
        priors=graph.priors,
        imu=graph.imu,
        dvl=graph.dvl,
        stereo=graph.stereo._replace(
            # lm grouping travels separately (sharded); zero-size dummies here.
            lm_obs_idx=jnp.zeros((0,), jnp.int32),
            lm_obs_mask=jnp.zeros((0,), graph.stereo.lm_obs_mask.dtype),
        ),
    )

    def step(graph_rep, lm_obs_idx, lm_obs_mask, landmarks_shard, pq, pt, vel, bias):
        # Landmarks live sharded; the flat stereo linearization indexes
        # global landmark rows, so all-gather the (small) landmark table.
        lm_full = jax.lax.all_gather(landmarks_shard, axis, tiled=True)
        vals_full = Values(pq, pt, vel, bias, lm_full)
        lin = linearize_graph(graph_rep, vals_full, cam, dvl_sigma, stereo_sigma, gravity)

        pose_total = POSE_DIM * n
        m_loc = lm_obs_idx.shape[0]

        # ---- shard-local landmark elimination (scatter-free, shared with
        # the single-chip Schur solver) ----
        stereo_loc = graph_rep.stereo._replace(
            lm_obs_idx=lm_obs_idx, lm_obs_mask=lm_obs_mask
        )
        Hll_inv, g_l, U, V = landmark_elimination(
            lin, stereo_loc, n, damping, diag_damping
        )
        g_corr_local = U @ g_l.reshape(-1)                    # (6N,)
        H_corr_local = U @ V.T                                # (6N, 6N)

        # ---- the one collective: combine landmark-shard contributions ----
        H_corr = jax.lax.psum(H_corr_local, axis)
        g_corr = jax.lax.psum(g_corr_local, axis)

        # Camera part (replicated, pose-major, banded -> dense; includes
        # stereo pose-diagonal terms and damping on every diagonal).
        bands = assemble_cam_bands(lin, graph_rep.stereo, n, damping, diag_damping)
        H_red, g_red = expand_cam_dense(bands, pp_extra=-H_corr)
        g_red = jnp.concatenate(
            [g_red[:pose_total] - g_corr, g_red[pose_total:]]
        )
        delta_perm = scaled_cho_solve(H_red, g_red, refine_iters, jitter)

        # ---- shard-local back-substitution ----
        dpose = delta_perm[:pose_total]
        rhs = g_l - (V.T @ dpose).reshape(m_loc, LM_DIM)
        delta_l_local = jnp.einsum("mab,mb->ma", Hll_inv, rhs)
        delta_l = jax.lax.all_gather(delta_l_local, axis, tiled=True)

        # Permute camera delta back to interleaved frames.
        dvel = delta_perm[pose_total : pose_total + 3 * n].reshape(n, 3)
        frames = jnp.concatenate([dpose.reshape(n, POSE_DIM), dvel], axis=1)
        delta = jnp.concatenate(
            [frames.reshape(-1), delta_perm[pose_total + 3 * n :], delta_l.reshape(-1)]
        )
        return values_retract(vals_full, delta)

    spec_lm = P(axis)
    spec_rep = P()
    graph_rep_specs = jax.tree.map(lambda _: spec_rep, graph_rep)
    step_sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(
            graph_rep_specs, spec_lm, spec_lm, spec_lm,
            spec_rep, spec_rep, spec_rep, spec_rep,
        ),
        out_specs=Values(
            pose_quat=spec_rep, pose_trans=spec_rep, vel=spec_rep,
            bias=spec_rep, landmarks=spec_rep,
        ),
        # Outputs are replicated by construction (all_gather + replicated
        # solve); the varying-mesh-axes inference can't see that.
        check_vma=False,
    )
    return step_sharded(
        graph_rep,
        graph.stereo.lm_obs_idx,
        graph.stereo.lm_obs_mask,
        values.landmarks,
        values.pose_quat,
        values.pose_trans,
        values.vel,
        values.bias,
    )
