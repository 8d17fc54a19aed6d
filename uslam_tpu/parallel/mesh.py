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
from uslam_tpu.graph.values import BIAS_DIM, FRAME_DIM, LM_DIM, POSE_DIM, Values, values_retract
from uslam_tpu.solvers.dense import assemble_dense, scaled_cho_solve, scatter_H, scatter_g
from uslam_tpu.solvers.linearize import linearize_graph

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
) -> Values:
    """One full Gauss-Newton/LM step (linearize -> landmark-sharded Schur ->
    replicated reduced solve -> shard-local back-substitution -> retract).

    This is the "training step" the multi-chip dry-run compiles: real
    landmark-axis sharding with psum/all_gather collectives.
    """
    n = values.num_poses
    Dc = FRAME_DIM * n + BIAS_DIM

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

        lam = jnp.asarray(damping, lin.stereo_r.dtype)
        pose_total = POSE_DIM * n
        # Camera part in the pose-major layout (same as solve_schur).
        H_cc, g_c, _ = assemble_dense(lin, n, 0, pose_major=True)
        Jp, Jl, r = lin.stereo_J_pose, lin.stereo_J_lm, lin.stereo_r
        cam_idx = graph_rep.stereo.cam_idx
        p_off = POSE_DIM * cam_idx
        # Pose-diagonal stereo terms: identical on every device (replicated
        # flat arrays) — added outside the psum.
        H_cc = scatter_H(H_cc, p_off, p_off, jnp.einsum("fda,fdb->fab", Jp, Jp))
        g_c = scatter_g(g_c, p_off, -jnp.einsum("fda,fd->fa", Jp, r))

        # ---- shard-local landmark elimination (matmul formulation) ----
        m_loc = lm_obs_idx.shape[0]
        mask_b = lm_obs_mask[..., None, None]
        Jl_g = Jl[lm_obs_idx] * mask_b                        # (m_loc,K,3,3)
        r_g = r[lm_obs_idx] * lm_obs_mask[..., None]          # (m_loc,K,3)
        Hll = jnp.einsum("mkda,mkdb->mab", Jl_g, Jl_g)
        g_l = -jnp.einsum("mkda,mkd->ma", Jl_g, r_g)
        eye3 = jnp.eye(LM_DIM, dtype=r.dtype)
        Hll_inv = jnp.linalg.inv(Hll + (lam + 1e-8) * eye3)
        Wg = jnp.einsum("mkda,mkdb->mkab", Jp[lm_obs_idx] * mask_b, Jl_g)
        cam_g = cam_idx[lm_obs_idx]
        Y = jnp.einsum("mkab,mbc->mkac", Wg, Hll_inv)

        def stack_blocks(blocks):
            T = jnp.zeros((n, POSE_DIM, m_loc, LM_DIM), r.dtype)
            m_idx = jnp.broadcast_to(jnp.arange(m_loc)[:, None], cam_g.shape)
            T = T.at[cam_g, :, m_idx, :].add(blocks)
            return T.reshape(pose_total, m_loc * LM_DIM)

        U = stack_blocks(Y)
        V = stack_blocks(Wg)
        g_corr_local = U @ g_l.reshape(-1)                    # (6N,)
        H_corr_local = U @ V.T                                # (6N, 6N)

        # ---- the one collective: combine landmark-shard contributions ----
        H_corr = jax.lax.psum(H_corr_local, axis)
        g_corr = jax.lax.psum(g_corr_local, axis)
        H_red = H_cc.at[:pose_total, :pose_total].add(-H_corr)
        g_red = g_c.at[:pose_total].add(-g_corr)

        H_red = H_red + (lam + 1e-8) * jnp.eye(Dc, dtype=r.dtype)
        delta_perm = scaled_cho_solve(H_red, g_red)

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
