"""f64 exact-math check: band assembly == scatter assembly, Schur == dense.

Random (consistent) linearization data; in f64 any disagreement beyond
~1e-9 is a real bug, not rounding.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from uslam_tpu.graph.builder import StereoObservations
from uslam_tpu.graph.values import BIAS_DIM, FRAME_DIM
from uslam_tpu.solvers.bands import assemble_cam_bands, expand_cam_dense
from uslam_tpu.solvers.dense import (
    assemble_dense,
    assemble_dense_with_landmarks,
    scatter_g,
    scatter_H,
    solve_dense_gn,
)
from uslam_tpu.solvers.linearize import Linearization
from uslam_tpu.solvers.schur import solve_schur

rng = np.random.default_rng(0)
n, m, K = 7, 5, 4
F = m * K  # every landmark observed K times

cam_idx = rng.integers(1, n, F).astype(np.int32)
lm_idx = np.repeat(np.arange(m), K).astype(np.int32)
lm_obs_idx = np.arange(F, dtype=np.int32).reshape(m, K)
lm_obs_mask = np.ones((m, K))
# knock out a few observations (padding path)
mask = np.ones(F)
mask[3] = 0.0
mask[11] = 0.0
lm_obs_mask[0, 3] = 0.0
lm_obs_mask[2, 3] = 0.0

r3 = lambda *s: jnp.asarray(rng.normal(0, 1, s))

stereo_J_pose = r3(F, 3, 6) * mask[:, None, None]
stereo_J_lm = r3(F, 3, 3) * mask[:, None, None]
stereo_r = r3(F, 3) * mask[:, None]

lin = Linearization(
    prior_pose_r=r3(6), prior_pose_J=r3(6, 6),
    prior_vel_r=r3(3), prior_vel_J=r3(3, 3),
    prior_bias_r=r3(6), prior_bias_J=r3(6, 6),
    marg_r=r3(15), marg_J=r3(15, 15),
    imu_r=r3(n - 1, 9),
    imu_J_pose_i=r3(n - 1, 9, 6), imu_J_vel_i=r3(n - 1, 9, 3),
    imu_J_pose_j=r3(n - 1, 9, 6), imu_J_vel_j=r3(n - 1, 9, 3),
    imu_J_bias=r3(n - 1, 9, 6),
    dvl_r=r3(n, 3), dvl_J_pose=r3(n, 3, 6), dvl_J_vel=r3(n, 3, 3),
    stereo_r=stereo_r, stereo_J_pose=stereo_J_pose, stereo_J_lm=stereo_J_lm,
)
stereo = StereoObservations(
    cam_idx=jnp.asarray(cam_idx), lm_idx=jnp.asarray(lm_idx),
    meas=jnp.zeros((F, 3)), mask=jnp.asarray(mask),
    lm_obs_idx=jnp.asarray(lm_obs_idx), lm_obs_mask=jnp.asarray(lm_obs_mask),
)

lam = 0.37
Dc = FRAME_DIM * n + BIAS_DIM

# --- scatter reference: camera-only + stereo pose-diag + damping ---
from uslam_tpu.graph.values import POSE_DIM

H_cc, g_c, _ = assemble_dense(lin, n, 0, pose_major=True)
p_off = POSE_DIM * stereo.cam_idx
H_cc = scatter_H(H_cc, p_off, p_off, jnp.einsum("fda,fdb->fab", stereo_J_pose, stereo_J_pose))
g_c = scatter_g(g_c, p_off, -jnp.einsum("fda,fd->fa", stereo_J_pose, stereo_r))
H_ref = H_cc + (lam + 1e-8) * jnp.eye(Dc)

bands = assemble_cam_bands(lin, stereo, n, lam)
H_new, g_new = expand_cam_dense(bands)

print("H max abs diff:", float(jnp.abs(H_new - H_ref).max()))
print("g max abs diff:", float(jnp.abs(g_new - g_c).max()))
assert float(jnp.abs(H_new - H_ref).max()) < 1e-9
assert float(jnp.abs(g_new - g_c).max()) < 1e-9

# --- Schur vs dense full solve ---
H_full, g_full = assemble_dense_with_landmarks(lin, stereo.cam_idx, stereo.lm_idx, n, m)
# make it SPD enough
d_dense = solve_dense_gn(H_full, g_full, lam)
d_schur = solve_schur(lin, stereo, n, m, lam)
rel = float(jnp.linalg.norm(d_schur - d_dense) / jnp.linalg.norm(d_dense))
print("schur vs dense rel:", rel)
assert rel < 1e-7, rel
print("OK")
