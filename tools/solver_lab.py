"""Offline lab for the reduced-camera linear solve.

Builds the 200-pose synthetic problem and, at each of the first few LM
linearization points, evaluates linear-solver VARIANTS by the metric that
matters: the ACTUAL nonlinear error after retracting the full step (camera
solve variant + landmark back-substitution). The trajectory itself advances
with the f64-exact reduced solve, so each iteration compares variants at
the same (good) linearization point.

Run: PYTHONPATH=. python tools/solver_lab.py
"""

from __future__ import annotations

import sys
from functools import partial

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from uslam_tpu.config import UslamConfig  # noqa: E402
from uslam_tpu.geometry.camera import StereoCamera  # noqa: E402
from uslam_tpu.graph.packing import pack_sequence  # noqa: E402
from uslam_tpu.graph.values import LM_DIM, POSE_DIM, values_retract  # noqa: E402
from uslam_tpu.io.synthetic import SyntheticSpec, generate_synthetic_sequence  # noqa: E402
from uslam_tpu.solvers.bands import assemble_cam_bands, expand_cam_dense  # noqa: E402
from uslam_tpu.solvers.linearize import graph_error, linearize_graph  # noqa: E402
from uslam_tpu.solvers.schur import landmark_elimination  # noqa: E402

N_ITERS = 8


def main() -> None:
    spec = SyntheticSpec(
        duration=40.0,
        keyframe_rate=5.0,
        num_landmarks=256,
        omega=0.15,
        odom_drift_rate=0.02,
        feature_noise_px=0.3,
        seed=0,
    )
    seq = generate_synthetic_sequence(spec)
    cfg = UslamConfig()
    graph, initial, _odom, _ = pack_sequence(seq, cfg)
    cam = StereoCamera.from_config(cfg.camera)
    n, m = initial.num_poses, initial.num_landmarks

    kw = dict(
        cam=cam,
        dvl_sigma=cfg.noise.dvl_sigma,
        stereo_sigma=cfg.noise.stereo_sigma,
        gravity=cfg.imu.gravity,
    )
    lin_fn = jax.jit(partial(linearize_graph, graph, **kw))
    err_fn = jax.jit(partial(graph_error, graph, **kw))
    retract = jax.jit(values_retract)

    @jax.jit
    def pieces(lin, lam):
        Hll_inv, g_l, U, V = landmark_elimination(lin, graph.stereo, n, lam)
        bands = assemble_cam_bands(lin, graph.stereo, n, lam)
        H_corr = jax.lax.dot_general(
            U, V, (((1,), (1,)), ((), ())), precision=jax.lax.Precision.HIGH
        )
        H_red, g_c_raw = expand_cam_dense(bands, pp_extra=-H_corr)
        g_c = jnp.concatenate(
            [g_c_raw[: POSE_DIM * n] - U @ g_l.reshape(-1), g_c_raw[POSE_DIM * n :]]
        )
        return H_red, g_c, Hll_inv, g_l, V

    def full_delta(delta_perm, Hll_inv, g_l, V):
        """numpy copy of solve_schur's back-substitution + layout permute."""
        dpose = delta_perm[: POSE_DIM * n]
        rhs = g_l - (V.T @ dpose).reshape(m, LM_DIM)
        delta_l = np.einsum("mab,mb->ma", Hll_inv, rhs)
        dvel = delta_perm[POSE_DIM * n : POSE_DIM * n + 3 * n].reshape(n, 3)
        frames = np.concatenate([dpose.reshape(n, POSE_DIM), dvel], axis=1)
        delta_c = np.concatenate([frames.reshape(-1), delta_perm[POSE_DIM * n + 3 * n :]])
        return np.concatenate([delta_c, delta_l.reshape(-1)]).astype(np.float32)

    # ------------------------------------------------------------ variants
    import scipy.linalg as sla

    def scaled(H, g, dtype):
        H = H.astype(dtype)
        g = g.astype(dtype)
        d = np.sqrt(np.maximum(np.diag(H), 1e-20)).astype(dtype)
        di = 1.0 / d
        return H * di[:, None] * di[None, :], g * di, di

    def chol_M(Hs, jit):
        L = np.linalg.cholesky(Hs + jit * np.eye(Hs.shape[0], dtype=Hs.dtype))
        return lambda b: sla.solve_triangular(
            L.T, sla.solve_triangular(L, b, lower=True), lower=False
        )

    def v_exact64(H, g, lam):
        Hs, bs, di = scaled(H, g, np.float64)
        x = np.linalg.solve(Hs + 1e-10 * np.eye(Hs.shape[0]), bs)
        return x * di

    def v_richardson(H, g, lam, iters, jit=1e-6):
        Hs, bs, di = scaled(H, g, np.float32)
        M = chol_M(Hs, np.float32(jit))
        x = M(bs)
        for _ in range(iters):
            x = x + M(bs - Hs @ x)
        return x * di

    def v_pcg(H, g, lam, iters, jit=1e-6, tj=2e-7):
        Hs, bs, di = scaled(H, g, np.float32)
        M = chol_M(Hs, np.float32(jit))
        A = lambda v: Hs @ v + np.float32(tj) * v  # noqa: E731
        x = M(bs)
        r = bs - A(x)
        z = M(r)
        p = z
        rz = float(r @ z)
        for _ in range(iters):
            Ap = A(p)
            pAp = float(p @ Ap)
            if pAp <= 1e-30 or rz <= 1e-30:
                break
            alpha = rz / pAp
            x = x + alpha * p
            r = r - alpha * Ap
            z = M(r)
            rz_new = float(r @ z)
            beta = rz_new / rz
            p = z + beta * p
            rz = rz_new
        return x * di

    variants = {
        "exact64": v_exact64,
        "rich3 (current)": lambda H, g, lam: v_richardson(H, g, lam, 3),
        "rich6 j2e-7": lambda H, g, lam: v_richardson(H, g, lam, 6, jit=2e-7),
        "rich10 j2e-7": lambda H, g, lam: v_richardson(H, g, lam, 10, jit=2e-7),
        "rich10 j1e-7": lambda H, g, lam: v_richardson(H, g, lam, 10, jit=1e-7),
        "rich16 j1e-7": lambda H, g, lam: v_richardson(H, g, lam, 16, jit=1e-7),
        "pcg10 tj1e-7 j1e-7": lambda H, g, lam: v_pcg(H, g, lam, 10, jit=1e-7, tj=1e-7),
    }

    def run_lm(name, fn, max_iters=50, rtol=1e-5, plateau=3):
        """Full LM trajectory driven by this variant (GTSAM lambda policy)."""
        values = initial
        error = float(err_fn(values))
        lam = 1e-5
        stall = accepts = rejects = 0
        for it in range(max_iters):
            lin = lin_fn(values)
            H, g, Hll_inv, g_l, V = map(np.asarray, pieces(lin, lam))
            dp = fn(H, g, lam).astype(np.float32)
            delta = full_delta(dp, Hll_inv, g_l, V)
            cand = retract(values, jnp.asarray(delta))
            new_error = float(err_fn(cand))
            if np.isfinite(new_error) and new_error < error:
                accepts += 1
                decrease = error - new_error
                meaningful = decrease > rtol * error
                values, error = cand, new_error
                lam = lam / 10.0
                stall = 0 if meaningful else stall + 1
                if decrease <= 1e-5 or decrease <= rtol * error:
                    break
            else:
                rejects += 1
                lam *= 10.0
                stall += 1
            if stall >= plateau or lam > 1e5:
                break
        print(
            f"{name:22s} iters {it+1:3d} (acc {accepts}, rej {rejects}) "
            f"final {error:.6e}"
        )
        return values

    print(f"init error {float(err_fn(initial)):.6e}", file=sys.stderr)
    with jax.default_matmul_precision("highest"):
        for name, fn in variants.items():
            run_lm(name, fn)


if __name__ == "__main__":
    main()
