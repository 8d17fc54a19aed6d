"""Host-driven LM iteration tracer for damping-policy experiments.

Runs the SAME linearize / Schur-solve / error primitives as the production
``optimize_lm`` while_loop, but with the outer loop in Python so each
iteration's (error, lambda, accept, gain ratio) can be logged and different
lambda-update policies compared WITHOUT recompiling the fused LM program.

Usage:
    python tools/lm_trace.py --poses 200 --policy gtsam
    python tools/lm_trace.py --poses 200 --policy nielsen
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from uslam_tpu.config import SolverConfig, UslamConfig  # noqa: E402
from uslam_tpu.geometry.camera import StereoCamera  # noqa: E402
from uslam_tpu.graph.packing import pack_sequence  # noqa: E402
from uslam_tpu.graph.values import values_retract  # noqa: E402
from uslam_tpu.io.synthetic import SyntheticSpec, generate_synthetic_sequence  # noqa: E402
from uslam_tpu.solvers.linearize import graph_error, linearize_graph  # noqa: E402
from uslam_tpu.solvers.schur import solve_schur  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=200)
    ap.add_argument("--landmarks", type=int, default=256)
    ap.add_argument("--drift", type=float, default=0.02)
    ap.add_argument("--noise", type=float, default=0.3)
    ap.add_argument("--omega", type=float, default=0.15)
    ap.add_argument("--policy", default="gtsam", choices=["gtsam", "nielsen"])
    ap.add_argument("--lambda-initial", type=float, default=1e-5)
    ap.add_argument("--max-iters", type=int, default=60)
    ap.add_argument("--plateau", type=int, default=3)
    ap.add_argument("--rtol", type=float, default=1e-5)
    ap.add_argument("--refine", type=int, default=10)
    ap.add_argument("--jitter", type=float, default=1e-7)
    ap.add_argument("--identity-damping", action="store_true")
    ap.add_argument("--trajectory", default="orbit", choices=["orbit", "survey"])
    ap.add_argument("--max-feature-depth", type=float, default=None)
    ap.add_argument("--lam-min", type=float, default=1e-7)
    ap.add_argument("--f64", action="store_true")
    ap.add_argument(
        "--exact",
        action="store_true",
        help="solve the FULL dense normal equations in numpy (no jitter, no "
        "Schur) to isolate linear-solve quality from model nonlinearity",
    )
    args = ap.parse_args()
    if args.f64:
        jax.config.update("jax_enable_x64", True)

    keyframe_rate = 5.0
    extra = {}
    if args.max_feature_depth is not None:
        extra["max_feature_depth"] = args.max_feature_depth
    spec = SyntheticSpec(
        trajectory=args.trajectory,
        duration=args.poses / keyframe_rate,
        keyframe_rate=keyframe_rate,
        num_landmarks=args.landmarks,
        omega=args.omega,
        odom_drift_rate=args.drift,
        feature_noise_px=args.noise,
        seed=0,
        **extra,
    )
    seq = generate_synthetic_sequence(spec)
    cfg = UslamConfig()
    graph, initial, _odom, _ = pack_sequence(
        seq, cfg, dtype=jnp.float64 if args.f64 else jnp.float32
    )
    cam = StereoCamera.from_config(cfg.camera)
    n, m = initial.num_poses, initial.num_landmarks
    print(f"graph: {n} poses, {m} landmarks", file=sys.stderr)

    kw = dict(
        cam=cam,
        dvl_sigma=cfg.noise.dvl_sigma,
        stereo_sigma=cfg.noise.stereo_sigma,
        gravity=cfg.imu.gravity,
    )
    err_fn = jax.jit(partial(graph_error, graph, **kw))
    lin_fn = jax.jit(partial(linearize_graph, graph, **kw))

    if args.exact:
        from uslam_tpu.solvers.dense import assemble_dense_with_landmarks

        assemble = jax.jit(
            partial(
                assemble_dense_with_landmarks,
                cam_idx=graph.stereo.cam_idx,
                lm_idx=graph.stereo.lm_idx,
                num_poses=n,
                num_landmarks=m,
            )
        )

        def solve_fn(lin, lam):
            H, g = assemble(lin)
            H = np.asarray(H, np.float64)
            g = np.asarray(g, np.float64)
            H = H + (lam + 1e-12) * np.eye(H.shape[0])
            delta = np.linalg.solve(H, g)
            return jnp.asarray(delta, jnp.float64 if args.f64 else jnp.float32), g @ delta
    else:
        @jax.jit
        def solve_fn(lin, lam):
            return solve_schur(
                lin, graph.stereo, n, m, lam, return_aux=True,
                refine_iters=args.refine, jitter=args.jitter,
                diag_damping=not args.identity_damping,
            )

    retract = jax.jit(values_retract)

    with jax.default_matmul_precision("highest"):
        t0 = time.perf_counter()
        values = initial
        error = float(err_fn(values))
        lin = lin_fn(values)
        lam = args.lambda_initial
        nu = 10.0 if args.policy == "gtsam" else 2.0
        print(f"init error {error:.6e}  (compile {time.perf_counter()-t0:.1f}s)",
              file=sys.stderr)

        stall = 0
        accepts = rejects = 0
        diag_h = None
        if not args.identity_damping and not args.exact:
            # Marquardt damping: the predicted decrease is
            # 0.5 (g.delta + lam * delta^T diag(H) delta), NOT lam ||delta||^2
            # — against a ~1e6 diagonal the identity formula misscales rho by
            # orders of magnitude (and the Nielsen policy consumes rho).
            # diag(H) is fixed per linearization; the dense assembly is
            # affordable at tool scale on CPU.
            from uslam_tpu.solvers.dense import assemble_dense_with_landmarks

            diag_fn = jax.jit(
                lambda l: jnp.diag(
                    assemble_dense_with_landmarks(
                        l, graph.stereo.cam_idx, graph.stereo.lm_idx, n, m
                    )[0]
                )
            )

        for it in range(args.max_iters):
            delta, g_dot = solve_fn(lin, lam)
            if diag_h is None and not args.identity_damping and not args.exact:
                diag_h = diag_fn(lin)
            if args.identity_damping or args.exact:
                damp_term = lam * float(jnp.sum(delta**2))
            else:
                damp_term = lam * float(jnp.sum(diag_h * delta**2))
            pred = 0.5 * (float(g_dot) + damp_term)
            candidate = retract(values, delta)
            new_error = float(err_fn(candidate))
            if not np.isfinite(new_error):
                new_error = np.inf
            accept = new_error < error
            rho = (error - new_error) / max(pred, 1e-30)
            print(
                f"it {it:3d} lam {lam:9.3e} err {error:.6e} -> {new_error:.6e} "
                f"rho {rho:8.3f} {'ACC' if accept else 'rej'}"
            )
            decrease = abs(error - new_error)
            band = 10.0 * max(args.rtol * error, 1e-5)
            at_floor = decrease <= band
            if accept:
                accepts += 1
                meaningful = (error - new_error) > args.rtol * error
                converged = (
                    decrease <= 1e-5 or decrease <= args.rtol * error
                )
                values, error = candidate, new_error
                lin = lin_fn(values)
                diag_h = None      # diag(H) is per-linearization
                if args.policy == "gtsam":
                    lam = max(lam / 10.0, args.lam_min)
                    nu = 10.0
                else:
                    lam = max(
                        lam * max(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3),
                        args.lam_min,
                    )
                    nu = 2.0
                stall = 0 if meaningful else (stall + 1 if at_floor else stall)
                if converged:
                    print(f"converged (GTSAM test) after {it+1} iters")
                    break
            else:
                rejects += 1
                if args.policy == "gtsam":
                    # Escalating factor: 10, 100, 1000... consecutive rejects
                    # cross the ~12-decade effective-lambda range in a few
                    # steps instead of ~12.
                    lam = lam * nu
                    nu *= 10.0
                else:
                    lam = lam * nu
                    nu *= 2.0
                if at_floor:
                    stall += 1
            if args.plateau and stall >= args.plateau:
                print(f"plateau stop after {it+1} iters")
                break
            if lam > 1e5:
                print(f"lambda blow-up after {it+1} iters")
                break

        from uslam_tpu.eval.metrics import ate_rmse

        n_gt = min(n, len(seq.gt_pos))
        init_ate = ate_rmse(np.asarray(initial.pose_trans)[:n_gt], seq.gt_pos[:n_gt])
        final_ate = ate_rmse(np.asarray(values.pose_trans)[:n_gt], seq.gt_pos[:n_gt])
        print(
            f"final error {error:.6e}  iters {it+1} "
            f"(accepts {accepts}, rejects {rejects})  "
            f"ATE {init_ate:.4f} -> {final_ate:.4f}"
        )


if __name__ == "__main__":
    main()
