"""Per-stage device-time budget of the fused online keyframe program.

The fused program (solvers.fixed_lag._fused_keyframe_step) is ONE compiled
program; this tool times its components as separate jitted programs on the
live backend to locate the latency budget behind the VERDICT r2
"online < 200 ms median" target:

  1. ORB pair front-end (_orb_pair_step)  — 2x1080p uint8 in-program
  2. window graph build (_device_window_graph: interning + rank grouping)
  3. LM window solve (optimize_lm, fixed iteration count)
  4. dropped-factor marginalization + PSD projection

Each stage runs REPS times with perturbed inputs (tunnel memoizes
bit-identical calls — CLAUDE.md trap b); reports median.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("STAGE_REPS", "5"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, *args, reps=REPS, perturb=None):
    """Median wall ms over reps; perturb(args, i) -> args varies inputs."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)  # compile + first dispatch
    times = []
    for i in range(reps):
        a = perturb(args, i) if perturb else args
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times)), out


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    log(f"platform={jax.default_backend()}")

    from uslam_tpu.config import UslamConfig
    from uslam_tpu.frontend.tracker import _orb_pair_step
    from uslam_tpu.graph.packing import PackedPytree
    from uslam_tpu.solvers.fixed_lag import (
        DeviceWindowRecord,
        DeviceWindowState,
        _device_window_graph,
        _marginal_information,
    )
    from uslam_tpu.solvers.lm import optimize_lm

    cfg = UslamConfig()
    fcfg = cfg.frontend
    W = int(os.environ.get("STAGE_WINDOW", "10"))
    Kf = fcfg.max_features
    S = 64
    rng = np.random.default_rng(0)
    H, Wd = 1080, 1920

    from uslam_tpu.geometry.camera import StereoCamera

    cam = StereoCamera.from_config(cfg.camera)
    kvec = np.asarray(
        [cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy], np.float32
    )

    # ---- stage 1: ORB pair ------------------------------------------------
    pair = rng.integers(0, 255, (2, H, Wd), dtype=np.uint8)
    desc = jnp.asarray(rng.integers(0, 2**32, (Kf, 8), dtype=np.uint64).astype(np.uint32))
    xy = jnp.asarray(rng.uniform(0, 1000, (Kf, 2)).astype(np.float32))
    mask = jnp.ones((Kf,), bool)
    rotvec = jnp.zeros(3, jnp.float32)

    orb = jax.jit(
        lambda p, d, x, m, rv: _orb_pair_step(p, d, x, m, fcfg, rv, kvec)
    )

    def perturb_pair(args, i):
        p = np.asarray(args[0])
        p = (p.astype(np.int32) + i + 1) % 256
        return (p.astype(np.uint8),) + args[1:]

    ms, orb_out = timed(orb, pair, desc, xy, mask, rotvec, perturb=perturb_pair)
    log(f"stage orb_pair      : {ms:7.1f} ms")

    # ---- build a representative window state -----------------------------
    def rand_state(seed):
        r = np.random.default_rng(seed)
        ids = np.arange(W * Kf, dtype=np.int32).reshape(W, Kf)
        # ~70% of slots valid, tracks shared across frames (realistic churn)
        ids = (ids % (3 * Kf)).astype(np.int32)
        fmask = (r.uniform(size=(W, Kf)) < 0.7).astype(np.float32)
        return DeviceWindowState(
            quat=np.tile(np.array([1, 0, 0, 0], np.float32), (W, 1)),
            trans=r.normal(size=(W, 3)).astype(np.float32),
            vel=r.normal(size=(W, 3)).astype(np.float32) * 0.1,
            bias=np.zeros(6, np.float32),
            imu=r.normal(size=(W, S, 7)).astype(np.float32) * 0.01,
            imu_whitener=np.tile(np.eye(9, dtype=np.float32), (W, 1, 1)),
            imu_valid=np.ones(W, np.float32),
            dvl=r.normal(size=(W, 3)).astype(np.float32) * 0.1,
            feat_ids=ids,
            feat_meas=r.uniform(100, 900, (W, Kf, 3)).astype(np.float32),
            feat_init=r.normal(size=(W, Kf, 3)).astype(np.float32) * 5,
            feat_mask=fmask,
            marg_sqrt_info=np.eye(15, dtype=np.float32),
            marg_quat=np.array([1, 0, 0, 0], np.float32),
            marg_trans=np.zeros(3, np.float32),
            marg_vel=np.zeros(3, np.float32),
            marg_bias=np.zeros(6, np.float32),
        )

    def rand_rec(seed):
        r = np.random.default_rng(100 + seed)
        return DeviceWindowRecord(
            quat=np.array([1, 0, 0, 0], np.float32),
            trans=r.normal(size=3).astype(np.float32),
            vel=np.zeros(3, np.float32),
            imu=r.normal(size=(S, 7)).astype(np.float32) * 0.01,
            imu_whitener=np.eye(9, dtype=np.float32),
            imu_valid=np.float32(1),
            dvl=np.zeros(3, np.float32),
            feat_ids=(np.arange(Kf, dtype=np.int32) % (3 * Kf)),
            feat_meas=r.uniform(100, 900, (Kf, 3)).astype(np.float32),
            feat_init=r.normal(size=(Kf, 3)).astype(np.float32) * 5,
            feat_mask=np.ones(Kf, np.float32),
        )

    st = jax.device_put(rand_state(0))
    rec = rand_rec(0)

    # ---- stage 2: window graph build (interning + rank grouping) ---------
    build = jax.jit(
        lambda s, pr: jax.tree_util.tree_map(
            lambda x: x, _device_window_graph(s, pr.unpack(), cfg)[:2]
        )
    )
    ms, built = timed(
        build, st, PackedPytree.pack(rand_rec(0)),
        perturb=lambda a, i: (a[0], PackedPytree.pack(rand_rec(i + 1))),
    )
    graph, initial = built
    log(f"stage graph_build   : {ms:7.1f} ms   (M={graph.stereo.lm_obs_idx.shape[0]}, F={graph.stereo.cam_idx.shape[0]})")

    # ---- stage 3: LM solve, fixed iteration count -------------------------
    n_it = int(os.environ.get("STAGE_ITERS", "11"))
    sc = dataclasses.replace(
        cfg.solver, max_iterations=n_it, plateau_patience=10_000
    )

    def lm_fn(g, ini):
        with jax.default_matmul_precision("highest"):
            return optimize_lm(
                g, ini, cam, cfg.noise.dvl_sigma, cfg.noise.stereo_sigma,
                cfg.imu.gravity, sc,
            )

    lm_j = jax.jit(lm_fn)

    def perturb_graph(args, i):
        g, ini = args
        ini2 = ini._replace(
            pose_trans=ini.pose_trans + np.float32(1e-3 * (i + 1))
        )
        return (g, ini2)

    ms, (vals, stats) = timed(lm_j, graph, initial, perturb=perturb_graph)
    log(
        f"stage lm_{n_it}iters    : {ms:7.1f} ms   "
        f"({ms / max(n_it, 1):5.1f} ms/iter, ran {int(stats.iterations)})"
    )

    # ---- stage 4: marginalization + PSD projection ------------------------
    def marg_fn(g, v):
        with jax.default_matmul_precision("highest"):
            Lam = _marginal_information(
                g, v, cam, cfg.noise.dvl_sigma, cfg.noise.stereo_sigma,
                cfg.imu.gravity,
            )
        w, V = jnp.linalg.eigh(0.5 * (Lam + Lam.T))
        return (V * jnp.sqrt(jnp.clip(w, 0.0, None))).T

    ms, _ = timed(
        jax.jit(marg_fn), graph, vals,
        perturb=lambda a, i: (a[0], a[1]._replace(
            pose_trans=a[1].pose_trans + np.float32(1e-3 * (i + 1)))),
    )
    log(f"stage marginalize   : {ms:7.1f} ms")

    # ---- reference point: one empty dispatch ------------------------------
    nop = jax.jit(lambda x: x + 1.0)
    ms, _ = timed(nop, jnp.float32(0.0), perturb=lambda a, i: (jnp.float32(i),))
    log(f"stage nop_dispatch  : {ms:7.1f} ms")


if __name__ == "__main__":
    main()
