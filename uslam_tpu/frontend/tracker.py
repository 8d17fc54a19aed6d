"""Stereo front-end with persistent track ids.

The full replacement for the ``ImageProcessorNodelet`` pipeline
(launch/stereo.launch:33-54): per stereo pair — ORB extraction on both
images, left<->right stereo matching, left<->previous-left temporal matching
for persistent ids, translation-RANSAC outlier rejection (the nodelet's
2-pt RANSAC with 3 px threshold, stereo.launch:46) — and emits feature
frames in the nodelet's output contract: normalized [-1, 1] coordinates
with persistent integer ids (consumed via de-normalization at
reference batch.py:152-154).

The compute path (extract/match/ransac) is jit; only the id interning is
host-side Python (inherently sequential, trivial cost).
"""

from __future__ import annotations

from functools import partial as _partial

import jax
import jax.numpy as jnp
import numpy as np

from uslam_tpu.config import CameraConfig, FrontendConfig
from uslam_tpu.frontend.match import match_descriptors, stereo_match
from uslam_tpu.frontend.orb import Keypoints, extract_orb
from uslam_tpu.frontend.pallas_kernels import resolve_pallas
from uslam_tpu.io.sequence import FeatureFrame


def integrate_gyro_rotvec(gyro: np.ndarray, dt) -> np.ndarray:
    """Integrate body rates (S, 3) over steps ``dt`` (scalar or (S,)) to a
    single rotation vector (3,) — the camera rotation between two frames.

    Host-side numpy (tiny, per-keyframe): composes the per-sample
    exponentials properly so large inter-frame yaw doesn't suffer
    small-angle commutation error.
    """
    from scipy.spatial.transform import Rotation

    gyro = np.asarray(gyro, np.float64).reshape(-1, 3)
    if gyro.size == 0:
        return np.zeros(3)
    dt = np.broadcast_to(np.asarray(dt, np.float64), (len(gyro),))
    R = Rotation.identity()
    for w, h in zip(gyro, dt):
        R = R * Rotation.from_rotvec(w * h)
    return R.as_rotvec()


def rotation_warp(xy: jnp.ndarray, rel_rotvec: jnp.ndarray, kvec: jnp.ndarray):
    """Warp pixel coordinates through the pure-rotation (infinite-depth)
    homography K R^T K^-1 — where the previous frame's keypoints land in
    the current frame if the camera only rotated.

    ``rel_rotvec``: body rotation prev->cur (camera frame == IMU frame for
    the ZED-mini's integrated IMU); for a world point,
    p_cam_cur = (DeltaR)^T p_cam_prev. ``kvec`` = [fx, fy, cx, cy].
    """
    from uslam_tpu.geometry.so3 import quat_rotate, so3_exp

    fx, fy, cx, cy = kvec[0], kvec[1], kvec[2], kvec[3]
    d = jnp.stack(
        [(xy[:, 0] - cx) / fx, (xy[:, 1] - cy) / fy, jnp.ones(xy.shape[0], xy.dtype)],
        axis=-1,
    )
    q = so3_exp(-rel_rotvec)           # (DeltaR)^T = exp(-w), as a quat
    d2 = quat_rotate(q, d)
    z = jnp.where(jnp.abs(d2[:, 2]) > 1e-6, d2[:, 2], 1e-6)
    return jnp.stack(
        [fx * d2[:, 0] / z + cx, fy * d2[:, 1] / z + cy], axis=-1
    )


def ransac_translation(
    flow: jnp.ndarray,
    mask: jnp.ndarray,
    threshold: float = 3.0,
    num_hypotheses: int = 64,
    seed: int = 0,
) -> jnp.ndarray:
    """Vectorized RANSAC on 2-D flow vectors (K, 2) -> inlier mask (K,).

    Hypotheses are individual flows (1-point translation model — what the
    nodelet's rotation-compensated 2-pt RANSAC reduces to for mostly
    rotation-free inter-frame motion); consensus within ``threshold`` px.
    """
    k = flow.shape[0]
    key = jax.random.PRNGKey(seed)
    # Sample hypothesis indices among (statically) all slots; masked slots
    # produce hypotheses with zero support among valid flows.
    idx = jax.random.randint(key, (num_hypotheses,), 0, k)
    hyp = flow[idx]                                          # (H, 2)
    hyp_valid = mask[idx]
    d = jnp.linalg.norm(flow[None, :, :] - hyp[:, None, :], axis=-1)
    inlier = (d <= threshold) & mask[None, :]
    support = jnp.sum(inlier, axis=1) * hyp_valid
    best = jnp.argmax(support)
    ok = jnp.any(mask)
    return jnp.where(ok, inlier[best] & mask, mask)


@_partial(jax.jit, static_argnames=("cfg",))
def _orb_pair_step(
    pair, prev_desc, prev_xy, prev_mask, cfg: FrontendConfig,
    rel_rotvec=None, kvec=None,
):
    """One stereo pair, fully device-side, ONE compiled program:
    batched ORB extraction -> stereo match -> temporal descriptor match vs
    the previous left frame -> (gyro-predicted rotation warp) ->
    translation-RANSAC. Returns
    (kp_left, kp_right, stereo idx, stereo mask, temporal idx or -1);
    an all-false ``prev_mask`` (first frame) yields temporal idx -1
    everywhere, so one program covers both cases.

    ``rel_rotvec``: integrated gyro rotation prev->cur. Pure yaw produces
    pixel flow that varies quadratically across the image (~40 px spread
    at 5 deg @1080p) — far beyond the 3 px RANSAC gate — so uncompensated
    1-pt translation RANSAC drops most genuine tracks on a turning
    vehicle. Warping the previous keypoints through the infinite-depth
    homography first restores the nodelet's rotation-compensated 2-pt
    semantics (reference launch/stereo.launch:46)."""
    from uslam_tpu.frontend.orb import extract_orb_batch

    # ``pair``: (2, H, W), stacked HOST-side so the stereo frame upload is
    # ONE buffer (each distinct buffer's first transfer costs a full round
    # trip on remote-TPU transports). Cast on-device: uint8 frames upload
    # at 1/4 the bytes of f32.
    kp_pair = extract_orb_batch(pair.astype(jnp.float32), cfg)
    kp_l = jax.tree.map(lambda a: a[0], kp_pair)
    kp_r = jax.tree.map(lambda a: a[1], kp_pair)
    up = resolve_pallas(cfg.use_pallas)
    sm = stereo_match(
        kp_l.desc, kp_l.xy, kp_l.mask,
        kp_r.desc, kp_r.xy, kp_r.mask,
        max_distance=cfg.match_max_distance,
        ratio=cfg.match_ratio,
        max_v_diff=cfg.stereo_max_v_diff,
        min_disparity=cfg.stereo_min_disparity,
        use_pallas=up,
    )
    tm = match_descriptors(
        kp_l.desc, kp_l.mask, prev_desc, prev_mask,
        max_distance=cfg.match_max_distance, ratio=cfg.match_ratio,
        use_pallas=up,
    )
    if rel_rotvec is not None:
        # Identity on an exactly-zero rotvec (no-IMU sequences) — the f32
        # warp round trip is not bit-exact, and the rv=None branch skips it.
        prev_xy = jnp.where(
            jnp.any(rel_rotvec != 0.0),
            rotation_warp(prev_xy, rel_rotvec, kvec),
            prev_xy,
        )
    flow = kp_l.xy - prev_xy[jnp.maximum(tm.idx, 0)]
    inlier = ransac_translation(flow, tm.mask, threshold=cfg.ransac_threshold_px)
    tm_idx = jnp.where(inlier, tm.idx, -1)
    return kp_l, kp_r, sm.idx, sm.mask, tm_idx


@_partial(jax.jit, static_argnames=("cfg",))
def _orb_chunk_step(pairs, prev_desc, prev_xy, prev_mask, cfg: FrontendConfig,
                    rotvecs, kvec):
    """C stereo pairs in ONE compiled program — the offline/throughput shape
    (the reference nodelet's thread-pooled axis, launch/stereo.launch:33).

    The temporal chain needs only the *extraction* outputs of frame i-1
    (descriptors + coordinates), never the host-side id interning, so every
    device stage batches across frames: one ``extract_orb_batch`` over all
    2C images, then vmapped stereo match / temporal match / rotation warp /
    RANSAC. ``prev_*`` carry the left keypoints of the frame before the
    chunk (all-false mask = sequence start); ``rotvecs`` is (C, 3) integrated
    gyro rotation frame i-1 -> i (zeros = no compensation).

    Returns per-frame (kp_left, kp_right, stereo idx, stereo mask,
    temporal idx or -1) with leading dim C — the same contract as
    :func:`_orb_pair_step` per frame.
    """
    from uslam_tpu.frontend.orb import extract_orb_batch

    c = pairs.shape[0]
    imgs = pairs.astype(jnp.float32).reshape((2 * c,) + pairs.shape[2:])
    kp = extract_orb_batch(imgs, cfg)
    kp_l = jax.tree.map(lambda a: a[0::2], kp)
    kp_r = jax.tree.map(lambda a: a[1::2], kp)
    up = resolve_pallas(cfg.use_pallas)
    sm = jax.vmap(
        lambda dl, xl, ml, dr, xr, mr: stereo_match(
            dl, xl, ml, dr, xr, mr,
            max_distance=cfg.match_max_distance,
            ratio=cfg.match_ratio,
            max_v_diff=cfg.stereo_max_v_diff,
            min_disparity=cfg.stereo_min_disparity,
            use_pallas=up,
        )
    )(kp_l.desc, kp_l.xy, kp_l.mask, kp_r.desc, kp_r.xy, kp_r.mask)
    # Previous-left keypoints per frame: the carry for frame 0, kp_l[i-1]
    # within the chunk.
    pdesc = jnp.concatenate([prev_desc[None], kp_l.desc[:-1]], axis=0)
    pxy = jnp.concatenate([prev_xy[None], kp_l.xy[:-1]], axis=0)
    pmask = jnp.concatenate([prev_mask[None], kp_l.mask[:-1]], axis=0)
    tm = jax.vmap(
        lambda d, m, pd, pm: match_descriptors(
            d, m, pd, pm,
            max_distance=cfg.match_max_distance, ratio=cfg.match_ratio,
            use_pallas=up,
        )
    )(kp_l.desc, kp_l.mask, pdesc, pmask)
    # Skip the warp on an exactly-zero rotvec (no-IMU sequences): the f32
    # pixel->ray->pixel round trip is not a bit-exact identity, and the
    # per-frame `process` path skips the warp when rv is None — keep the
    # chunked path bit-compatible with it.
    pxy_w = jax.vmap(
        lambda xy, rv: jnp.where(
            jnp.any(rv != 0.0), rotation_warp(xy, rv, kvec), xy
        )
    )(pxy, rotvecs)
    flow = kp_l.xy - jnp.take_along_axis(
        pxy_w, jnp.maximum(tm.idx, 0)[:, :, None], axis=1
    )
    inlier = jax.vmap(
        lambda f, m: ransac_translation(f, m, threshold=cfg.ransac_threshold_px)
    )(flow, tm.mask)
    tm_idx = jnp.where(inlier, tm.idx, -1)
    return kp_l, kp_r, sm.idx, sm.mask, tm_idx


class StereoFrontend:
    """Stateful per-sequence wrapper around the stateless jit stages."""

    def __init__(
        self,
        cam: CameraConfig = CameraConfig(),
        cfg: FrontendConfig = FrontendConfig(),
    ):
        self.cam = cam
        self.cfg = cfg
        self._prev: Keypoints | None = None
        self._prev_ids: np.ndarray | None = None
        self._prev_img = None
        self._next_id = 0

    def reset(self) -> None:
        self._prev = None
        self._prev_ids = None
        self._prev_img = None
        self._next_id = 0

    def _kvec(self) -> jnp.ndarray:
        c = self.cam
        return jnp.asarray([c.fx, c.fy, c.cx, c.cy], jnp.float32)

    def _associate_klt(self, left: jnp.ndarray, kp_l: Keypoints):
        """KLT-predict previous keypoints into this frame and associate each
        current detection to the nearest prediction within ``klt_gate_px``
        (the reference nodelet's tracking strategy, stereo.launch:41-43).

        Returns (idx into prev per current kp, mask)."""
        from uslam_tpu.frontend.klt import klt_track

        cfg = self.cfg
        tracked, ok = klt_track(
            self._prev_img, left, self._prev.xy, self._prev.mask,
            levels=cfg.pyramid_levels, radius=cfg.patch_size // 2,
        )
        d = jnp.linalg.norm(kp_l.xy[:, None, :] - tracked[None, :, :], axis=-1)
        d = jnp.where(ok[None, :] & self._prev.mask[None, :], d, jnp.inf)
        j = jnp.argmin(d, axis=1)
        best = jnp.take_along_axis(d, j[:, None], axis=1)[:, 0]
        mask = (best <= cfg.klt_gate_px) & kp_l.mask
        return jnp.where(mask, j, -1), mask

    def process(
        self,
        left: np.ndarray,
        right: np.ndarray,
        t: float,
        gyro_rotvec: np.ndarray | None = None,
    ) -> FeatureFrame:
        """One rectified grayscale stereo pair -> FeatureFrame (normalized
        coords + persistent ids), mirroring the nodelet output topic.

        ``gyro_rotvec``: optional integrated body rotation (3,) since the
        previous frame (``integrate_gyro_rotvec`` over the buffered IMU);
        enables rotation-compensated temporal RANSAC."""
        cfg = self.cfg
        # Keep the caller's dtype (uint8 uploads 4x less than f32); the
        # fused program casts on-device. KLT needs f32 on the host path.
        # Stack host-side: ONE upload buffer for the stereo pair.
        pair_np = np.stack([np.asarray(left), np.asarray(right)])

        if cfg.temporal_tracker == "klt":
            pair = jnp.asarray(pair_np).astype(jnp.float32)
            left = pair[0]
            from uslam_tpu.frontend.orb import extract_orb_batch

            kp_pair = extract_orb_batch(pair, cfg)
            kp_l = jax.tree.map(lambda a: a[0], kp_pair)
            kp_r = jax.tree.map(lambda a: a[1], kp_pair)
            sm = stereo_match(
                kp_l.desc, kp_l.xy, kp_l.mask,
                kp_r.desc, kp_r.xy, kp_r.mask,
                max_distance=cfg.match_max_distance,
                ratio=cfg.match_ratio,
                max_v_diff=cfg.stereo_max_v_diff,
                min_disparity=cfg.stereo_min_disparity,
                use_pallas=resolve_pallas(cfg.use_pallas),
            )
            if self._prev is not None:
                tm_idx_j, tm_mask = self._associate_klt(left, kp_l)
                prev_xy = self._prev.xy
                if gyro_rotvec is not None:
                    rv = jnp.asarray(gyro_rotvec, jnp.float32)
                    prev_xy = jnp.where(
                        jnp.any(rv != 0.0),
                        rotation_warp(prev_xy, rv, self._kvec()),
                        prev_xy,
                    )
                flow = kp_l.xy - prev_xy[jnp.maximum(tm_idx_j, 0)]
                inlier = ransac_translation(
                    flow, tm_mask, threshold=cfg.ransac_threshold_px
                )
                tm_idx_d = jnp.where(inlier, tm_idx_j, -1)
            else:
                tm_idx_d = jnp.full(kp_l.mask.shape, -1, jnp.int32)
            sm_idx_d, sm_mask_d = sm.idx, sm.mask
        else:
            # Default ORB temporal association: the ENTIRE per-pair device
            # pipeline (extract both images, stereo match, temporal match,
            # RANSAC) is one compiled program, and everything the host needs
            # comes back in one device_get — per-frame dispatch/readback
            # round trips dominate latency on high-latency device links.
            K = cfg.max_features
            if self._prev is None:
                prev_desc = jnp.zeros((K, 8), jnp.uint32)
                prev_xy = jnp.zeros((K, 2), jnp.float32)
                prev_mask = jnp.zeros((K,), bool)
            else:
                prev_desc, prev_xy, prev_mask = (
                    self._prev.desc, self._prev.xy, self._prev.mask,
                )
            if gyro_rotvec is None:
                kp_l, kp_r, sm_idx_d, sm_mask_d, tm_idx_d = _orb_pair_step(
                    pair_np, prev_desc, prev_xy, prev_mask, cfg
                )
            else:
                kp_l, kp_r, sm_idx_d, sm_mask_d, tm_idx_d = _orb_pair_step(
                    pair_np, prev_desc, prev_xy, prev_mask, cfg,
                    jnp.asarray(gyro_rotvec, jnp.float32), self._kvec(),
                )

        tm_idx, stereo_ok, sm_idx_np, xy_l_all, xy_r_raw = jax.device_get(
            (tm_idx_d, sm_mask_d, sm_idx_d, kp_l.xy, kp_r.xy)
        )

        ids = self._intern_ids(stereo_ok, tm_idx)
        self._prev = kp_l
        self._prev_img = left

        # Output contract: normalized [-1, 1] coords (batch.py:152-154).
        return self._emit_frame(t, ids, xy_l_all, xy_r_raw, sm_idx_np)

    def _emit_frame(self, t, ids, xy_l_all, xy_r_raw, sm_idx_np) -> FeatureFrame:
        sel = ids >= 0
        xy_l = xy_l_all[sel]
        xy_r = xy_r_raw[sm_idx_np[sel]]
        rx, ry = self.cam.resolution_x, self.cam.resolution_y
        return FeatureFrame(
            t=t,
            ids=ids[sel],
            u0=xy_l[:, 0] / (0.5 * rx) - 1.0,
            v0=xy_l[:, 1] / (0.5 * ry) - 1.0,
            u1=xy_r[:, 0] / (0.5 * rx) - 1.0,
            v1=xy_r[:, 1] / (0.5 * ry) - 1.0,
        )

    def _intern_ids(self, stereo_ok, tm_idx) -> np.ndarray:
        """Host-side id interning for one frame: tracked keypoints inherit
        the previous frame's id, fresh stereo-matched keypoints get new ids.
        Updates ``self._prev_ids``."""
        k = len(stereo_ok)
        ids = np.full(k, -1, np.int64)
        for i in range(k):
            if not stereo_ok[i]:
                continue
            j = int(tm_idx[i])
            if j >= 0 and self._prev_ids is not None and self._prev_ids[j] >= 0:
                ids[i] = self._prev_ids[j]
            else:
                ids[i] = self._next_id
                self._next_id += 1
        self._prev_ids = ids
        return ids

    def process_chunk(
        self,
        lefts: np.ndarray,
        rights: np.ndarray,
        ts,
        gyro_rotvecs: np.ndarray | None = None,
        pad_to: int | None = None,
    ) -> list[FeatureFrame]:
        """C rectified stereo pairs -> C FeatureFrames via ONE device
        program + ONE device_get (the offline-throughput path; per-frame
        ``process`` is the latency path and stays bit-compatible — the
        temporal chain only consumes extraction outputs, so batching does
        not change any match).

        ORB temporal tracker only (KLT chunks fall back to per-frame).
        ``pad_to`` pads a ragged tail chunk with zero images so every chunk
        reuses one compiled program; padded outputs are discarded.

        Mixing ``process_chunk`` with a KLT-configured ``process()`` call on
        the same instance is unsupported: a chunk invalidates the previous
        raw image (``_prev_img``) that KLT association needs.
        """
        cfg = self.cfg
        n_real = len(ts)
        if n_real == 0:
            return []
        if cfg.temporal_tracker == "klt":
            return [
                self.process(
                    lefts[i], rights[i], float(ts[i]),
                    None if gyro_rotvecs is None else gyro_rotvecs[i],
                )
                for i in range(n_real)
            ]
        pairs = np.stack([np.asarray(lefts), np.asarray(rights)], axis=1)
        rot = (
            np.zeros((n_real, 3), np.float32)
            if gyro_rotvecs is None
            else np.asarray(gyro_rotvecs, np.float32)
        )
        if pad_to is not None and n_real < pad_to:
            pad = pad_to - n_real
            pairs = np.concatenate(
                [pairs, np.zeros((pad,) + pairs.shape[1:], pairs.dtype)]
            )
            rot = np.concatenate([rot, np.zeros((pad, 3), np.float32)])

        K = cfg.max_features
        if self._prev is None:
            prev_desc = jnp.zeros((K, 8), jnp.uint32)
            prev_xy = jnp.zeros((K, 2), jnp.float32)
            prev_mask = jnp.zeros((K,), bool)
        else:
            prev_desc, prev_xy, prev_mask = (
                self._prev.desc, self._prev.xy, self._prev.mask,
            )
        kp_l, kp_r, sm_idx_d, sm_mask_d, tm_idx_d = _orb_chunk_step(
            pairs, prev_desc, prev_xy, prev_mask, cfg,
            jnp.asarray(rot), self._kvec(),
        )
        tm_idx, stereo_ok, sm_idx_np, xy_l_all, xy_r_raw = jax.device_get(
            (tm_idx_d, sm_mask_d, sm_idx_d, kp_l.xy, kp_r.xy)
        )
        frames = []
        for f in range(n_real):
            ids = self._intern_ids(stereo_ok[f], tm_idx[f])
            frames.append(
                self._emit_frame(
                    float(ts[f]), ids, xy_l_all[f], xy_r_raw[f], sm_idx_np[f]
                )
            )
        # Carry the last REAL frame's left keypoints (padded frames are
        # discarded entirely — a zero image yields no keypoints anyway, but
        # the carry must be the true chain tail).
        self._prev = jax.tree.map(lambda a: a[n_real - 1], kp_l)
        self._prev_img = None  # KLT-only state; invalid after a chunk
        return frames
