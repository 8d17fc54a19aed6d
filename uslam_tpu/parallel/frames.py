"""Data parallelism over frames: the front-end's mesh axis.

SURVEY.md §2.2 names exactly two parallel axes in this problem: landmarks
(Schur elimination — ``parallel.mesh``) and FRAMES (the front-end's
per-image work, embarrassingly parallel — the reference runs it on a
nodelet thread pool, launch/stereo.launch:33). Here a batch of frames (or
stereo pairs) is sharded over a ``jax.sharding.Mesh`` axis with
``shard_map``: each device runs the full ORB pipeline (pyramid, FAST +
Harris, orientation, rBRIEF, stereo Hamming matching) on its shard of the
batch. There is NO communication — pure DP; outputs come back sharded
along the same axis.

This is the offline/throughput path (process a recorded sequence N frames
at a time); the online path stays per-pair (latency-bound, one frame in
flight — ``frontend.tracker``).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uslam_tpu.config import FrontendConfig
from uslam_tpu.frontend.orb import Keypoints, _extract_orb_impl

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _check_batch(b: int, mesh: Mesh) -> None:
    if b % mesh.devices.size != 0:
        raise ValueError(
            f"frame batch {b} must divide the mesh size {mesh.devices.size} "
            "(pad the batch; masks make padded frames cheap no-ops)"
        )


@lru_cache(maxsize=8)
def _extract_fn(cfg: FrontendConfig, mesh: Mesh, axis: str):
    def local(imgs):  # (B/devices, H, W) on each device
        return jax.vmap(lambda im: _extract_orb_impl(im, cfg))(imgs)

    return jax.jit(
        shard_map(local, mesh=mesh, in_specs=P(axis), out_specs=P(axis))
    )


def extract_orb_frames_sharded(
    imgs: jnp.ndarray,
    mesh: Mesh,
    cfg: FrontendConfig = FrontendConfig(),
    axis: str = "devices",
) -> Keypoints:
    """ORB extraction over a frame batch (B, H, W), sharded over the mesh.

    Device-count-parallel equivalent of
    :func:`uslam_tpu.frontend.orb.extract_orb_batch`; returns Keypoints
    with a leading batch axis, sharded along ``axis``.
    """
    _check_batch(imgs.shape[0], mesh)
    sharding = NamedSharding(mesh, P(axis))
    return _extract_fn(cfg, mesh, axis)(jax.device_put(imgs, sharding))


@lru_cache(maxsize=8)
def _pairs_fn(cfg: FrontendConfig, mesh: Mesh, axis: str):
    from uslam_tpu.frontend.match import stereo_match
    from uslam_tpu.frontend.pallas_kernels import resolve_pallas

    up = resolve_pallas(cfg.use_pallas)

    def one_pair(left, right):
        pair = jnp.stack([left, right]).astype(jnp.float32)
        kp = jax.vmap(lambda im: _extract_orb_impl(im, cfg))(pair)
        kp_l = jax.tree.map(lambda a: a[0], kp)
        kp_r = jax.tree.map(lambda a: a[1], kp)
        sm = stereo_match(
            kp_l.desc, kp_l.xy, kp_l.mask,
            kp_r.desc, kp_r.xy, kp_r.mask,
            max_distance=cfg.match_max_distance,
            ratio=cfg.match_ratio,
            max_v_diff=cfg.stereo_max_v_diff,
            min_disparity=cfg.stereo_min_disparity,
            use_pallas=up,
        )
        return kp_l, kp_r, sm.idx, sm.mask

    def local(lefts, rights):  # (B/devices, H, W) each
        return jax.vmap(one_pair)(lefts, rights)

    return jax.jit(
        shard_map(
            local, mesh=mesh, in_specs=(P(axis), P(axis)),
            out_specs=P(axis),
        )
    )


def process_stereo_pairs_sharded(
    lefts: jnp.ndarray,
    rights: jnp.ndarray,
    mesh: Mesh,
    cfg: FrontendConfig = FrontendConfig(),
    axis: str = "devices",
):
    """Full per-pair front-end compute (batched ORB extraction on both
    images + stereo Hamming matching) over a batch of stereo pairs,
    sharded over the mesh — the DP equivalent of the nodelet thread pool's
    per-frame image work (reference launch/stereo.launch:33).

    Returns (kp_left, kp_right, stereo_idx, stereo_mask), each with a
    leading pair axis sharded along ``axis``. Temporal association (track
    ids) is inherently sequential and stays host-side
    (``frontend.tracker``); everything parallel lives here.
    """
    _check_batch(lefts.shape[0], mesh)
    sharding = NamedSharding(mesh, P(axis))
    return _pairs_fn(cfg, mesh, axis)(
        jax.device_put(lefts, sharding), jax.device_put(rights, sharding)
    )
