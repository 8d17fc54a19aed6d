"""Vectorized sequence -> GraphArrays packing.

The object-style GraphBuilder (append one keyframe at a time, mirroring the
reference's callback accumulation, batch.py:253-267) costs O(total IMU
samples) Python-loop time — ~9 minutes for a 1000-pose / 200 Hz sequence on
one host core. This module packs the same arrays with numpy vectorization
(searchsorted interval slicing, one vmapped triangulation for every feature
in the sequence, argsort-based landmark grouping) in well under a second.

``pack_sequence`` is the production ingestion path used by
``pipeline.run_sequence``; equivalence with GraphBuilder is tested in
tests/test_packing.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from uslam_tpu.config import UslamConfig
from uslam_tpu.factors.depth import pressure_to_depth
from uslam_tpu.factors.imu import ImuIntervalData
from uslam_tpu.geometry.camera import triangulate_stereo_np
from uslam_tpu.graph.builder import (
    DvlMeasurements,
    GraphArrays,
    ImuIntervals,
    Priors,
    StereoObservations,
    _bucket,
    _compute_imu_whiteners,
)
from uslam_tpu.graph.values import Values
from uslam_tpu.io.sequence import SensorSequence
from uslam_tpu.io.timesync import approximate_time_join


@jax.tree_util.register_pytree_node_class
class PackedPytree:
    """A pytree consolidated into ONE flat buffer per dtype.

    Why: the first transfer of each distinct buffer through a remote-TPU
    transport costs a full round trip (~27 ms on this environment's tunnel),
    so shipping a 31-leaf graph pytree to the device costs ~0.55 s while the
    same bytes as two consolidated buffers cost ~0.01 s. As a registered
    pytree, this crosses a ``jit`` boundary as exactly those buffers; the
    solver calls :meth:`unpack` INSIDE its traced program, so slicing the
    leaves back out is fused into a program that is loaded anyway — no
    standalone unpack executable to compile or load.

    ``spec``/``treedef`` ride in the aux data (hashable), so the jit cache
    key distinguishes layouts and same-bucket repacks reuse one executable.
    """

    def __init__(self, bufs: dict, spec: tuple, treedef):
        self.bufs = bufs
        self.spec = spec
        self.treedef = treedef

    @classmethod
    def pack(cls, tree) -> "PackedPytree":
        leaves, treedef = jax.tree.flatten(tree)
        bufs: dict[str, list] = {}
        spec = []
        for leaf in leaves:
            # np.asarray(order="C"), NOT ascontiguousarray: the latter
            # promotes 0-d scalars to shape (1,).
            a = np.asarray(leaf, order="C")
            key = a.dtype.str
            spec.append((key, a.shape, a.size))
            bufs.setdefault(key, []).append(a.ravel())
        joined = {
            k: (np.concatenate(v) if len(v) > 1 else v[0]) for k, v in bufs.items()
        }
        return cls(joined, tuple(spec), treedef)

    def unpack(self):
        """Reconstitute the original pytree (traceable; call inside jit)."""
        out, offs = [], dict.fromkeys(self.bufs, 0)
        for dt, shape, size in self.spec:
            o = offs[dt]
            out.append(
                jax.lax.slice(self.bufs[dt], (o,), (o + size,)).reshape(shape)
            )
            offs[dt] = o + size
        return jax.tree.unflatten(self.treedef, out)

    def tree_flatten(self):
        keys = tuple(sorted(self.bufs))
        return tuple(self.bufs[k] for k in keys), (keys, self.spec, self.treedef)

    @classmethod
    def tree_unflatten(cls, aux, children):
        keys, spec, treedef = aux
        return cls(dict(zip(keys, children)), spec, treedef)


def _nearest_within_slop(
    query_t: np.ndarray, stream_t: np.ndarray, stream_v: np.ndarray,
    slop: float,
) -> np.ndarray:
    """Nearest-sample join: stream value at the closest stamp to each query
    time, zeros where no sample lies within ``slop`` (the sync window)."""
    hi = np.searchsorted(stream_t, query_t)
    lo = np.clip(hi - 1, 0, len(stream_t) - 1)
    hi = np.clip(hi, 0, len(stream_t) - 1)
    pick = np.where(
        np.abs(stream_t[hi] - query_t) < np.abs(stream_t[lo] - query_t), hi, lo
    )
    out = stream_v[pick].astype(np.float64)
    out[np.abs(stream_t[pick] - query_t) > slop] = 0.0
    return out


def _rank_within_group(keys: np.ndarray) -> np.ndarray:
    """Occurrence rank of each element within its key group, preserving
    original order (ranks[i] = #earlier elements with the same key)."""
    o = np.argsort(keys, kind="stable")
    sk = keys[o]
    is_new = np.r_[True, sk[1:] != sk[:-1]]
    grp_first = np.maximum.accumulate(np.where(is_new, np.arange(len(sk)), 0))
    ranks = np.empty(len(keys), int)
    ranks[o] = np.arange(len(sk)) - grp_first
    return ranks


def stratified_obs_mask(keys: np.ndarray, cap: int) -> np.ndarray:
    """Per-group observation budget: keep min(count, cap) elements EVENLY
    SPACED through each group's occurrence order (not the first cap).

    Observations arrive in time order, so a first-N cap silently discards
    every re-observation after the budget fills — on revisiting/looping
    trajectories that deletes exactly the loop-closure measurements that
    bind drift. The stratified pick keeps the temporal spread (first and
    last observations of a long track always survive the decimation's
    endpoints-biased spacing), preserving loop closures at identical cost.
    """
    if not len(keys):
        return np.ones(0, bool)
    rank = _rank_within_group(keys)
    counts = np.bincount(keys)[keys]
    # floor((r+1) cap / c) > floor(r cap / c) selects exactly min(c, cap)
    # evenly spaced ranks (all of them when c <= cap).
    return ((rank + 1) * cap) // counts > (rank * cap) // counts


def pack_sequence(
    seq: SensorSequence,
    config: UslamConfig,
    with_landmarks: bool = True,
    dtype=jnp.float32,
):
    """Time-join the streams and pack the full factor graph.

    Returns (graph, initial_values, odom_compare, landmark_id_rows).
    Semantics match the reference data path: keyframes are the synchronized
    (odom, dvl, features) triples (batch.py:325), keyframe z is replaced by
    the latest pressure depth (batch.py:133), velocities init to zero
    (batch.py:279), landmarks init from the first observation triangulated
    at the keyframe pose estimate.
    """
    cfg = config
    feat_t = np.array([f.t for f in seq.features]) if seq.features else np.zeros(0)
    streams = [seq.dvl_twist_t] + ([feat_t] if len(feat_t) else [])
    # Native C++ join when the toolchain is available (uslam_tpu.native),
    # byte-identical to the Python implementation.
    from uslam_tpu import native

    triples = native.approx_time_join(seq.dvl_pose_t, streams, cfg.timesync.slop)

    # Latest pressure at or before each keyframe; drop keyframes before the
    # first pressure message (reference batch.py:54 drop semantics).
    kf, dvl_i, ff_i = [], [], []
    for pivot_i, picks in triples:
        t = float(seq.dvl_pose_t[pivot_i])
        pi = int(np.searchsorted(seq.pressure_t, t, side="right")) - 1
        if pi < 0:
            continue
        kf.append((pivot_i, pi))
        dvl_i.append(picks[0])
        ff_i.append(picks[1] if len(picks) > 1 else -1)
    if not kf:
        raise ValueError("no usable keyframes after time sync")
    kf_pose_i = np.array([a for a, _ in kf])
    kf_press_i = np.array([b for _, b in kf])
    n = len(kf_pose_i)

    kf_t = seq.dvl_pose_t[kf_pose_i].astype(np.float64)
    if cfg.timesync.pose_source == "gt" and seq.gt_quat is not None:
        # Synthetic-debug pose source (SURVEY.md C3 pose-source selection).
        quats = seq.gt_quat[kf_pose_i].astype(np.float64)
        odom_compare = seq.gt_pos[kf_pose_i].astype(np.float64)
    else:
        quats = seq.dvl_pose_quat[kf_pose_i].astype(np.float64)
        odom_compare = seq.dvl_pose_pos[kf_pose_i].astype(np.float64)
    depth = np.asarray(
        pressure_to_depth(seq.pressure_mbar[kf_press_i], cfg.pressure)
    )
    trans = odom_compare.copy()
    trans[:, 2] = depth

    # --- IMU intervals (vectorized slicing + padding) --------------------
    S = cfg.imu.max_samples_per_keyframe
    lo = np.searchsorted(seq.imu_t, np.concatenate([[-np.inf], kf_t[:-1]]), side="left")
    hi = np.searchsorted(seq.imu_t, kf_t, side="left")
    # interval i (between kf i and i+1) uses samples in [kf_t[i], kf_t[i+1]).
    lo_int, hi_int = hi[:-1], hi[1:]
    counts = np.minimum(hi_int - lo_int, S)
    n_int = max(n - 1, 1)
    idx = lo_int[:, None] + np.arange(S)[None, :] if n > 1 else np.zeros((1, S), int)
    idx = np.clip(idx, 0, max(len(seq.imu_t) - 1, 0))
    sample_mask = (np.arange(S)[None, :] < counts[:, None]) if n > 1 else np.zeros((1, S), bool)
    acc = np.where(sample_mask[..., None], seq.imu_acc[idx], 0.0)
    gyro = np.where(sample_mask[..., None], seq.imu_gyro[idx], 0.0)
    if cfg.imu.dt_mode == "stamps" and len(seq.imu_t) > 1:
        # dt of sample k = t[k+1] - t[k] (last sample gets the median rate).
        step = np.diff(seq.imu_t, append=seq.imu_t[-1] + np.median(np.diff(seq.imu_t)))
        dts = np.where(sample_mask, step[idx], 0.0)
    else:
        dts = np.where(sample_mask, cfg.imu.default_dt, 0.0)
    imu_mask = (counts > 0).astype(np.float64) if n > 1 else np.zeros(1)

    # --- DVL -------------------------------------------------------------
    dvl = seq.dvl_twist_vel[np.array(dvl_i)].astype(np.float64)
    dvl_mask = np.ones(n)
    dvl_mask[0] = 0.0

    # --- velocity initial estimates ---------------------------------------
    # Reference batch node initializes every velocity to zero (batch.py:279);
    # the incremental node instead uses the measured world-frame velocity
    # stream /mavros/local_position/velocity_local as the initial estimate
    # and the V(0) prior mean (reference isam.py:306,319-328). When the
    # sequence carries that stream, join it (nearest sample within the sync
    # slop) per keyframe; keyframes without a fresh sample fall back to 0.
    vel_init = np.zeros((n, 3))
    if seq.mavros_vel is not None and seq.mavros_vel_t is not None and len(
        seq.mavros_vel_t
    ):
        vel_init = _nearest_within_slop(
            kf_t, np.asarray(seq.mavros_vel_t, np.float64),
            np.asarray(seq.mavros_vel, np.float64), cfg.timesync.slop,
        )

    # --- stereo features -------------------------------------------------
    rx, ry = cfg.camera.resolution_x, cfg.camera.resolution_y
    frames, ids_all, uL_all, uR_all, v_all = [], [], [], [], []
    if with_landmarks and len(feat_t):
        for i in range(n):
            fi = ff_i[i]
            if fi < 0:
                continue
            ff = seq.features[fi]
            k = len(ff.ids)
            if k == 0:
                continue
            frames.append(np.full(k, i))
            ids_all.append(np.asarray(ff.ids))
            uL_all.append((ff.u0 + 1.0) * 0.5 * rx)
            uR_all.append((ff.u1 + 1.0) * 0.5 * rx)
            v_all.append(((ff.v0 + ff.v1) / 2.0 + 1.0) * 0.5 * ry)
    if frames:
        frame_idx = np.concatenate(frames)
        ids = np.concatenate(ids_all)
        uL = np.concatenate(uL_all)
        uR = np.concatenate(uR_all)
        vv = np.concatenate(v_all)
    else:
        frame_idx = np.zeros(0, int)
        ids = np.zeros(0, int)
        uL = uR = vv = np.zeros(0)

    # Intern ids -> dense rows in first-appearance order (GraphBuilder
    # parity) and record the first observation of each id.
    uniq, first_pos = np.unique(ids, return_index=True)
    order = np.argsort(first_pos, kind="stable")
    uniq = uniq[order]
    first_pos = first_pos[order]
    row_of = {int(u): r for r, u in enumerate(uniq)}
    lm_rows = np.array([row_of[int(i)] for i in ids], int) if len(ids) else np.zeros(0, int)
    m = len(uniq)

    # Landmark init: triangulate the FIRST observation at its keyframe pose.
    # Plain vectorized numpy — ingest is host-side work, and any XLA route
    # costs a per-process compile (this host's CPU AOT cache doesn't
    # reload) or a TPU-tunnel round trip (both measured slower; CLAUDE.md).
    if m:
        f0 = first_pos
        lm_init = triangulate_stereo_np(
            cfg.camera,
            quats[frame_idx[f0]],
            trans[frame_idx[f0]],
            np.stack([uL[f0], uR[f0], vv[f0]], -1),
        )
    else:
        lm_init = np.zeros((0, 3))

    # Drop frame-0 observations (reference adds stereo factors for i >= 1
    # only, batch.py:295) and apply the per-landmark observation budget
    # (stratified over each track — see stratified_obs_mask).
    keep = frame_idx >= 1
    frame_k, lm_k = frame_idx[keep], lm_rows[keep]
    uL_k, uR_k, v_k = uL[keep], uR[keep], vv[keep]
    cap = cfg.solver.max_obs_per_landmark
    if len(lm_k):
        capped = stratified_obs_mask(lm_k, cap)
        frame_k, lm_k = frame_k[capped], lm_k[capped]
        uL_k, uR_k, v_k = uL_k[capped], uR_k[capped], v_k[capped]

    f_real = len(frame_k)
    F = _bucket(max(f_real, 1))
    cam_idx = np.zeros(F, np.int32)
    lm_idx = np.zeros(F, np.int32)
    meas = np.zeros((F, 3))
    s_mask = np.zeros(F)
    cam_idx[:f_real] = frame_k
    lm_idx[:f_real] = lm_k
    meas[:f_real] = np.stack([uL_k, uR_k, v_k], -1) if f_real else 0.0
    s_mask[:f_real] = 1.0

    # Per-landmark groups via argsort.
    M = _bucket(max(m, 1))
    if f_real:
        rank = _rank_within_group(lm_k)
        K = _bucket(max(int(rank.max()) + 1, 1), minimum=2)
        lm_obs_idx = np.zeros((M, K), np.int32)
        lm_obs_mask = np.zeros((M, K))
        obs = np.arange(f_real)
        lm_obs_idx[lm_k, rank] = obs
        lm_obs_mask[lm_k, rank] = 1.0
    else:
        K = 2
        lm_obs_idx = np.zeros((M, K), np.int32)
        lm_obs_mask = np.zeros((M, K))

    landmarks = np.zeros((M, 3))
    if m:
        landmarks[:m] = lm_init

    # --- assemble pytrees (numpy leaves; ONE device transfer at the end —
    # each separate host->device put costs a full round trip through this
    # environment's TPU tunnel) ------------------------------------------
    npt = np.float32 if dtype == jnp.float32 else np.float64
    noise = cfg.noise
    bias_weight = 0.0 if noise.prior_bias_sigma is None else 1.0 / noise.prior_bias_sigma
    priors = Priors(
        pose_quat=np.asarray(quats[0], npt),
        pose_trans=np.asarray(trans[0], npt),
        pose_sigmas=np.asarray(noise.prior_pose_sigmas, npt),
        # V(0) prior mean = measured velocity when the mavros stream is
        # present (isam.py:319-328 semantics), zero otherwise (batch.py:279).
        vel=np.asarray(vel_init[0], npt),
        vel_sigma=np.asarray(noise.prior_vel_sigma, npt),
        bias=np.zeros(6, npt),
        bias_weight=np.asarray(bias_weight, npt),
        marg_sqrt_info=np.zeros((15, 15), npt),
        marg_pose_quat=np.array([1.0, 0, 0, 0], npt),
        marg_pose_trans=np.zeros(3, npt),
        marg_vel=np.zeros(3, npt),
        marg_bias=np.zeros(6, npt),
        marg_weight=np.zeros((), npt),
    )
    imu_data_np = ImuIntervalData(
        acc=np.asarray(acc, npt),
        gyro=np.asarray(gyro, npt),
        dt=np.asarray(dts, npt),
    )
    # Whiteners from the UNQUANTIZED f64 samples (the builder path does the
    # same): the covariance recursion is the one ingest stage where f32
    # input rounding visibly moves the whitening.
    imu_data_f64 = ImuIntervalData(acc=acc, gyro=gyro, dt=dts)
    imu = ImuIntervals(
        data=imu_data_np,
        whitener=np.asarray(_compute_imu_whiteners(imu_data_f64, cfg), npt),
        mask=np.asarray(imu_mask, npt),
    )
    graph = GraphArrays(
        priors=priors,
        imu=imu,
        dvl=DvlMeasurements(np.asarray(dvl, npt), np.asarray(dvl_mask, npt)),
        stereo=StereoObservations(
            cam_idx=np.asarray(cam_idx, np.int32),
            lm_idx=np.asarray(lm_idx, np.int32),
            meas=np.asarray(meas, npt),
            mask=np.asarray(s_mask, npt),
            lm_obs_idx=np.asarray(lm_obs_idx, np.int32),
            lm_obs_mask=np.asarray(lm_obs_mask, npt),
        ),
    )
    values = Values(
        pose_quat=np.asarray(quats, npt),
        pose_trans=np.asarray(trans, npt),
        vel=np.asarray(vel_init, npt),
        bias=np.zeros(6, npt),
        landmarks=np.asarray(landmarks, npt),
    )
    # Host numpy trees, deliberately: run_solver consolidates them into one
    # buffer per dtype (PackedPytree) so the device transfer is 2 round
    # trips and the unpack is fused into the (already loaded) LM program.
    return graph, values, odom_compare, row_of
