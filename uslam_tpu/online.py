"""Online (streaming) SLAM: sensors in, pose estimates out, per keyframe.

This is the working end-to-end version of what the reference's isam.py
attempts (and its nodelet provides): feed IMU / pressure / DVL / stereo
frames as they arrive; every stereo frame that can be time-matched with
fresh DVL messages (the ApproximateTimeSynchronizer contract,
batch.py:325) becomes a keyframe — the ORB front-end extracts and tracks
features, and the fixed-lag smoother updates the estimate.

The reference's online loop updates on odometry callbacks
(isam.py:211-212); here the camera frame triggers (features are the
scarcest stream), with the same slop-gated freshness requirement.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from uslam_tpu.config import DEFAULT_CONFIG, UslamConfig
from uslam_tpu.factors.depth import pressure_to_depth
from uslam_tpu.frontend.tracker import StereoFrontend, integrate_gyro_rotvec
from uslam_tpu.pipeline import AUVSlam
from uslam_tpu.solvers.fixed_lag import FixedLagSmoother
from uslam_tpu.utils.logging import get_logger

log = get_logger("online")


@dataclass
class OnlineSlam:
    config: UslamConfig = field(default_factory=lambda: DEFAULT_CONFIG)
    window: int = 10
    solve_during_fill: bool = True
    # Keep the steady-state window graph + marginal prior ON DEVICE between
    # keyframes (one consolidated upload + one fetch per keyframe instead
    # of rebuilding/shipping the window graph — see
    # solvers.fixed_lag.DeviceWindowState). Biggest win on high-latency
    # device links (remote TPU).
    device_resident: bool = False
    # Fuse the FRONT-END into the steady-state device program too
    # (solvers.fixed_lag._fused_keyframe_step): ORB extraction, matching,
    # RANSAC, persistent-id interning, and landmark triangulation all run
    # inside the window-step program — per keyframe the host uploads the
    # stereo pair + one small record and fetches the estimates (3 round
    # trips total, zero host math on the critical path). Implies
    # device_resident.
    fused: bool = False
    # Pipeline the result fetch: the estimate fetch of keyframe k is
    # started asynchronously (copy_to_host_async) and harvested at
    # keyframe k+1, so the device->host round trip leaves the critical
    # path. add_stereo_frame then returns the PREVIOUS keyframe's window
    # estimate (one-keyframe result lag — the standard streaming
    # pipelining trade; state evolution on device is unaffected because
    # the window state never leaves the device). Implies fused. Call
    # :meth:`flush` (or ``trajectory()``, which flushes) to drain the
    # last pending keyframe.
    pipelined: bool = False
    # Ship the stereo-pair upload from a worker thread (steady-state fused
    # path only): through a high-latency device link, ``jax.device_put`` of
    # the ~4 MB pair BLOCKS the caller while the bytes stream out (measured
    # ~60-80 ms — the bulk of the keyframe critical path), and the transport
    # releases the GIL, so the host-side record math overlaps the upload
    # instead of queueing behind it (in pipelined mode the previous
    # keyframe's harvest additionally overlaps THIS keyframe's device
    # step — see the dispatch-then-harvest order in add_stereo_frame).
    # Falls back to a synchronous put if the worker errors.
    threaded_upload: bool = True
    # Bounded-work STEADY-STATE update (ISAM2 semantics — the reference's
    # isam.update is ONE bounded refinement per keyframe, isam.py:341):
    # once the window is full, cap the per-keyframe window LM at this many
    # iterations. The window re-solves on every keyframe, so each state
    # gets `window` bounded refinements before it leaves — full
    # per-keyframe convergence buys nothing (measured on a 30 s 1080p
    # stream: median latency 95 -> 86 ms, worst keyframe 38 -> 8
    # iterations, ATE 0.125 -> 0.091 — the capped solve tracks BETTER; the
    # f32 LM tail on a small window chases noise). Cap 5 vs 8 re-measured
    # on the 20 s stream: latency unchanged (the step is fetch-bound) and
    # ATE 0.102 -> 0.093 — the tighter cap tracks better still. Cap sweep
    # on the 30 s 1080p stream (r5, pipelined): 5 -> ATE 0.0781; 4 ->
    # median 85.6 ms, ATE 0.0724; 3 -> median 86.0 ms, ATE 0.0954 — 4 wins
    # on both axes (below 4 the window step is no longer iteration-bound:
    # per-keyframe device time is frontend + record + marginalization, so
    # 3 only costs quality). Fill-phase solves always run to the full
    # config.solver policy: they start from raw odometry and are baked
    # into the first marginal. None = steady state also solves to full
    # convergence.
    max_update_iters: int | None = 4

    def __post_init__(self):
        self.frontend = StereoFrontend(self.config.camera, self.config.frontend)
        if self.pipelined:
            self.fused = True
        if self.fused:
            self.device_resident = True
        self._steady_solver = self.config.solver
        if self.max_update_iters is not None:
            import dataclasses as _dc

            self._steady_solver = _dc.replace(
                self.config.solver,
                max_iterations=min(
                    self.max_update_iters, self.config.solver.max_iterations
                ),
            )
        self.smoother = FixedLagSmoother(
            self.config, window=self.window,
            solve_during_fill=self.solve_during_fill,
            device_resident=self.device_resident,
            feat_slots=(
                self.config.frontend.max_features
                if self.fused
                else FixedLagSmoother.feat_slots
            ),
            steady_solver=self._steady_solver,
        )
        self._fe_state = None          # device FusedFrontendState
        self._upload_pool = None       # lazy 1-thread executor (threaded_upload)
        self._pending = None           # pipelined: (outputs, imu, twist, entry)
        self._last_values = None       # pipelined: previous keyframe estimate
        self._helper = AUVSlam(self.config)   # landmark triangulation helper
        self._imu_buf: list = []
        self._depth: float | None = None
        self._odom: tuple | None = None       # (t, quat, pos)
        self._twist: tuple | None = None      # (t, vel)
        self._mavros: tuple | None = None     # (t, world-frame vel)
        self.keyframes = 0
        # Per-keyframe latency split (ms): frontend (ORB pair program incl.
        # its fetch), triangulate (host numpy), plus the smoother's
        # record/solve/fetch entries (device-resident steady state).
        self.timings: list = []

    # ---- sensor inputs (the reference's subscriber surface) --------------

    def add_imu(self, t: float, acc, gyro, dt: float | None = None) -> None:
        dt = self.config.imu.default_dt if dt is None else dt
        self._imu_buf.append(
            np.concatenate([np.asarray(acc, float), np.asarray(gyro, float), [dt]])
        )

    def add_pressure(self, t: float, press_abs_mbar: float) -> None:
        self._depth = float(pressure_to_depth(press_abs_mbar, self.config.pressure))

    def add_dvl_pose(self, t: float, quat_wxyz, pos_xyz) -> None:
        self._odom = (t, np.asarray(quat_wxyz, float), np.asarray(pos_xyz, float))

    def add_dvl_twist(self, t: float, vel_body) -> None:
        self._twist = (t, np.asarray(vel_body, float))

    def add_mavros_vel(self, t: float, vel_world) -> None:
        """World-frame velocity stream (/mavros/local_position/
        velocity_local): used as the new keyframe's velocity initial
        estimate, the reference incremental node's semantics
        (isam.py:306,365). Optional — keyframes fall back to zero-velocity
        initialization (batch.py:279) when absent or stale."""
        self._mavros = (t, np.asarray(vel_world, float))

    def add_stereo_frame(self, t: float, left, right):
        """Process one stereo pair; returns the current window estimate (or
        None if the frame couldn't be synchronized — reference drop
        semantics, batch.py:54)."""
        slop = self.config.timesync.slop
        if (
            self._odom is None
            or self._twist is None
            or self._depth is None
            or abs(self._odom[0] - t) > slop
            or abs(self._twist[0] - t) > slop
        ):
            log.debug("dropping frame at t=%.3f (unsynchronized)", t)
            return None

        # Gyro-predicted rotation since the previous frame: compensates the
        # temporal RANSAC for vehicle turning (the buffered IMU is exactly
        # the inter-frame window; it is consumed for preintegration below).
        import time as _time

        if (
            self.fused
            and self.smoother._marg is not None
            and len(self.smoother._frames) >= self.window
        ):
            return self._fused_step(t, left, right)

        t0 = _time.perf_counter()
        rv = None
        if self._imu_buf and self.keyframes > 0:
            buf = np.stack(self._imu_buf)
            rv = integrate_gyro_rotvec(buf[:, 3:6], buf[:, 6])
        ff = self.frontend.process(
            np.asarray(left), np.asarray(right), t, gyro_rotvec=rv
        )
        t1 = _time.perf_counter()
        _, quat, pos = self._odom
        pos_adj = np.array([pos[0], pos[1], self._depth])
        feats = None
        if len(ff.ids):
            feats = self._helper.get_landmarks(
                ff.ids, ff.u0, ff.v0, ff.u1, ff.v1, quat, pos_adj
            )
        imu = np.stack(self._imu_buf) if self._imu_buf else None
        self._imu_buf = []
        vel0 = np.zeros(3)
        if self._mavros is not None and abs(self._mavros[0] - t) <= slop:
            vel0 = self._mavros[1]
        t2 = _time.perf_counter()
        n_timing = len(self.smoother.timings)
        values = self.smoother.add_keyframe(
            quat, pos_adj, vel0, imu, self._twist[1], feats
        )
        t3 = _time.perf_counter()
        entry = {
            "frontend_ms": (t1 - t0) * 1e3,
            "triangulate_ms": (t2 - t1) * 1e3,
            "smoother_ms": (t3 - t2) * 1e3,
            "total_ms": (t3 - t0) * 1e3,
        }
        if len(self.smoother.timings) > n_timing:
            entry.update(self.smoother.timings[-1])
        self.timings.append(entry)
        self.keyframes += 1
        self._last_values = values   # pipelined: seed the one-lag return
        return values

    def _fused_step(self, t: float, left, right):
        """Steady-state keyframe through the fully-fused device program
        (solvers.fixed_lag._fused_keyframe_step): one stereo-pair upload +
        one small-record upload + one estimate fetch.

        Transport layout (high-latency links): the stereo-pair and record
        uploads are STARTED first (device_put is asynchronous) so they
        overlap the host-side record math; in ``pipelined`` mode the
        estimate fetch is started asynchronously and harvested at the next
        keyframe, taking the device->host round trip off the critical path
        entirely (one-keyframe result lag)."""
        import time as _time

        import jax
        import jax.numpy as jnp

        from uslam_tpu.graph.packing import PackedPytree
        from uslam_tpu.solvers.fixed_lag import (
            FusedFrontendState,
            FusedRecord,
            _fused_keyframe_step,
            _imu_whitener_record,
        )

        sm = self.smoother
        cfg = self.config
        t0 = _time.perf_counter()
        if sm._dev_state is None:
            sm._init_device_state(frames=list(sm._frames))
        if self._fe_state is None:
            # Transition from the host tracker: mirror its state on device.
            fe = self.frontend
            self._fe_state = jax.device_put(
                FusedFrontendState(
                    desc=jnp.asarray(fe._prev.desc),
                    xy=jnp.asarray(fe._prev.xy),
                    mask=jnp.asarray(fe._prev.mask),
                    ids=jnp.asarray(fe._prev_ids, jnp.int32),
                    next_id=jnp.asarray(fe._next_id, jnp.int32),
                )
            )

        # Start the big upload FIRST; everything below overlaps it. Through
        # the tunnel device_put blocks while the ~4 MB streams out, so in
        # threaded mode a worker thread owns the put (the transport releases
        # the GIL) and the main thread harvests / preps the record meanwhile.
        pair = np.stack([np.asarray(left), np.asarray(right)])
        pair_fut = None
        if self.threaded_upload:
            if self._upload_pool is None:
                from concurrent.futures import ThreadPoolExecutor

                self._upload_pool = ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="uslam-upload"
                )
            pair_fut = self._upload_pool.submit(jax.device_put, pair)
        else:
            pair_dev = jax.device_put(pair)
        t_pair = _time.perf_counter()

        rv = np.zeros(3)
        if self._imu_buf and self.keyframes > 0:
            buf = np.stack(self._imu_buf)
            rv = integrate_gyro_rotvec(buf[:, 3:6], buf[:, 6])
        imu_samples = np.stack(self._imu_buf) if self._imu_buf else None
        self._imu_buf = []
        imu32, whit, valid = _imu_whitener_record(imu_samples, cfg)
        _, quat, pos = self._odom
        vel0 = np.zeros(3)
        if self._mavros is not None and abs(self._mavros[0] - t) <= cfg.timesync.slop:
            vel0 = self._mavros[1]
        rec = FusedRecord(
            imu=imu32, whitener=whit, imu_valid=valid,
            dvl=np.asarray(self._twist[1], np.float32),
            quat=np.asarray(quat, np.float32),
            pos_xy=np.asarray(pos[:2], np.float32),
            depth=np.float32(self._depth),
            vel0=np.asarray(vel0, np.float32),
            rotvec=np.asarray(rv, np.float32),
        )
        # Consolidated record upload, also started before the dispatch.
        packed = jax.device_put(PackedPytree.pack(rec))
        kvec = np.asarray(
            [cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy],
            np.float32,
        )
        t_prep = _time.perf_counter()
        if pair_fut is not None:
            try:
                pair_dev = pair_fut.result()
            except Exception:  # worker/transport quirk — retry inline
                pair_dev = jax.device_put(pair)
        t1 = _time.perf_counter()
        sm._dev_state, self._fe_state, outputs = _fused_keyframe_step(
            sm._dev_state, self._fe_state, pair_dev, packed,
            sm.cam, kvec,
            cfg.noise.dvl_sigma, cfg.noise.stereo_sigma, cfg.imu.gravity,
            self._steady_solver, cfg,
        )
        twist = np.asarray(self._twist[1], np.float64)
        if self.pipelined:
            # Start the device->host copy of THIS keyframe's outputs, then
            # harvest the PREVIOUS keyframe — in that order, so keyframe k
            # is already queued on the device while the host blocks on
            # k-1's result copy. Harvesting before the dispatch (the old
            # order) left the device idle for the whole copy round trip,
            # so the steady-state cycle paid step+copy instead of step
            # (measured 98 -> ~75 ms median through the tunnel). The
            # window state stays on device, so correctness does not depend
            # on when the copy lands; outputs is ONE packed f32 buffer
            # (one transfer round trip), and the result lag stays one
            # keyframe (_last_values updates in the harvest below).
            outputs.copy_to_host_async()
            t2 = _time.perf_counter()
            self._harvest_pending()
            t3 = _time.perf_counter()
            entry = {
                "record_ms": (t1 - t0) * 1e3,
                "pair_stack_ms": (t_pair - t0) * 1e3,
                "prep_ms": (t_prep - t_pair) * 1e3,
                "pair_wait_ms": (t1 - t_prep) * 1e3,
                "dispatch_ms": (t2 - t1) * 1e3,
                "harvest_wait_ms": (t3 - t2) * 1e3,
                "frontend_ms": 0.0,
                "triangulate_ms": 0.0,
                "smoother_ms": (t3 - t0) * 1e3,
                "total_ms": (t3 - t0) * 1e3,
                "fused": True,
                "pipelined": True,
            }
            self._pending = (outputs, imu_samples, twist, entry)
            self.timings.append(entry)
            self.keyframes += 1
            return self._last_values
        self._harvest_pending()  # no-op unless a pipelined stream mixed modes
        jax.block_until_ready(outputs)
        t2 = _time.perf_counter()
        from uslam_tpu.solvers.fixed_lag import _unpack_step_outputs

        fetched = _unpack_step_outputs(jax.device_get(outputs))
        t3 = _time.perf_counter()
        values = self._finish_keyframe(fetched, imu_samples, twist)
        entry = {
            "record_ms": (t1 - t0) * 1e3,
            "pair_stack_ms": (t_pair - t0) * 1e3,
            "prep_ms": (t_prep - t_pair) * 1e3,
            "pair_wait_ms": (t1 - t_prep) * 1e3,
            "solve_ms": (t2 - t1) * 1e3,
            "fetch_ms": (t3 - t2) * 1e3,
            "frontend_ms": 0.0,      # fused into solve_ms
            "triangulate_ms": 0.0,
            "smoother_ms": (t3 - t0) * 1e3,
            "total_ms": (t3 - t0) * 1e3,
            "lm_iters": int(fetched[4].iterations),
            "fused": True,
        }
        sm.timings.append(
            {k: entry[k] for k in ("record_ms", "solve_ms", "fetch_ms")}
        )
        self.timings.append(entry)
        self.keyframes += 1
        return values

    def _finish_keyframe(self, fetched, imu_samples, twist):
        """Roll the host mirror from fetched window estimates
        (full_trajectory / API parity); fused-mode mirror keyframes carry
        no feature lists (they live on device)."""
        from uslam_tpu.graph.values import Values
        from uslam_tpu.solvers.fixed_lag import _Keyframe

        sm = self.smoother
        pq, pt, vv, departing, _stats = fetched
        sm._frames.append(
            _Keyframe(pq[-1].astype(np.float64), pt[-1].astype(np.float64),
                      vv[-1].astype(np.float64), imu_samples, twist, None)
        )
        sm._frames.popleft()
        for i, fr in enumerate(sm._frames):
            fr.quat, fr.trans, fr.vel = pq[i + 1], pt[i + 1], vv[i + 1]
        sm._trajectory.append(np.asarray(departing, np.float64))
        values = Values(
            pose_quat=pq, pose_trans=pt, vel=vv,
            bias=np.zeros(6, np.float32),
            landmarks=np.zeros((1, 3), np.float32),
        )
        self._last_values = values
        return values

    def _harvest_pending(self) -> None:
        """Pipelined mode: complete the previous keyframe's deferred fetch
        and host-mirror roll."""
        if self._pending is None:
            return
        import time as _time

        import jax

        outputs, imu_samples, twist, entry = self._pending
        self._pending = None
        th = _time.perf_counter()
        from uslam_tpu.solvers.fixed_lag import _unpack_step_outputs

        fetched = _unpack_step_outputs(jax.device_get(outputs))
        entry["harvest_ms"] = (_time.perf_counter() - th) * 1e3
        entry["lm_iters"] = int(fetched[4].iterations)
        self._finish_keyframe(fetched, imu_samples, twist)

    def flush(self) -> None:
        """Drain the pipelined tail: completes any pending keyframe so that
        ``trajectory()`` / checkpointing see every processed frame."""
        self._harvest_pending()

    # ---- outputs ----------------------------------------------------------

    def trajectory(self) -> np.ndarray:
        """(T, 3) finalized + in-window positions so far."""
        self._harvest_pending()
        return self.smoother.full_trajectory()
