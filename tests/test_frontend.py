"""Front-end tests (SURVEY.md §4 config 1): FAST vs a naive numpy oracle,
ORB behavior (rotation invariance, matching), stereo disparity recovery,
persistent-id tracking. OpenCV is available as a behavioral baseline."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import gaussian_filter, rotate as nd_rotate, shift as nd_shift

from uslam_tpu.config import CameraConfig, FrontendConfig
from uslam_tpu.frontend import (
    StereoFrontend,
    extract_orb,
    fast_corners,
    harris_response,
    hamming_distance_matrix,
    match_descriptors,
    stereo_match,
)
from uslam_tpu.frontend.fast import FAST_RING
from uslam_tpu.frontend.orb import _grid_topk

RNG = np.random.default_rng(3)


def textured_image(h=192, w=256, seed=3, squares=80):
    """Smooth random texture with corner-rich structure."""
    rng = np.random.default_rng(seed)
    img = gaussian_filter(rng.uniform(0, 255, (h, w)), 3.0)
    # sprinkle high-contrast squares (corner factories)
    lo = 4
    for _ in range(squares):
        y = rng.integers(lo, max(h - 18, lo + 1))
        x = rng.integers(lo, max(w - 18, lo + 1))
        s = rng.integers(6, 14)
        img[y : y + s, x : x + s] = rng.uniform(0, 255)
    img = (img - img.min()) / (img.max() - img.min()) * 255.0
    return img.astype(np.float32)


def naive_fast9(img: np.ndarray, t: float) -> np.ndarray:
    """Straightforward double-loop FAST-9 oracle."""
    h, w = img.shape
    out = np.zeros((h, w), bool)
    ring = np.array(FAST_RING)
    for y in range(3, h - 3):
        for x in range(3, w - 3):
            c = img[y, x]
            vals = img[y + ring[:, 0], x + ring[:, 1]]
            bright = vals > c + t
            dark = vals < c - t
            for m in (bright, dark):
                mm = np.concatenate([m, m])
                run = 0
                good = False
                for v in mm:
                    run = run + 1 if v else 0
                    if run >= 9:
                        good = True
                        break
                if good:
                    out[y, x] = True
                    break
    return out


class TestFast:
    def test_matches_naive_oracle(self):
        img = textured_image(64, 96, squares=25)
        ours = np.asarray(fast_corners(jnp.asarray(img), 10.0))
        ref = naive_fast9(img, 10.0)
        np.testing.assert_array_equal(ours, ref)

    def test_threshold_monotone(self):
        img = textured_image()
        n_low = int(np.asarray(fast_corners(jnp.asarray(img), 5.0)).sum())
        n_high = int(np.asarray(fast_corners(jnp.asarray(img), 30.0)).sum())
        assert n_low >= n_high
        assert n_low > 0

    def test_harris_corner_vs_edge(self):
        img = np.zeros((64, 64), np.float32)
        img[20:, 20:] = 200.0  # corner at (20, 20); edges along its borders
        H = np.asarray(harris_response(jnp.asarray(img)))
        corner_r = H[20, 20]
        edge_r = H[20, 45]
        assert corner_r > 0
        assert corner_r > edge_r  # edges suppressed (negative R)


class TestGridTopK:
    def test_budget_and_bounds(self):
        img = textured_image()
        score = jnp.asarray(img)
        valid = score > -1
        ys, xs, vals, mask = _grid_topk(score, valid, 3, 4, 4)
        assert ys.shape == (3 * 4 * 4,)
        ys, xs = np.asarray(ys), np.asarray(xs)
        assert (ys < 192).all() and (xs < 256).all()
        # each cell contributes at most 4
        ch, cw = 64, 64
        cells = (ys // ch) * 4 + xs // cw
        for c in np.unique(cells):
            assert (cells == c).sum() <= 4


class TestOrb:
    cfg = FrontendConfig()

    def test_shapes_and_mask(self):
        img = textured_image()
        kp = extract_orb(jnp.asarray(img), self.cfg)
        K = self.cfg.max_features
        assert kp.xy.shape == (K, 2)
        assert kp.desc.shape == (K, 8)
        assert kp.desc.dtype == jnp.uint32
        assert int(kp.mask.sum()) > K // 3  # textured image fills many slots

    def test_descriptor_determinism(self):
        img = textured_image()
        k1 = extract_orb(jnp.asarray(img), self.cfg)
        k2 = extract_orb(jnp.asarray(img), self.cfg)
        np.testing.assert_array_equal(np.asarray(k1.desc), np.asarray(k2.desc))

    def test_hamming_distance(self):
        a = jnp.asarray(RNG.integers(0, 2**32, (5, 8), dtype=np.uint32))
        d = np.asarray(hamming_distance_matrix(a, a))
        assert (np.diag(d) == 0).all()
        b = jnp.asarray(np.bitwise_xor(np.asarray(a), np.uint32(1)))  # flip 1 bit/word
        d2 = np.asarray(hamming_distance_matrix(a, b))
        assert (np.diag(d2) == 8).all()

    def test_translation_matching(self):
        """Shifted copy: matches recover the translation for most features."""
        img = textured_image()
        dx, dy = 7, 4
        img2 = nd_shift(img, (dy, dx), order=1, mode="nearest")
        k1 = extract_orb(jnp.asarray(img), self.cfg)
        k2 = extract_orb(jnp.asarray(img2), self.cfg)
        m = match_descriptors(k2.desc, k2.mask, k1.desc, k1.mask)
        got = 0
        good = 0
        idx = np.asarray(m.idx)
        for i in np.nonzero(np.asarray(m.mask))[0]:
            flow = np.asarray(k2.xy)[i] - np.asarray(k1.xy)[idx[i]]
            got += 1
            if abs(flow[0] - dx) <= 2 and abs(flow[1] - dy) <= 2:
                good += 1
        assert got >= 8, got
        assert good / got > 0.7, (good, got)

    def test_rotation_invariance(self):
        """30-degree rotated copy still matches (steered BRIEF)."""
        img = textured_image(192, 192, seed=5)
        img2 = nd_rotate(img, 30.0, reshape=False, order=1, mode="nearest").astype(
            np.float32
        )
        k1 = extract_orb(jnp.asarray(img), self.cfg)
        k2 = extract_orb(jnp.asarray(img2), self.cfg)
        m = match_descriptors(k2.desc, k2.mask, k1.desc, k1.mask, max_distance=80)
        # Verify matched pairs against the known rotation (about center).
        c = (192 - 1) / 2.0
        th = np.deg2rad(-30.0)  # ndimage rotates CCW in array coords
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        idx = np.asarray(m.idx)
        good = tot = 0
        for i in np.nonzero(np.asarray(m.mask))[0]:
            p2 = np.asarray(k2.xy)[i] - c
            p1 = np.asarray(k1.xy)[idx[i]] - c
            pred = R @ p1
            tot += 1
            if np.linalg.norm(pred - p2) < 4.0:
                good += 1
        assert tot >= 5, tot
        assert good / tot > 0.5, (good, tot)


class TestStereoAndTracking:
    cfg = FrontendConfig()
    cam = CameraConfig(resolution_x=256, resolution_y=192)

    def test_stereo_disparity_recovery(self):
        img = textured_image()
        disp = 9.0
        right = nd_shift(img, (0, -disp), order=1, mode="nearest")
        kl = extract_orb(jnp.asarray(img), self.cfg)
        kr = extract_orb(jnp.asarray(right), self.cfg)
        sm = stereo_match(kl.desc, kl.xy, kl.mask, kr.desc, kr.xy, kr.mask)
        idx = np.asarray(sm.idx)
        disps = []
        for i in np.nonzero(np.asarray(sm.mask))[0]:
            disps.append(np.asarray(kl.xy)[i, 0] - np.asarray(kr.xy)[idx[i], 0])
        assert len(disps) >= 8, len(disps)
        assert abs(np.median(disps) - disp) < 1.5, np.median(disps)

    def test_tracker_persistent_ids(self):
        fe = StereoFrontend(self.cam, self.cfg)
        img = textured_image()
        disp = 8.0
        frames = []
        for step in range(3):
            left = nd_shift(img, (0, 3 * step), order=1, mode="nearest")
            right = nd_shift(left, (0, -disp), order=1, mode="nearest")
            frames.append(fe.process(left, right, t=0.2 * step))
        assert len(frames[0].ids) >= 8
        # Ids persist between consecutive frames.
        common01 = np.intersect1d(frames[0].ids, frames[1].ids)
        common12 = np.intersect1d(frames[1].ids, frames[2].ids)
        assert len(common01) >= max(3, len(frames[0].ids) // 3), (
            len(common01), len(frames[0].ids),
        )
        assert len(common12) >= 3
        # Normalized output contract: coords in [-1, 1].
        for f in frames:
            for arr in (f.u0, f.v0, f.u1, f.v1):
                assert (np.abs(arr) <= 1.0 + 1e-6).all()

    def test_opencv_behavioral_baseline(self):
        """Our matcher's inlier rate on a warped pair is in the same league
        as OpenCV ORB's (behavioral oracle, not bit parity)."""
        cv2 = pytest.importorskip("cv2")
        img = textured_image()
        img2 = nd_shift(img, (2, 6), order=1, mode="nearest")
        u8 = img.astype(np.uint8)
        u8b = img2.astype(np.uint8)

        orb = cv2.ORB_create(nfeatures=48)
        kp1, d1 = orb.detectAndCompute(u8, None)
        kp2, d2 = orb.detectAndCompute(u8b, None)
        cv_good = 0
        if d1 is not None and d2 is not None and len(d1) and len(d2):
            bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)
            for mt in bf.match(d2, d1):
                f = np.array(kp2[mt.queryIdx].pt) - np.array(kp1[mt.trainIdx].pt)
                if abs(f[0] - 6) <= 2 and abs(f[1] - 2) <= 2:
                    cv_good += 1

        k1 = extract_orb(jnp.asarray(img), self.cfg)
        k2 = extract_orb(jnp.asarray(img2), self.cfg)
        m = match_descriptors(k2.desc, k2.mask, k1.desc, k1.mask)
        ours_good = 0
        idx = np.asarray(m.idx)
        for i in np.nonzero(np.asarray(m.mask))[0]:
            f = np.asarray(k2.xy)[i] - np.asarray(k1.xy)[idx[i]]
            if abs(f[0] - 6) <= 2 and abs(f[1] - 2) <= 2:
                ours_good += 1
        # Our budget is 48 kps; require at least a third of OpenCV's inliers
        # and an absolute floor.
        assert ours_good >= max(5, cv_good // 3), (ours_good, cv_good)


class TestRotationCompensation:
    """Gyro-predicted rotation warp for temporal RANSAC (the nodelet's
    rotation-compensated semantics, reference launch/stereo.launch:46)."""

    @staticmethod
    def _numpy_rot_project(xy, rotvec, k):
        """Independent oracle: pixel -> ray -> R^T ray -> pixel."""
        from scipy.spatial.transform import Rotation

        fx, fy, cx, cy = k
        d = np.stack(
            [(xy[:, 0] - cx) / fx, (xy[:, 1] - cy) / fy, np.ones(len(xy))], -1
        )
        d2 = d @ Rotation.from_rotvec(rotvec).as_matrix()  # = R^T d row-wise
        return np.stack(
            [fx * d2[:, 0] / d2[:, 2] + cx, fy * d2[:, 1] / d2[:, 2] + cy], -1
        )

    def test_warp_matches_numpy_oracle(self):
        from uslam_tpu.frontend.tracker import rotation_warp

        rng = np.random.default_rng(0)
        k = (1827.0, 1827.6, 968.9, 561.4)
        xy = np.stack(
            [rng.uniform(50, 1870, 40), rng.uniform(50, 1030, 40)], -1
        )
        rv = np.array([0.02, -0.05, 0.03])
        got = np.asarray(rotation_warp(
            jnp.asarray(xy, jnp.float32), jnp.asarray(rv, jnp.float32),
            jnp.asarray(k, jnp.float32),
        ))
        want = self._numpy_rot_project(xy, rv, k)
        np.testing.assert_allclose(got, want, atol=0.05)

    def test_yaw_heavy_ransac(self):
        """5 deg of inter-frame yaw: uncompensated 1-pt translation RANSAC
        keeps only the narrow consensus band of the quadratically-varying
        rotational flow field; the gyro-compensated path keeps everything."""
        from uslam_tpu.frontend.tracker import ransac_translation, rotation_warp

        rng = np.random.default_rng(1)
        k = (1827.0, 1827.6, 968.9, 561.4)
        uu, vv = np.meshgrid(np.linspace(60, 1860, 12), np.linspace(60, 1020, 8))
        prev = np.stack([uu.ravel(), vv.ravel()], -1)
        # Yaw about the optical y (down) axis + a small true translation flow.
        rv = np.array([0.0, np.deg2rad(5.0), 0.0])
        cur = (
            self._numpy_rot_project(prev, rv, k)
            + np.array([3.0, 1.0])
            + rng.normal(0, 0.3, prev.shape)
        )
        mask = jnp.ones(len(prev), bool)

        raw_flow = jnp.asarray(cur - prev, jnp.float32)
        raw_inl = np.asarray(ransac_translation(raw_flow, mask, threshold=3.0))

        warped = rotation_warp(
            jnp.asarray(prev, jnp.float32), jnp.asarray(rv, jnp.float32),
            jnp.asarray(k, jnp.float32),
        )
        comp_flow = jnp.asarray(cur, jnp.float32) - warped
        comp_inl = np.asarray(ransac_translation(comp_flow, mask, threshold=3.0))

        assert raw_inl.mean() < 0.5, raw_inl.mean()     # tracks lost
        assert comp_inl.mean() > 0.95, comp_inl.mean()  # tracks kept

    def test_integrate_gyro_rotvec(self):
        from scipy.spatial.transform import Rotation

        from uslam_tpu.frontend.tracker import integrate_gyro_rotvec

        # Constant rate: exact closed form.
        w = np.array([0.1, -0.2, 0.3])
        rv = integrate_gyro_rotvec(np.tile(w, (40, 1)), 0.005)
        np.testing.assert_allclose(rv, w * 0.2, atol=1e-12)
        # Varying rates: matches scipy sequential composition.
        rng = np.random.default_rng(2)
        ws = rng.normal(0, 0.5, (25, 3))
        R = Rotation.identity()
        for wi in ws:
            R = R * Rotation.from_rotvec(wi * 0.01)
        np.testing.assert_allclose(
            integrate_gyro_rotvec(ws, 0.01), R.as_rotvec(), atol=1e-12
        )
        assert integrate_gyro_rotvec(np.zeros((0, 3)), 0.01).shape == (3,)


class TestChunkedFrontend:
    """Chunked offline path (StereoFrontend.process_chunk) vs the per-frame
    streaming path: the temporal chain consumes only extraction outputs, so
    batching across frames must not change any match or id assignment."""

    cam = CameraConfig(
        fx=200.0, fy=200.0, cx=128.0, cy=96.0, baseline=0.1,
        resolution_x=256, resolution_y=192,
    )
    cfg = FrontendConfig(pyramid_levels=1, max_features_per_cell=6)

    def _sequence(self, n=7, disp=8.0):
        img = textured_image()
        lefts, rights, rvs = [], [], []
        for step in range(n):
            left = nd_shift(img, (step, 3 * step), order=1, mode="nearest")
            lefts.append(left)
            rights.append(nd_shift(left, (0, -disp), order=1, mode="nearest"))
            rvs.append(np.zeros(3, np.float32))
        return np.stack(lefts), np.stack(rights), np.stack(rvs)

    def test_matches_per_frame_path(self):
        lefts, rights, rvs = self._sequence()
        ts = 0.2 * np.arange(len(lefts))

        fe_ref = StereoFrontend(self.cam, self.cfg)
        ref = [
            fe_ref.process(lefts[i], rights[i], float(ts[i]), gyro_rotvec=rvs[i])
            for i in range(len(ts))
        ]

        # chunk=4 over 7 frames: one full chunk + one padded tail chunk
        # (exercises pad_to) crossing a chunk boundary mid-track.
        fe = StereoFrontend(self.cam, self.cfg)
        got = []
        for c0 in range(0, len(ts), 4):
            c1 = min(c0 + 4, len(ts))
            got.extend(fe.process_chunk(
                lefts[c0:c1], rights[c0:c1], ts[c0:c1], rvs[c0:c1],
                pad_to=4 if c1 - c0 < 4 else None,
            ))
        assert len(got) == len(ref)
        assert len(ref[0].ids) >= 8
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(a.ids, b.ids)
            for fa, fb in zip((a.u0, a.v0, a.u1, a.v1), (b.u0, b.v0, b.u1, b.v1)):
                np.testing.assert_allclose(fa, fb, atol=1e-6)
        # Ids persist across the chunk boundary (frame 3 -> 4).
        common = np.intersect1d(got[3].ids, got[4].ids)
        assert len(common) >= 3, common
