"""IO utilities: Butterworth prefilter vs scipy (C15), gravity compensation
(C17), sequence save/load, checkpoint roundtrip."""

import jax.numpy as jnp
import numpy as np
from scipy.signal import butter as sp_butter, filtfilt as sp_filtfilt

from uslam_tpu.geometry.so3 import quat_rotate, so3_exp
from uslam_tpu.io.filters import (
    butter_lowpass_coeffs,
    filtfilt,
    gravity_compensate,
    smooth_imu,
)
from uslam_tpu.io.sequence import load_sequence, save_sequence
from uslam_tpu.io.synthetic import SyntheticSpec, generate_synthetic_sequence
from uslam_tpu.utils.checkpoint import load_state, save_state


class TestButterworth:
    def test_coefficients_match_scipy(self):
        b, a = butter_lowpass_coeffs(3, 0.5, 30.0)
        b_sp, a_sp = sp_butter(3, 0.5 / 15.0, btype="low")
        np.testing.assert_allclose(np.asarray(b), b_sp, atol=1e-6)
        np.testing.assert_allclose(np.asarray(a), a_sp, atol=1e-6)

    def test_filtfilt_matches_scipy(self):
        # The exact reference smooth_imu parameters (isam.py:271-287).
        rng = np.random.default_rng(0)
        x = np.cumsum(rng.normal(size=(300, 6)), axis=0).astype(np.float32)
        ours = np.asarray(smooth_imu(x))
        b_sp, a_sp = sp_butter(3, 0.5 / 15.0)
        ref = sp_filtfilt(b_sp, a_sp, x.T).T
        rel = np.abs(ours - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 1e-3, rel


def test_gravity_compensate():
    # Level orientation: measured specific force (0,0,+g) -> zero linear acc.
    q = jnp.array([1.0, 0, 0, 0])
    acc = jnp.array([0.0, 0.0, 9.81])
    out = np.asarray(gravity_compensate(acc, q))
    np.testing.assert_allclose(out, np.zeros(3), atol=1e-6)
    # Arbitrary orientation: compensation inverts the rotated gravity.
    q = so3_exp(jnp.array([0.3, -0.2, 0.5]))
    from uslam_tpu.geometry.so3 import quat_conjugate

    f = -quat_rotate(quat_conjugate(q), jnp.array([0.0, 0.0, -9.81]))
    out = np.asarray(gravity_compensate(f, q))
    np.testing.assert_allclose(out, np.zeros(3), atol=1e-5)


def test_sequence_roundtrip(tmp_path):
    seq = generate_synthetic_sequence(SyntheticSpec(duration=2.0))
    p = str(tmp_path / "seq.npz")
    save_sequence(p, seq)
    seq2 = load_sequence(p)
    np.testing.assert_allclose(seq2.imu_acc, seq.imu_acc)
    np.testing.assert_allclose(seq2.dvl_pose_pos, seq.dvl_pose_pos)
    assert len(seq2.features) == len(seq.features)
    np.testing.assert_allclose(seq2.features[3].u0, seq.features[3].u0)


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(5.0), "b": (jnp.ones(3), jnp.zeros((2, 2)))}
    p = str(tmp_path / "ck.npz")
    save_state(p, tree)
    out = load_state(p, tree)
    np.testing.assert_allclose(np.asarray(out["a"]), np.arange(5.0))
    np.testing.assert_allclose(np.asarray(out["b"][0]), np.ones(3))


def test_image_dir_loader(tmp_path):
    from uslam_tpu.io.images import load_stereo_image_dirs

    ld, rd = tmp_path / "left", tmp_path / "right"
    ld.mkdir(); rd.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        np.save(ld / f"{i:06d}.npy", rng.uniform(0, 255, (24, 32)).astype(np.float32))
        np.save(rd / f"{i:06d}.npy", rng.uniform(0, 255, (24, 32)).astype(np.float32))
    t, left, right = load_stereo_image_dirs(str(ld), str(rd), rate_hz=5.0)
    assert left.shape == (3, 24, 32) and right.shape == (3, 24, 32)
    np.testing.assert_allclose(t, [0.0, 0.2, 0.4])

    import pytest as _pytest
    cv2 = _pytest.importorskip("cv2")
    # png path via cv2
    img = rng.uniform(0, 255, (24, 32)).astype(np.uint8)
    cv2.imwrite(str(ld / "zzz.png"), img)
    from uslam_tpu.io.images import _decode
    out = _decode(str(ld / "zzz.png"))
    np.testing.assert_allclose(out, img.astype(np.float32))
