"""Native C++ ingestion kernels vs their Python/numpy references."""

import numpy as np
import pytest

from uslam_tpu import native
from uslam_tpu.io.timesync import approximate_time_join as py_join


@pytest.fixture(scope="module")
def have_native():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_time_join_matches_python(have_native):
    rng = np.random.default_rng(0)
    pivot = np.sort(rng.uniform(0, 30, 100))
    s1 = np.sort(rng.uniform(0, 30, 120))
    s2 = np.sort(rng.uniform(0, 30, 90))
    for streams in ([s1], [s1, s2]):
        ours = native.approx_time_join(pivot, streams, 0.2)
        ref = py_join(pivot, streams, 0.2)
        assert ours == ref


def test_intern_ids(have_native):
    ids = np.array([5, 7, 5, 9, 7, 7, 1], np.int64)
    rows, m = native.intern_ids(ids)
    assert m == 4
    np.testing.assert_array_equal(rows, [0, 1, 0, 2, 1, 1, 3])


def test_pack_imu_intervals(have_native):
    rng = np.random.default_rng(1)
    imu = rng.normal(size=(50, 6))
    lo = np.array([0, 10, 45], np.int64)
    hi = np.array([10, 45, 45], np.int64)
    out, mask = native.pack_imu_intervals(imu, lo, hi, S=16, dt=0.005)
    assert out.shape == (3, 16, 7)
    np.testing.assert_array_equal(mask, [1.0, 1.0, 0.0])
    np.testing.assert_allclose(out[0, :10, :6], imu[:10])
    np.testing.assert_allclose(out[0, 10:, :], 0.0)
    # interval 1 capped at S=16 of 35 samples
    np.testing.assert_allclose(out[1, :16, :6], imu[10:26])
    assert (out[0, :10, 6] == 0.005).all()


def test_imu_whiteners_matches_numpy():
    """Native C++ whitener recursion == vectorized-numpy reference to f64
    rounding (the ingest hot spot; graph/builder picks native when built)."""
    if not native.whitener_available():
        import pytest

        pytest.skip("no toolchain")
    from uslam_tpu.config import UslamConfig
    from uslam_tpu.factors.imu import ImuIntervalData
    from uslam_tpu.graph.builder import _whiteners_numpy

    rng = np.random.default_rng(3)
    F, S = 17, 24
    acc = rng.normal(0, 2, (F, S, 3))
    acc[..., 2] += 9.81
    gyro = rng.normal(0, 0.3, (F, S, 3))
    dt = np.full((F, S), 0.005)
    counts = rng.integers(0, S + 1, F)   # include empty intervals
    mask = np.arange(S)[None, :] < counts[:, None]
    acc *= mask[..., None]
    gyro *= mask[..., None]
    dt *= mask
    cfg = UslamConfig()
    ref = _whiteners_numpy(
        ImuIntervalData(acc=acc, gyro=gyro, dt=dt),
        cfg.imu.accel_cov, cfg.imu.gyro_cov, cfg.imu.integration_cov,
    )
    got = native.imu_whiteners(
        acc, gyro, dt,
        cfg.imu.accel_cov, cfg.imu.gyro_cov, cfg.imu.integration_cov,
    )
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12 * np.abs(ref).max())
