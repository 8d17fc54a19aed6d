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
