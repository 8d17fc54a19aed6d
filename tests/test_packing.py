"""Vectorized packer vs the reference-shaped GraphBuilder path: the two
ingestion paths must produce the same factor graph and the same solution."""

import jax
import numpy as np

from uslam_tpu.config import UslamConfig
from uslam_tpu.io.synthetic import SyntheticSpec, generate_synthetic_sequence
from uslam_tpu.pipeline import run_sequence


def test_pack_matches_builder_path():
    seq = generate_synthetic_sequence(
        SyntheticSpec(duration=4.0, odom_drift_rate=0.03, num_landmarks=60, seed=11)
    )
    cfg = UslamConfig()
    r_fast = run_sequence(seq, cfg, fast_ingest=True)
    r_slow = run_sequence(seq, cfg, fast_ingest=False)

    # Same graph arrays (leaf-for-leaf).
    fast_leaves = jax.tree.leaves(r_fast.graph)
    slow_leaves = jax.tree.leaves(r_slow.graph)
    assert len(fast_leaves) == len(slow_leaves)
    for a, b in zip(fast_leaves, slow_leaves):
        assert a.shape == b.shape, (a.shape, b.shape)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # Same solution basin (bit-level graph differences let the LM wander
    # mm-level in weakly observable directions).
    np.testing.assert_allclose(
        np.asarray(r_fast.values.pose_trans),
        np.asarray(r_slow.values.pose_trans),
        atol=2e-2,
    )
    np.testing.assert_allclose(r_fast.odom_compare, r_slow.odom_compare, atol=1e-9)


def test_numpy_whitener_matches_jit():
    """The vectorized f64 numpy whitener (production ingest path) must match
    the jitted preintegrate_with_cov + whitener_from_cov oracle."""
    import numpy as np

    from uslam_tpu.config import UslamConfig
    from uslam_tpu.factors.imu import ImuIntervalData
    from uslam_tpu.graph.builder import _whitener_fn, _whiteners_numpy

    rng = np.random.default_rng(0)
    F, S = 6, 16
    acc = rng.normal(0, 2, (F, S, 3))
    gyro = rng.normal(0, 0.5, (F, S, 3))
    dt = np.full((F, S), 0.005)
    # padding tails + a fully padded interval (mask-0 case)
    for i in range(F):
        k = rng.integers(3, S)
        acc[i, k:] = 0.0
        gyro[i, k:] = 0.0
        dt[i, k:] = 0.0
    acc[3], gyro[3], dt[3] = 0.0, 0.0, 0.0

    data32 = ImuIntervalData(
        acc=np.asarray(acc, np.float32),
        gyro=np.asarray(gyro, np.float32),
        dt=np.asarray(dt, np.float32),
    )
    cfg = UslamConfig()
    ref = np.asarray(
        _whitener_fn(cfg.imu.accel_cov, cfg.imu.gyro_cov, cfg.imu.integration_cov)(
            data32
        )
    )
    ours = _whiteners_numpy(
        ImuIntervalData(acc=acc, gyro=gyro, dt=dt),
        cfg.imu.accel_cov, cfg.imu.gyro_cov, cfg.imu.integration_cov,
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3 * np.abs(ref).max())


def test_packed_pytree_roundtrip():
    """PackedPytree (the consolidated 2-buffer upload) must reconstruct the
    original pytree exactly — shapes, dtypes, 0-d scalars, values — both
    eagerly and through a jit boundary."""
    import jax

    from uslam_tpu.graph.packing import PackedPytree

    rng = np.random.default_rng(0)
    tree = {
        "a": rng.normal(size=(3, 4)).astype(np.float32),
        "b": np.int32(7),
        "c": (
            rng.integers(0, 9, size=(5,)).astype(np.int32),
            np.float32(2.5),
            rng.normal(size=()).astype(np.float32),
        ),
    }
    packed = PackedPytree.pack(tree)
    assert len(packed.bufs) == 2  # one buffer per dtype

    def check(out):
        flat0, td0 = jax.tree.flatten(tree)
        flat1, td1 = jax.tree.flatten(out)
        assert td0 == td1
        for a, b in zip(flat0, flat1):
            a = np.asarray(a)
            assert a.shape == np.asarray(b).shape, (a.shape, np.asarray(b).shape)
            assert a.dtype == np.asarray(b).dtype
            np.testing.assert_array_equal(a, np.asarray(b))

    check(packed.unpack())
    check(jax.jit(lambda p: p.unpack())(packed))


def test_stratified_obs_mask():
    """Budget keeps min(count, cap) EVENLY SPACED obs per group — the last
    (loop-closure) observations of a long track must survive."""
    from uslam_tpu.graph.packing import stratified_obs_mask

    # Group 7 has 10 obs, cap 4 -> exactly 4 kept, spread over the track.
    keys = np.array([7] * 10 + [3] * 2 + [5])
    mask = stratified_obs_mask(keys, 4)
    assert mask[10:].all()                       # under-budget groups intact
    kept = np.nonzero(mask[:10])[0]
    assert len(kept) == 4
    assert kept[-1] == 9                         # the LAST obs survives
    assert np.diff(kept).max() <= 4              # evenly spread, no big gap

    # cap >= count keeps everything.
    assert stratified_obs_mask(np.array([1, 1, 2]), 8).all()
    # Empty input.
    assert stratified_obs_mask(np.zeros(0, int), 4).shape == (0,)

    # Interleaved groups: per-group occurrence order is what's decimated.
    keys = np.tile(np.array([0, 1]), 20)         # two groups of 20, interleaved
    mask = stratified_obs_mask(keys, 5)
    assert mask.sum() == 10
    assert mask[keys == 0].sum() == 5 and mask[keys == 1].sum() == 5


def test_mavros_velocity_initialization():
    """A sequence carrying /mavros/local_position/velocity_local changes the
    velocity initialization: per-keyframe nearest-sample init + V(0) prior
    mean (reference isam.py:306,319-328); absent stream -> zeros
    (batch.py:279). Stale samples (outside the sync slop) fall back to 0."""
    from uslam_tpu.graph.packing import _nearest_within_slop, pack_sequence

    cfg = UslamConfig()
    spec = SyntheticSpec(duration=4.0, num_landmarks=32, seed=4)
    seq = generate_synthetic_sequence(spec)

    # Without the stream: zero-velocity init (reference batch semantics).
    _, init0, _, _ = pack_sequence(seq, cfg)
    assert not np.asarray(init0.vel).any()

    # With the stream (ground-truth velocities as the mavros samples).
    seq.mavros_vel_t = np.asarray(seq.gt_t, np.float64)
    seq.mavros_vel = np.asarray(seq.gt_vel, np.float64)
    graph1, init1, _, _ = pack_sequence(seq, cfg)
    n = init1.num_poses
    np.testing.assert_allclose(
        np.asarray(init1.vel), seq.gt_vel[:n].astype(np.float32), atol=1e-6
    )
    # V(0) prior mean follows the measured velocity.
    np.testing.assert_allclose(
        np.asarray(graph1.priors.vel), seq.gt_vel[0].astype(np.float32),
        atol=1e-6,
    )

    # Nearest-join slop gating: stale stream -> zeros.
    t = np.array([0.0, 1.0, 2.0])
    sv = np.arange(9, dtype=float).reshape(3, 3) + 1.0
    out = _nearest_within_slop(np.array([0.05, 5.0]), t, sv, slop=0.2)
    np.testing.assert_allclose(out[0], sv[0])
    np.testing.assert_allclose(out[1], 0.0)
