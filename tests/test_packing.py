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
