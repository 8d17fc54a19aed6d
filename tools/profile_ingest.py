"""Profile pack_sequence (the bench's ingest phase) stage by stage.

Ingest is pure host-side numpy (CLAUDE.md: zero XLA in the pack path), so
profiling on any host is representative of the TPU bench's ingest wall
clock minus the single device_put at the end.

Run: PYTHONPATH=. python tools/profile_ingest.py [--poses 1000]
"""

from __future__ import annotations

import argparse
import cProfile
import pstats
import time

import jax

jax.config.update("jax_platforms", "cpu")

from uslam_tpu.config import UslamConfig  # noqa: E402
from uslam_tpu.graph.packing import pack_sequence  # noqa: E402
from uslam_tpu.io.synthetic import SyntheticSpec, generate_synthetic_sequence  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=1000)
    ap.add_argument("--landmarks", type=int, default=512)
    args = ap.parse_args()

    spec = SyntheticSpec(
        duration=args.poses / 5.0,
        keyframe_rate=5.0,
        num_landmarks=args.landmarks,
        omega=0.15,
        odom_drift_rate=0.02,
        feature_noise_px=0.3,
        seed=0,
    )
    t0 = time.perf_counter()
    seq = generate_synthetic_sequence(spec)
    print(f"generate: {time.perf_counter() - t0:.2f}s")

    cfg = UslamConfig()
    # Warm (interning caches, imports) then profile.
    t0 = time.perf_counter()
    pack_sequence(seq, cfg)
    print(f"pack (1st): {time.perf_counter() - t0:.2f}s")
    t0 = time.perf_counter()
    pack_sequence(seq, cfg)
    print(f"pack (2nd): {time.perf_counter() - t0:.2f}s")

    prof = cProfile.Profile()
    prof.enable()
    pack_sequence(seq, cfg)
    prof.disable()
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    main()
