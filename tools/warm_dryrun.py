"""Pre-warm the CPU persistent compile cache for the driver's multichip check.

Runs the EXACT ``__graft_entry__.dryrun_multichip(8)`` call the driver makes,
which bootstraps the forced-8-device CPU child and populates
``/root/.cache/uslam_jax_cache_cpu`` with every program the dry run compiles
(the sharded banded-LM while_loop alone is >10 min cold on this 1-core box;
warm replay reloads in seconds per program — CLAUDE.md). Run this once after
ANY solver/frontend change that invalidates the cache, so the end-of-round
driver check replays in minutes instead of timing out mid-compile
(VERDICT r3: a 590 s budget was killed still compiling).

Usage: python tools/warm_dryrun.py [n_devices]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    t0 = time.perf_counter()
    __graft_entry__.dryrun_multichip(n)
    # Record the source-tree token so the next dryrun_multichip can detect
    # (and WARN about) a compute-path edit that invalidated the cache.
    token = __graft_entry__.compute_warm_token()
    os.makedirs(os.path.dirname(__graft_entry__._WARM_STAMP), exist_ok=True)
    with open(__graft_entry__._WARM_STAMP, "w") as f:
        f.write(token + "\n")
    print(f"warm_dryrun: dryrun_multichip({n}) completed in "
          f"{time.perf_counter() - t0:.0f}s (cache warm, stamp {token})")


if __name__ == "__main__":
    main()
