"""Keep the axon TPU tunnel provisioned between benchmark runs.

The tunnel initializes the remote TPU lazily at a process's first array op.
Measured cost of that first contact on this box (r5): ~10-25 s when the
tunnel was used recently, ~160 s after ~30 min idle, ~480 s after ~1.7 h
idle — and the r4 driver benchmark lost ~800 s to it, skipping every
optional evidence block. Running this daemon through the end of a build
round keeps the driver's subsequent `python bench.py` in the warm tier.

Design:
- Each probe runs in a FRESH subprocess (one tiny device_put + get), so a
  broken client can never wedge the daemon and every probe measures the
  true first-contact cost.
- Probes are skipped while /tmp/uslam_tpu_active is fresh: bench.py touches
  that sentinel on every log line, so a live benchmark run (ours or the
  driver's) is never interleaved with probe traffic; a fresh sentinel also
  means the tunnel is already warm.
- Stops at the deadline (argv[1] seconds, default 12 h) or when
  /tmp/uslam_keepwarm_stop exists.

Usage: setsid nohup python tools/keepwarm_tpu.py 43200 \
           > /tmp/keepwarm.log 2>&1 &   # detached; stop via the stop file
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

SENTINEL = "/tmp/uslam_tpu_active"
STOP = "/tmp/uslam_keepwarm_stop"
PROBE = (
    "import numpy, jax;"
    "jax.block_until_ready(jax.device_put(numpy.float32(0)));"
    "print(jax.default_backend())"
)
INTERVAL_S = 270.0
SENTINEL_FRESH_S = 600.0


def _fresh(path: str, horizon: float) -> bool:
    try:
        return (time.time() - os.path.getmtime(path)) < horizon
    except OSError:
        return False


def main() -> None:
    deadline = time.time() + (
        float(sys.argv[1]) if len(sys.argv) > 1 else 12 * 3600.0
    )
    print(f"[keepwarm] up; deadline in {deadline - time.time():.0f}s", flush=True)
    while time.time() < deadline:
        if os.path.exists(STOP):
            print("[keepwarm] stop file present; exiting", flush=True)
            return
        if _fresh(SENTINEL, SENTINEL_FRESH_S):
            print("[keepwarm] sentinel fresh; skipping probe", flush=True)
        else:
            t0 = time.time()
            try:
                r = subprocess.run(
                    [sys.executable, "-c", PROBE],
                    capture_output=True, text=True, timeout=900,
                )
                print(
                    f"[keepwarm] probe rc={r.returncode} "
                    f"{time.time() - t0:.1f}s {r.stdout.strip()!r}",
                    flush=True,
                )
            except Exception as e:
                print(f"[keepwarm] probe failed: {e}", flush=True)
        time.sleep(INTERVAL_S)
    print("[keepwarm] deadline reached; exiting", flush=True)


if __name__ == "__main__":
    main()
