"""Offline approximate time synchronization.

Reproduces the semantics of ROS ``message_filters.ApproximateTimeSynchronizer``
over [odom, dvl, features] with queue 10 and slop 0.2 s (reference
batch.py:321-326): emit a triple when three messages (one per stream) exist
whose stamps all lie within the slop window; each message is consumed by at
most one triple. Keyframe cadence in the reference is defined by these
triples (SURVEY.md C14).

Offline we can do the optimal greedy join: walk the *pivot* stream (the
feature frames — the scarcest stream) and pick the nearest unconsumed
neighbor in each other stream, accepting iff max-stamp − min-stamp <= slop.
"""

from __future__ import annotations

import numpy as np


def _nearest_after(t_query: float, ts: np.ndarray, used_until: int) -> int | None:
    """Index of the element of ts[used_until:] nearest to t_query."""
    if used_until >= len(ts):
        return None
    i = int(np.searchsorted(ts, t_query, side="left"))
    i = max(i, used_until)
    best, best_d = None, np.inf
    for j in (i - 1, i):
        if used_until <= j < len(ts):
            d = abs(float(ts[j]) - t_query)
            if d < best_d:
                best, best_d = j, d
    return best


def approximate_time_join(
    pivot_t: np.ndarray,
    other_ts: list[np.ndarray],
    slop: float = 0.2,
) -> list[tuple[int, list[int]]]:
    """Greedy in-order join.

    Returns a list of (pivot_index, [other_stream_indices]) for accepted
    triples. Streams must be sorted by time. Each non-pivot element is
    consumed at most once (monotone cursors), matching the synchronizer's
    queue semantics for in-order playback.
    """
    cursors = [0] * len(other_ts)
    out = []
    for pi in range(len(pivot_t)):
        t = float(pivot_t[pi])
        picks = []
        ok = True
        for s, ts in enumerate(other_ts):
            j = _nearest_after(t, ts, cursors[s])
            if j is None:
                ok = False
                break
            picks.append(j)
        if not ok:
            break
        stamps = [t] + [float(other_ts[s][picks[s]]) for s in range(len(other_ts))]
        if max(stamps) - min(stamps) <= slop:
            out.append((pi, picks))
            for s in range(len(other_ts)):
                cursors[s] = picks[s] + 1
    return out


def slice_stream(ts: np.ndarray, t_lo: float, t_hi: float) -> slice:
    """Half-open [t_lo, t_hi) index slice of a sorted stamp array (used to
    gather the IMU samples buffered between consecutive keyframes, the role
    of the reference's imu_data buffer swap at batch.py:261-262)."""
    lo = int(np.searchsorted(ts, t_lo, side="left"))
    hi = int(np.searchsorted(ts, t_hi, side="left"))
    return slice(lo, hi)
