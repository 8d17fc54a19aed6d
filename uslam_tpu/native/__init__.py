"""Native (C++) host runtime: build-on-demand ctypes bindings.

The compute path is JAX/XLA/Pallas on the TPU; this package is the native
host-side runtime layer — the role ROS's C++ transport/synchronization
plays in the reference (batch.py:321-326). Compiled lazily with g++ and
cached beside the source; every entry point has a numpy fallback so the
framework works without a toolchain (``available()`` reports which is
active).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "ingest.cpp")
_SO = os.path.join(_HERE, "libuslam_ingest.so")
_BAG_SRC = os.path.join(_HERE, "bagparse.cpp")
_BAG_SO = os.path.join(_HERE, "libuslam_bagparse.so")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False
_BAG_LIB = None
_BAG_TRIED = False


def _ensure_built(src: str, so: str, opt: str = "-O2") -> None:
    """(Re)compile ``src`` -> ``so`` when the source content changed.

    Invalidation is hash-based, not mtime-based: on a fresh checkout every
    file shares the checkout mtime, so a stale shipped binary could mask
    source edits. The sha256 of (source bytes + compile flags) is stamped
    beside the .so; any mismatch (or missing stamp) forces a rebuild.
    """
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read() + opt.encode()).hexdigest()
    stamp = so + ".sha256"
    if os.path.exists(so) and os.path.exists(stamp):
        with open(stamp) as f:
            if f.read().strip() == digest:
                return
    subprocess.run(
        ["g++", opt, "-shared", "-fPIC", src, "-o", so],
        check=True,
        capture_output=True,
    )
    with open(stamp, "w") as f:
        f.write(digest)


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            _ensure_built(_SRC, _SO)
            lib = ctypes.CDLL(_SO)
            i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
            lib.approx_time_join2.restype = ctypes.c_int64
            lib.approx_time_join2.argtypes = [
                f64p, ctypes.c_int64, f64p, ctypes.c_int64, f64p, ctypes.c_int64,
                ctypes.c_double, i64p, i64p, i64p,
            ]
            lib.intern_ids.restype = ctypes.c_int64
            lib.intern_ids.argtypes = [i64p, ctypes.c_int64, i64p]
            lib.pack_imu_intervals.restype = None
            lib.pack_imu_intervals.argtypes = [
                f64p, ctypes.c_int64, i64p, i64p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_double, f64p, f64p,
            ]
            _LIB = lib
        except Exception:  # toolchain missing / build failure -> fallback
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


def _load_bag():
    global _BAG_LIB, _BAG_TRIED
    with _LOCK:
        if _BAG_LIB is not None or _BAG_TRIED:
            return _BAG_LIB
        _BAG_TRIED = True
        try:
            _ensure_built(_BAG_SRC, _BAG_SO)
            lib = ctypes.CDLL(_BAG_SO)
            u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
            i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
            lib.bag_scan_records.restype = ctypes.c_int64
            lib.bag_scan_records.argtypes = [
                u8p, ctypes.c_int64, ctypes.c_int64,
                i64p, i64p, f64p, i64p, i64p, i64p, i64p,
            ]
            lib.bag_decode_fixed.restype = ctypes.c_int64
            lib.bag_decode_fixed.argtypes = [
                u8p, ctypes.c_int64, i64p, i64p, ctypes.c_int64,
                i64p, ctypes.c_int64, ctypes.c_int64, f64p,
            ]
            _BAG_LIB = lib
        except Exception:  # toolchain missing / build failure -> fallback
            _BAG_LIB = None
        return _BAG_LIB


def bag_available() -> bool:
    return _load_bag() is not None


_WHT_SRC = os.path.join(_HERE, "whitener.cpp")
_WHT_SO = os.path.join(_HERE, "libuslam_whitener.so")
_WHT_LIB = None
_WHT_TRIED = False


def _load_whitener():
    global _WHT_LIB, _WHT_TRIED
    with _LOCK:
        if _WHT_LIB is not None or _WHT_TRIED:
            return _WHT_LIB
        _WHT_TRIED = True
        try:
            _ensure_built(_WHT_SRC, _WHT_SO, opt="-O3")
            lib = ctypes.CDLL(_WHT_SO)
            f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
            lib.imu_whiteners.restype = None
            lib.imu_whiteners.argtypes = [
                f64p, f64p, f64p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_double, ctypes.c_double, ctypes.c_double, f64p,
            ]
            _WHT_LIB = lib
        except Exception:  # toolchain missing / build failure -> fallback
            _WHT_LIB = None
        return _WHT_LIB


def whitener_available() -> bool:
    return _load_whitener() is not None


def imu_whiteners(acc, gyro, dt, accel_cov, gyro_cov, integration_cov):
    """Preintegration whiteners inv(chol(P)) over intervals, (F,9,9) f64.

    Native C++ recursion (semantics of graph/builder._whiteners_numpy);
    returns None when the toolchain is unavailable so the caller can fall
    back to the vectorized numpy path.
    """
    lib = _load_whitener()
    if lib is None:
        return None
    acc = np.ascontiguousarray(acc, np.float64)
    gyro = np.ascontiguousarray(gyro, np.float64)
    dt = np.ascontiguousarray(dt, np.float64)
    F, S, _ = acc.shape
    out = np.empty((F, 9, 9), np.float64)
    lib.imu_whiteners(
        acc, gyro, dt, F, S, accel_cov, gyro_cov, integration_cov, out
    )
    return out


def bag_scan_records(buf: np.ndarray):
    """Scan rosbag records in a contiguous uint8 buffer.

    Returns (ops, conns, times, h_off, h_len, d_off, d_len) int64/f64 arrays
    (offsets relative to ``buf``), or None when the native lib is missing.
    """
    lib = _load_bag()
    if lib is None:
        return None
    buf = np.ascontiguousarray(buf, np.uint8)
    # Records are >= 17 bytes (two length words + minimal op header + data);
    # cap generously.
    cap = max(len(buf) // 17, 16)
    ops = np.empty(cap, np.int64)
    conns = np.empty(cap, np.int64)
    times = np.empty(cap, np.float64)
    h_off = np.empty(cap, np.int64)
    h_len = np.empty(cap, np.int64)
    d_off = np.empty(cap, np.int64)
    d_len = np.empty(cap, np.int64)
    n = lib.bag_scan_records(
        buf, len(buf), cap, ops, conns, times, h_off, h_len, d_off, d_len
    )
    sl = slice(0, n)
    return (ops[sl], conns[sl], times[sl], h_off[sl], h_len[sl], d_off[sl], d_len[sl])


def bag_decode_fixed(buf: np.ndarray, offs, lens, prog, out_w: int):
    """Decode fixed-layout messages with the (opcode, arg) op program.

    Returns (out (n, out_w) float64, n_decoded); None if lib missing.
    """
    lib = _load_bag()
    if lib is None:
        return None
    buf = np.ascontiguousarray(buf, np.uint8)
    offs = np.ascontiguousarray(offs, np.int64)
    lens = np.ascontiguousarray(lens, np.int64)
    prog = np.ascontiguousarray(np.asarray(prog, np.int64).reshape(-1))
    out = np.zeros((len(offs), out_w), np.float64)
    n = lib.bag_decode_fixed(
        buf, len(buf), offs, lens, len(offs), prog, len(prog) // 2, out_w, out
    )
    return out, int(n)


def approx_time_join(pivot_t, other_ts, slop: float):
    """Native variant of io.timesync.approximate_time_join (1-2 streams).

    Returns list of (pivot_idx, [other_idx...]) like the Python version.
    """
    lib = _load()
    if lib is None or len(other_ts) not in (1, 2):
        from uslam_tpu.io.timesync import approximate_time_join as py_join

        return py_join(np.asarray(pivot_t), [np.asarray(o) for o in other_ts], slop)

    pivot = np.ascontiguousarray(pivot_t, np.float64)
    s1 = np.ascontiguousarray(other_ts[0], np.float64)
    s2 = (
        np.ascontiguousarray(other_ts[1], np.float64)
        if len(other_ts) == 2
        else np.zeros(0)
    )
    cap = len(pivot)
    op = np.empty(cap, np.int64)
    o1 = np.empty(cap, np.int64)
    o2 = np.empty(cap, np.int64)
    n = lib.approx_time_join2(
        pivot, len(pivot), s1, len(s1), s2, len(s2), slop, op, o1, o2
    )
    if len(other_ts) == 1:
        return [(int(op[i]), [int(o1[i])]) for i in range(n)]
    return [(int(op[i]), [int(o1[i]), int(o2[i])]) for i in range(n)]


def intern_ids(ids) -> tuple[np.ndarray, int]:
    """ids (n,) int64 -> (dense rows (n,), num_unique), first-appearance order."""
    lib = _load()
    ids = np.ascontiguousarray(ids, np.int64)
    if lib is None:
        uniq: dict[int, int] = {}
        rows = np.empty(len(ids), np.int64)
        for i, v in enumerate(ids):
            rows[i] = uniq.setdefault(int(v), len(uniq))
        return rows, len(uniq)
    rows = np.empty(len(ids), np.int64)
    m = lib.intern_ids(ids, len(ids), rows)
    return rows, int(m)


def pack_imu_intervals(imu_6col, lo, hi, S: int, dt: float):
    """(T, 6) float64 + interval bounds -> ((n_int, S, 7), mask (n_int,))."""
    imu = np.ascontiguousarray(imu_6col, np.float64)
    lo = np.ascontiguousarray(lo, np.int64)
    hi = np.ascontiguousarray(hi, np.int64)
    n_int = len(lo)
    lib = _load()
    out = np.zeros((n_int, S, 7))
    mask = np.zeros(n_int)
    if lib is None:
        for i in range(n_int):
            a, b = int(lo[i]), min(int(hi[i]), int(lo[i]) + S)
            c = max(b - a, 0)
            if c:
                out[i, :c, :6] = imu[a : a + c]
                out[i, :c, 6] = dt
                mask[i] = 1.0
        return out, mask
    lib.pack_imu_intervals(imu, len(imu), lo, hi, n_int, S, dt, out, mask)
    return out, mask
