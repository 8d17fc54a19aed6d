"""On-device comparison of the Pallas frontend kernels vs the XLA paths.

Decides whether FrontendConfig.use_pallas should default on (CLAUDE.md
backlog: 'profile on-device before making use_pallas the default').

Usage: PYTHONPATH=. python tools/profile_frontend.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=20, warm=2, name=""):
    for _ in range(warm):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"  {name:44s} {dt:8.2f} ms")
    return dt


def main():
    print(f"backend={jax.default_backend()}")
    from uslam_tpu.config import FrontendConfig
    from uslam_tpu.frontend.fast import fast_corners, harris_response
    from uslam_tpu.frontend.match import hamming_distance_matrix
    from uslam_tpu.frontend.orb import extract_orb_batch
    from uslam_tpu.frontend.pallas_kernels import fast_harris_pallas, hamming_matrix_pallas

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (1080, 1920)), jnp.float32)

    xla_fn = jax.jit(lambda im: (fast_corners(im, 10.0), harris_response(im)))
    pl_fn = jax.jit(lambda im: fast_harris_pallas(im, 10.0))
    # correctness on this backend (interior; borders differ by design)
    cx, hx = jax.block_until_ready(xla_fn(img))
    cp, hp = jax.block_until_ready(pl_fn(img))
    inner = np.s_[8:-8, 8:-8]
    ok_c = bool(np.array_equal(np.asarray(cp != 0)[inner], np.asarray(cx)[inner]))
    ok_h = bool(np.allclose(np.asarray(hp)[inner], np.asarray(hx)[inner], rtol=1e-3, atol=1e-1))
    print(f"  correctness vs XLA: corners={'OK' if ok_c else 'MISMATCH'} harris={'OK' if ok_h else 'MISMATCH'}")
    timeit(xla_fn, img, name="FAST+Harris XLA @1080p")
    timeit(pl_fn, img, name="FAST+Harris Pallas @1080p")

    for nk in (64, 512, 2048):
        da = jnp.asarray(rng.integers(0, 2**32, (nk, 8), dtype=np.uint64).astype(np.uint32))
        db = jnp.asarray(rng.integers(0, 2**32, (nk, 8), dtype=np.uint64).astype(np.uint32))
        xf = jax.jit(hamming_distance_matrix)
        pf = jax.jit(hamming_matrix_pallas)
        timeit(xf, da, db, name=f"hamming XLA {nk}x{nk}")
        timeit(pf, da, db, name=f"hamming Pallas {nk}x{nk}")

    pair = jnp.stack([img, img])
    for flag in (False, True):
        cfg = FrontendConfig(use_pallas=flag)
        fn = jax.jit(lambda p, c=cfg: extract_orb_batch(p, c))
        timeit(fn, pair, name=f"extract_orb_batch(stereo pair) use_pallas={flag}")


if __name__ == "__main__":
    main()
