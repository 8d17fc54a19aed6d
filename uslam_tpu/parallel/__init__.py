"""Multi-chip sharding (SURVEY.md §2.2).

The problem's natural parallel axes: data-parallel front-end over frames
(no communication) and landmark-sharded Schur elimination with one psum of
the reduced camera system over the ICI mesh."""

from uslam_tpu.parallel.frames import (  # noqa: F401
    extract_orb_frames_sharded,
    process_stereo_pairs_sharded,
)
from uslam_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_landmarks,
    sharded_lm_step,
    sharded_optimize_lm,
)
