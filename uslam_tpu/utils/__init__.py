"""Runtime utilities: structured logging, profiling/tracing hooks,
checkpoint/resume, NaN sanitization (SURVEY.md §5 auxiliary subsystems)."""

from uslam_tpu.utils.logging import get_logger  # noqa: F401
from uslam_tpu.utils.profiling import stage_timer, Profiler  # noqa: F401
from uslam_tpu.utils.checkpoint import save_state, load_state  # noqa: F401
