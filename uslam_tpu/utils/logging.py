"""Structured logging.

The reference observability surface is ``rospy.logerr`` + bare prints
(reference batch.py:51,66,367); here one stdlib logger hierarchy under
``uslam``. Set env ``USLAM_LOG=DEBUG`` to raise verbosity.
"""

from __future__ import annotations

import logging
import os
import sys

_CONFIGURED = False


def _configure() -> None:
    global _CONFIGURED
    if _CONFIGURED:
        return
    root = logging.getLogger("uslam")
    level = os.environ.get("USLAM_LOG", "INFO").upper()
    root.setLevel(getattr(logging, level, logging.INFO))
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(
        logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s", "%H:%M:%S")
    )
    root.addHandler(handler)
    root.propagate = False
    _CONFIGURED = True


def get_logger(name: str) -> logging.Logger:
    _configure()
    return logging.getLogger(f"uslam.{name}")
