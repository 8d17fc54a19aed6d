"""Sequence IO: framework-agnostic replacement for ROS bag ingest.

The reference consumes five ROS topics through callbacks and an
ApproximateTimeSynchronizer (reference batch.py:319-326). Here a
:class:`SensorSequence` holds the same streams as time-stamped arrays
(loadable from npz), :mod:`timesync` reproduces the 3-way approximate join
(slop 0.2 s), :mod:`rosbag` reads actual ROS1 ``.bag`` files without a ROS
installation, and :mod:`synthetic` generates physically-consistent test
sequences (the recorded bagfile that drives the reference is private —
reference README.md:52 — so synthetic data is the e2e oracle, SURVEY.md §4).
"""

from uslam_tpu.io.sequence import (  # noqa: F401
    FeatureFrame,
    SensorSequence,
    load_sequence,
    save_sequence,
)
from uslam_tpu.io.rosbag import BagTopics, bag_to_sequence, read_bag  # noqa: F401
from uslam_tpu.io.timesync import approximate_time_join  # noqa: F401
from uslam_tpu.io.synthetic import SyntheticSpec, generate_synthetic_sequence  # noqa: F401
