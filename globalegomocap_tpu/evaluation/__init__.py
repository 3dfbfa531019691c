"""On-device evaluation: the 17-metric MPJPE suite."""

from globalegomocap_tpu.evaluation.metrics import (
    calculate_errors, mpjpe, camera_position_error,
    align_sequence_globally, align_per_frame, METRIC_KEYS)
