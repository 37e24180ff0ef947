"""Utilities: profiling, metric logging, reproducibility."""

from deepbedmap_tpu.utils.profiling import trace, timed  # noqa: F401
from deepbedmap_tpu.utils.logging import MetricLogger  # noqa: F401
from deepbedmap_tpu.utils.tracking import (  # noqa: F401
    HTTPTracker,
    LocalTracker,
    MultiTracker,
    Tracker,
    download_model_weights,
)
