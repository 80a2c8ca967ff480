from bliss_tpu.utils.logging import get_logger, log_event
from bliss_tpu.utils.profiling import StageTimer, trace_annotation
from bliss_tpu.utils.debug import nan_debugging, validate_features

__all__ = [
    "get_logger",
    "log_event",
    "StageTimer",
    "trace_annotation",
    "nan_debugging",
    "validate_features",
]
