from bliss_tpu.utils.logging import get_logger, log_event
from bliss_tpu.utils.profiling import StageTimer, trace_annotation

__all__ = ["get_logger", "log_event", "StageTimer", "trace_annotation"]
