from .trace import Trace, trace_report, trace_reset
from .log import Log

__all__ = ["Trace", "trace_report", "trace_reset", "Log"]
