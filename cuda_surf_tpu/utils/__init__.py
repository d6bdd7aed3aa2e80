from .timing import Timer, benchmark
from .metrics import MetricsLogger

__all__ = ["Timer", "benchmark", "MetricsLogger"]
