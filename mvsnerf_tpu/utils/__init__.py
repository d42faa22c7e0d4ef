from .vis import visualize_depth, to8b
from .schedulers import make_lr_schedule
from .logging import MetricLogger
from .profiling import ThroughputMeter, trace_context, enable_compilation_cache
