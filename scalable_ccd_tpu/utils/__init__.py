from scalable_ccd_tpu.utils.logging import logger, set_logger, trace
from scalable_ccd_tpu.utils.profiler import profiler, Profiler
from scalable_ccd_tpu.utils.timer import Timer

__all__ = ["logger", "set_logger", "trace", "profiler", "Profiler", "Timer"]
