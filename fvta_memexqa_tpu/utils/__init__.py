from fvta_memexqa_tpu.utils.jit_cache import enable_compile_cache
from fvta_memexqa_tpu.utils.metrics import MetricsLogger, Timer

__all__ = ["MetricsLogger", "Timer", "enable_compile_cache"]
