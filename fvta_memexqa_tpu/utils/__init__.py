from fvta_memexqa_tpu.utils.metrics import MetricsLogger, Timer

__all__ = ["MetricsLogger", "Timer"]
