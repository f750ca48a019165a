"""Utilities: typed run configs, logging, profiling."""

from densefusion_tpu.utils.compile_cache import (
    enable_persistent_compilation_cache,
)
from densefusion_tpu.utils.config import RunConfig, DATASET_PRESETS
from densefusion_tpu.utils.logging import setup_logger, MetricsWriter
from densefusion_tpu.utils.profiling import StepTimer, trace_context

__all__ = [
    "RunConfig", "DATASET_PRESETS", "setup_logger", "MetricsWriter",
    "StepTimer", "trace_context", "enable_persistent_compilation_cache",
]
