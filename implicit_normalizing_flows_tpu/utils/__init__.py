from .meters import AverageMeter, LaggedMetrics, RunningAverageMeter  # noqa: F401
from .logging import get_logger, makedirs  # noqa: F401
from .compile_cache import enable_compilation_cache  # noqa: F401
from .misc import inf_generator, logsumexp  # noqa: F401
from .profiling import StepWindowProfiler  # noqa: F401
