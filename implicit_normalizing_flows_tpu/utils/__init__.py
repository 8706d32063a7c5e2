from .meters import AverageMeter, RunningAverageMeter  # noqa: F401
from .logging import get_logger, makedirs  # noqa: F401
