from .optimizers import adam, adamax, rmsprop  # noqa: F401
from .lr_schedule import (  # noqa: F401
    cosine_annealing_warm_restarts,
    linear_warmup,
    step_decay,
)
from .ema import ema_apply, ema_init, ema_swap  # noqa: F401
from .checkpoints import load_checkpoint, save_checkpoint, save_most_recent  # noqa: F401
from .loops import (  # noqa: F401
    make_density_eval_step,
    make_density_train_step,
    standard_normal_logprob,
)
