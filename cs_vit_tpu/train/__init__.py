from .checkpoint import (  # noqa: F401
    latest_checkpoint,
    merge_params,
    restore_checkpoint,
    save_checkpoint,
)
from .optim import (  # noqa: F401
    build_optimizer,
    constant_schedule,
    gen_cosine_scheduler_array,
    scaled_lr,
    warmup_cosine_schedule,
)
from .state import TrainState  # noqa: F401
from .step import make_eval_step, make_train_step  # noqa: F401
