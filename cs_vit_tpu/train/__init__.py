from .checkpoint import (  # noqa: F401
    latest_checkpoint,
    merge_params,
    merge_restored_tree,
    restore_checkpoint,
    save_checkpoint,
)
from .optim import (  # noqa: F401
    build_optimizer,
    clip_by_global_norm_stateful,
    constant_schedule,
    gen_cosine_scheduler_array,
    last_grad_norm,
    scaled_lr,
    warmup_cosine_schedule,
)
from .state import TrainState  # noqa: F401
from .step import make_eval_step, make_train_step  # noqa: F401
