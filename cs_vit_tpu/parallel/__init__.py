from .mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    fitting_mesh,
    make_mesh,
    process_local_batch_slice,
    replicate_state,
    replicated,
    shard_batch,
)
from .prefetch import device_prefetch  # noqa: F401
from .tp import (  # noqa: F401
    init_opt_state_sharded,
    poser_param_specs,
    shard_params_tp,
    shard_state_tp,
)
