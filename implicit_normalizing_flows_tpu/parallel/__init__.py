from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    place_batch,
    place_batch_axis,
    place_replicated,
    place_tp,
    replicated,
    tp_sharding,
)
from .multihost import (  # noqa: F401
    add_distributed_flags,
    init_distributed,
    is_main,
    local_shard,
    process_count,
    process_index,
    setup_distributed,
    sync,
)
