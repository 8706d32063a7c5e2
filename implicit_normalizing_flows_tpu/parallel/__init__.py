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
