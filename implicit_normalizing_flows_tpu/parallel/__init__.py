from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    place_batch,
    place_replicated,
    replicated,
)
