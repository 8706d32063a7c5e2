from .implicit_flow import (  # noqa: F401
    FCWrapper,
    ImplicitFlow,
    StackedImplicitBlocks,
    parse_vnorms,
)
from .builders import (  # noqa: F401
    build_lipschitz_mlp,
    build_tabular_model,
    build_toy_model,
)
from .modules import PlainConv2d, PlainDense  # noqa: F401
