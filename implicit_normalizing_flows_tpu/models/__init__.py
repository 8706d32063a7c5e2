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
from .resflow import (  # noqa: F401
    ResidualFlow,
    StackedCouplingBlocks,
    StackediResBlocks,
    build_residual_flow,
)
