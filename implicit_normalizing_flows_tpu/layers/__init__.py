from .protocol import Flow, Inverse, Variables, make_vars  # noqa: F401
from .container import ScanRepeat, SequentialFlow  # noqa: F401
from .actnorm import ActNorm1d, ActNorm2d  # noqa: F401
from .normalization import MovingBatchNorm1d, MovingBatchNorm2d  # noqa: F401
from .elemwise import LogitTransform, Normalize, ZeroMeanTransform  # noqa: F401
from .squeeze import SqueezeLayer, squeeze, unsqueeze  # noqa: F401
from .glow import InvertibleConv2d, InvertibleLinear  # noqa: F401
from .coupling import (  # noqa: F401
    ChannelCouplingBlock,
    CouplingBlock,
    MaskedCouplingBlock,
    get_mask,
)
from .activations import (  # noqa: F401
    ACT_FNS,
    ELU,
    FullSort,
    Identity,
    LipschitzCube,
    MaxMin,
    ReLU,
    SELU,
    Sin,
    Softplus,
    Swish,
    Tanh,
    Zero,
)
from .lipschitz import (  # noqa: F401
    InducedNormConv,
    InducedNormDense,
    LipNormConv,
    LipNormDense,
    LopConv,
    LopDense,
    SpectralNormConv,
    SpectralNormDense,
    get_conv,
    get_dense,
)
from .nets import Dropout, LipschitzNet  # noqa: F401
from .implicit_block import ImplicitBlock, SolverConfig  # noqa: F401
from .iresblock import IResBlock  # noqa: F401
