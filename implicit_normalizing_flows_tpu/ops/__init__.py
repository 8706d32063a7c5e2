from .broyden import BroydenResult, broyden, fixed_point_iteration, root_solve  # noqa: F401
from .power_iter import (  # noqa: F401
    asym_squash,
    induced_norm_dense,
    induced_norm_conv,
    normalize_u,
    normalize_v,
    vector_norm,
)
from .logdet import (  # noqa: F401
    LogdetConfig,
    basic_logdet_estimator,
    brute_force_logdet,
    exact_trace_logdet,
    geometric_1mcdf,
    neumann_logdet_estimator,
    poisson_1mcdf,
    residual_logdet,
    sample_rademacher,
    sample_n_dist,
)
