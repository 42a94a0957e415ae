"""devito_tpu — a TPU-native symbolic stencil-computation framework with the
capabilities of Devito (devitocodes/devito): a SymPy DSL for
finite-difference PDE solvers whose Operators compile to jitted JAX
time-stepping loops (XLA-fused shifted-slice stencils and Pallas kernels)
instead of generated C/OpenMP/MPI.

Public API parity: Grid, Function, TimeFunction, SparseFunction,
SparseTimeFunction, Eq, Inc, Operator, solve, Constant, SubDomain,
Dimension family, div/grad/curl/laplace, norm/inner/mmax builtins,
configuration/switchconfig.
"""

import os as _os

# Enable 64-bit computation up front (before any tracing): the reference
# honors user dtypes (fp64 Functions compute in fp64); without this flag
# JAX silently truncates float64 buffers to float32. fp32 paths are
# unaffected — all device buffers carry explicit dtypes and translated
# constants are weak-typed Python floats. Opt out with DEVITO_TPU_X64=0.
if _os.environ.get('DEVITO_TPU_X64', '1') != '0':
    import jax as _jax
    _jax.config.update('jax_enable_x64', True)

from .parameters import configuration, switchconfig  # noqa
from .logger import set_log_level, logger, info, perf, warning, error  # noqa
from .exceptions import (DevitoTpuError, CompilationError, InvalidOperator,  # noqa
                         InvalidArgument, ExecutionError)
from .types import (Grid, SubDomain, SubDomainSet, Border,  # noqa
                    Dimension, SpaceDimension,  # noqa
                    TimeDimension, SteppingDimension, SubDimension,
                    ConditionalDimension, DefaultDimension, Constant,
                    Function, TimeFunction, Eq, Inc, ReduceMax, ReduceMin,
                    dimensions, NODE, CELL)
from .types.relational import (Le, Lt, Ge, Gt, Ne,  # noqa
                               relational_min, relational_max)
from .types.sparse import (SparseFunction, SparseTimeFunction,  # noqa
                           PrecomputedSparseFunction,
                           PrecomputedSparseTimeFunction,
                           MatrixSparseTimeFunction)
from .types.tensor import (TensorFunction, VectorFunction,  # noqa
                           TensorTimeFunction, VectorTimeFunction)
from .finite_differences import (Derivative, Differentiable)  # noqa
from .finite_differences.coefficients import (Coefficient,  # noqa
                                              Substitutions)
from .types.dense import Buffer  # noqa
from .finite_differences.operators import (div, grad, curl, laplace, diag,  # noqa
                                            div45, grad45, curl45)  # noqa
from .finite_differences.elementary import (sin, cos, tan, sqrt, exp, log,  # noqa
                                            Abs, Min, Max, floor, ceiling,
                                            sign)
from .operations.solve import solve  # noqa
from .operator import Operator  # noqa

__version__ = '0.1.0'


def clear_cache():
    """Drop the global symbol cache (reference: CacheManager)."""
    from .types.basic import _symbol_cache
    _symbol_cache.clear()
