"""Vector calculus API: div, grad, curl, laplace, diag.

Reference parity: devito/finite_differences/operators.py:1-172 (with
``method='FD'|'RSFD'``). Operates on scalar Differentiable expressions and
on the Vector/Tensor function types (types/tensor.py).
"""

import sympy

from .derivative import Derivative
from .differentiable import Add, Differentiable

__all__ = ['div', 'grad', 'curl', 'laplace', 'diag', 'div45', 'grad45',
           'curl45']


def _space_dims(expr):
    dims = getattr(expr, 'space_dimensions', None)
    if dims:
        return dims
    raise ValueError(f"Cannot infer space dimensions of {expr}")


def div(expr, shift=None, order=None, method='FD'):
    """Divergence. For a vector v: sum_i d v_i / d x_i; for a scalar: sum of
    first derivatives (rarely meaningful, provided for parity)."""
    from ..types.tensor import VectorFunction, TensorFunction
    if isinstance(expr, (VectorFunction, TensorFunction)) or \
            hasattr(expr, 'is_TensorValued') and expr.is_TensorValued:
        return expr.div(shift=shift, order=order, method=method)
    if isinstance(expr, (tuple, list)):
        dims = _space_dims(expr[0])
        return Add(*[_d1(e, d, shift, order, method)
                     for e, d in zip(expr, dims)])
    dims = _space_dims(expr)
    return Add(*[_d1(expr, d, shift, order, method) for d in dims])


def _d1(expr, d, shift=None, order=None, method='FD'):
    x0 = None
    if shift is not None:
        x0 = {d: d + sympy.Rational(shift)}
    return Derivative(expr, d, fd_order=order or expr.space_order,
                      x0=x0 or {}, method=method)


def grad(expr, shift=None, order=None, method='FD'):
    """Gradient: tuple of first derivatives along each space dimension."""
    from ..types.tensor import VectorFunction
    if hasattr(expr, 'is_VectorValued') and expr.is_VectorValued:
        return expr.grad(shift=shift, order=order, method=method)
    dims = _space_dims(expr)
    comps = [_d1(expr, d, shift, order, method) for d in dims]
    from ..types.tensor import vec_from_components
    return vec_from_components(comps, dims)


def curl(expr, shift=None, order=None, method='FD'):
    """Curl of a 3-D vector field."""
    from ..types.tensor import VectorFunction, vec_from_components
    comps = getattr(expr, 'components', expr)
    if len(comps) != 3:
        raise ValueError("curl requires a 3-D vector field")
    dims = _space_dims(comps[0])
    x, y, z = dims
    vx, vy, vz = comps
    cx = _d1(vz, y, shift, order, method) - _d1(vy, z, shift, order, method)
    cy = _d1(vx, z, shift, order, method) - _d1(vz, x, shift, order, method)
    cz = _d1(vy, x, shift, order, method) - _d1(vx, y, shift, order, method)
    return vec_from_components([cx, cy, cz], dims)


def laplace(expr, shift=None, order=None, method='FD'):
    """Laplacian: sum of second derivatives over space dims."""
    if hasattr(expr, 'laplacian'):
        return expr.laplacian(shift=shift, order=order, method=method)
    dims = _space_dims(expr)
    return Add(*[Derivative(expr, (d, 2),
                            fd_order=order or expr.space_order)
                 for d in dims])


def diag(expr, size=None):
    """Diagonal tensor from a scalar (or vector)."""
    from ..types.tensor import tensor_from_components
    if isinstance(expr, (tuple, list)):
        comps = list(expr)
        n = len(comps)
        mat = [[comps[i] if i == j else 0 for j in range(n)]
               for i in range(n)]
        dims = _space_dims(comps[0])
        return tensor_from_components(mat, dims)
    dims = _space_dims(expr)
    n = len(dims)
    mat = [[expr if i == j else 0 for j in range(n)] for i in range(n)]
    return tensor_from_components(mat, dims)


def div45(expr, shift=None, order=None):
    """Divergence via RSFD (reference operators.py:30)."""
    return div(expr, shift=shift, order=order, method='RSFD')


def grad45(expr, shift=None, order=None):
    """Gradient via RSFD (reference operators.py:78)."""
    return grad(expr, shift=shift, order=order, method='RSFD')


def curl45(expr, shift=None, order=None):
    """Curl via RSFD (reference operators.py:141)."""
    return curl(expr, shift=shift, order=order, method='RSFD')
