"""Vector calculus API: div, grad, curl, laplace, diag.

Reference parity: devito/finite_differences/operators.py:1-172 (with
``method='FD'|'RSFD'``, per-axis/per-component ``shift`` specs via
make_shift_x0, and custom ``weights``). Operates on scalar Differentiable
expressions and on the Vector/Tensor function types (types/tensor.py).
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


def div(expr, shift=None, order=None, method='FD', weights=None, w=None):
    """Divergence. For a vector v: sum_i d v_i / d x_i; for a tensor:
    row-wise divergence -> vector; for a scalar: sum of first derivatives
    (rarely meaningful, provided for parity)."""
    weights = weights if weights is not None else w
    from ..types.tensor import VectorFunction, TensorFunction
    if isinstance(expr, (VectorFunction, TensorFunction)) or \
            hasattr(expr, 'is_TensorValued') and expr.is_TensorValued:
        return expr.div(shift=shift, order=order, method=method,
                        weights=weights)
    if isinstance(expr, (tuple, list)):
        dims = _space_dims(expr[0])
        return Add(*[_d1(e, d, _pick(shift, i), order, method, weights)
                     for i, (e, d) in enumerate(zip(expr, dims))])
    dims = _space_dims(expr)
    return Add(*[_d1(expr, d, _pick(shift, i), order, method, weights)
                 for i, d in enumerate(dims)])


def _pick(shift, i, j=None):
    """Resolve scalar / per-axis tuple / per-component matrix shifts."""
    if shift is None or not isinstance(shift, (tuple, list)):
        return shift
    s = shift[i]
    if isinstance(s, (tuple, list)):
        s = s[j if j is not None else i]
    return s


def _d1(expr, d, shift=None, order=None, method='FD', weights=None):
    x0 = None
    if shift is not None:
        x0 = {d: d + sympy.Rational(shift)}
    return Derivative(expr, d, fd_order=order or expr.space_order,
                      x0=x0 or {}, weights=weights, method=method)


def grad(expr, shift=None, order=None, method='FD', weights=None, w=None):
    """Gradient: vector of first derivatives along each space dimension."""
    weights = weights if weights is not None else w
    if hasattr(expr, 'is_VectorValued') and expr.is_VectorValued:
        return expr.grad(shift=shift, order=order, method=method,
                         weights=weights)
    dims = _space_dims(expr)
    comps = [_d1(expr, d, _pick(shift, i), order, method, weights)
             for i, d in enumerate(dims)]
    from ..types.tensor import vec_from_components
    return vec_from_components(comps, dims)


def curl(expr, shift=None, order=None, method='FD', weights=None, w=None):
    """Curl of a 3-D vector field."""
    weights = weights if weights is not None else w
    from ..types.tensor import vec_from_components
    comps = getattr(expr, 'components', expr)
    if len(comps) != 3:
        raise ValueError("curl requires a 3-D vector field")
    dims = _space_dims(comps[0])
    x, y, z = dims

    def D(a, j, d):
        # derivative of component a along axis j: shift[a][j] for
        # per-component specs, scalar otherwise
        return _d1(comps[a], d, _pick(shift, a, j), order, method, weights)

    cx = D(2, 1, y) - D(1, 2, z)
    cy = D(0, 2, z) - D(2, 0, x)
    cz = D(1, 0, x) - D(0, 1, y)
    return vec_from_components([cx, cy, cz], dims)


def laplace(expr, shift=None, order=None, method='FD', weights=None, w=None):
    """Laplacian: sum of second derivatives over space dims.  Vectors map
    component-wise; tensors contract row-wise to a vector (reference:
    types/tensor.py laplacian)."""
    weights = weights if weights is not None else w
    from ..types.tensor import TensorLike, vec_from_components
    if isinstance(expr, TensorLike):
        if weights is None:
            return expr.laplacian(shift=shift, order=order, method=method)
        dims = _space_dims(expr)
        n = len(dims)
        if expr.is_VectorValued:
            rows = [[(expr[j], dims[i]) for i in range(n)]
                    for j in range(n)]
        else:
            rows = [[(expr[j, i], dims[i]) for i in range(n)]
                    for j in range(n)]
        comps = [Add(*[Derivative(c, (d, 2),
                                  fd_order=order or c.space_order,
                                  weights=weights, method=method)
                       for c, d in row if c != 0])
                 for row in rows]
        return vec_from_components(comps, dims,
                                   timedep=expr.is_TimeDependent)
    if weights is None and hasattr(expr, 'laplacian'):
        return expr.laplacian(shift=shift, order=order, method=method)
    dims = _space_dims(expr)
    return Add(*[Derivative(expr, (d, 2),
                            fd_order=order or expr.space_order,
                            x0=({d: d + sympy.Rational(_pick(shift, i))}
                                if shift is not None else {}),
                            weights=weights, method=method)
                 for i, d in enumerate(dims)])


def diag(expr, size=None):
    """Diagonal tensor from a scalar, vector, or tensor (reference:
    operators.py diag — vector input takes the components, tensor input
    its diagonal, scalar input is replicated; time-dependence of the
    input propagates to the result type)."""
    from ..types.tensor import (TensorLike, tensor_from_components,
                                _is_timedep)
    if isinstance(expr, TensorLike):
        dims = expr.space_dimensions
        n = len(dims)
        if expr.is_VectorValued:
            comps = expr.components
        else:
            comps = [expr[i, i] for i in range(n)]
        mat = [[comps[i] if i == j else sympy.S.Zero for j in range(n)]
               for i in range(n)]
        return tensor_from_components(mat, dims,
                                      timedep=expr.is_TimeDependent)
    if isinstance(expr, (tuple, list)):
        comps = list(expr)
        n = len(comps)
        mat = [[comps[i] if i == j else 0 for j in range(n)]
               for i in range(n)]
        dims = _space_dims(comps[0])
        return tensor_from_components(mat, dims)
    dims = _space_dims(expr)
    n = size or len(dims)
    mat = [[expr if i == j else sympy.S.Zero for j in range(n)]
           for i in range(n)]
    return tensor_from_components(mat, dims, timedep=_is_timedep(
        getattr(expr, 'function', expr)))


def div45(expr, shift=None, order=None):
    """Divergence via RSFD (reference operators.py:30)."""
    return div(expr, shift=shift, order=order, method='RSFD')


def grad45(expr, shift=None, order=None):
    """Gradient via RSFD (reference operators.py:78)."""
    return grad(expr, shift=shift, order=order, method='RSFD')


def curl45(expr, shift=None, order=None):
    """Curl via RSFD (reference operators.py:141)."""
    return curl(expr, shift=shift, order=order, method='RSFD')
