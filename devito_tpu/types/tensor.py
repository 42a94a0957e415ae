"""Vector- and tensor-valued functions for staggered-grid physics.

Reference parity: devito/types/tensor.py (TensorFunction:35,
VectorFunction:333, TensorTimeFunction:560, VectorTimeFunction:577) —
matrix/vector containers of component Functions with staggered defaults:
vector component i staggered on dim i; tensor diagonal at NODE, off-diagonal
staggered on both of its dims. Used by elastic/viscoelastic solvers.

TPU-first: components are ordinary (Time)Functions; tensor equations are
flattened to per-component equations during lowering (reference:
operator.py `_lower_exprs` flattening).
"""

import sympy

from .dense import Function, TimeFunction
from .basic import NODE
from ..utils import as_tuple

__all__ = ['TensorFunction', 'VectorFunction', 'TensorTimeFunction',
           'VectorTimeFunction', 'vec_from_components',
           'tensor_from_components']


class TensorLike:
    """Common container machinery (elementwise arithmetic, derivatives)."""

    is_TensorValued = True
    is_VectorValued = False

    def _new_from(self, comps):
        out = object.__new__(type(self))
        out._comps = comps
        out._dims = self._dims
        out._name = getattr(self, '_name', 'anon')
        return out

    @property
    def space_dimensions(self):
        return self._dims

    def _map(self, f):
        return self._new_from([[f(c) for c in row] for row in self._comps])

    def _zip(self, other, f):
        if isinstance(other, TensorLike):
            return self._new_from(
                [[f(a, b) for a, b in zip(ra, rb)]
                 for ra, rb in zip(self._comps, other._comps)])
        return self._map(lambda c: f(c, other))

    def __add__(self, other):
        return self._zip(other, lambda a, b: a + b)

    __radd__ = __add__

    def __sub__(self, other):
        return self._zip(other, lambda a, b: a - b)

    def __rsub__(self, other):
        return self._zip(other, lambda a, b: b - a)

    def __mul__(self, other):
        if isinstance(other, TensorLike):
            return self._matmul(other)
        return self._map(lambda c: c * other)

    def __rmul__(self, other):
        if isinstance(other, TensorLike):
            return other._matmul(self)
        return self._map(lambda c: c * other)

    def __neg__(self):
        return self._map(lambda c: -c)

    def __getitem__(self, key):
        if isinstance(key, tuple):
            return self._comps[key[0]][key[1]]
        if self.is_VectorValued:
            return self._comps[0][key] if len(self._comps) == 1 \
                else self._comps[key][0]
        return self._comps[key]

    def transpose(self, inner=True):
        """Matrix transpose; ``inner=True`` also transposes each component
        (Derivative.T), matching the reference's ``.transpose(inner=...)``."""
        n = len(self._comps)
        m = len(self._comps[0])
        comps = [[self._comps[j][i] for j in range(n)] for i in range(m)]
        if inner:
            comps = [[c.T if hasattr(c, 'T') else c for c in row]
                     for row in comps]
        return self._new_from(comps)

    @property
    def T(self):
        return self.transpose()

    @property
    def forward(self):
        return self._map(lambda c: c.forward)

    @property
    def backward(self):
        return self._map(lambda c: c.backward)

    @property
    def dt(self):
        return self._map(lambda c: c.dt)

    @property
    def dtl(self):
        return self._map(lambda c: c.dtl)

    @property
    def dtr(self):
        return self._map(lambda c: c.dtr)

    def values(self):
        return [c for row in self._comps for c in row]

    def flat(self):
        return self.values()

    def __repr__(self):
        return f"{type(self).__name__}({self._name})"


class TensorFunction(TensorLike):
    """Symmetric rank-2 tensor of Functions: components named
    ``{name}_{di}{dj}``; diagonal at NODE, off-diagonal staggered on both
    dims (reference default)."""

    is_TimeDependent = False
    _component_cls = Function

    def __init__(self, name=None, grid=None, space_order=2, symmetric=True,
                 diagonal=False, staggered=None, **kwargs):
        dims = grid.dimensions
        self._name = name
        self._dims = dims
        self._symmetric = symmetric
        n = len(dims)
        comps = [[None] * n for _ in range(n)]
        for i in range(n):
            for j in range(n):
                if symmetric and j < i:
                    comps[i][j] = comps[j][i]
                    continue
                if diagonal and i != j:
                    comps[i][j] = sympy.S.Zero
                    continue
                if i == j:
                    stag = NODE
                else:
                    stag = (dims[i], dims[j])
                comps[i][j] = self._component_cls(
                    name=f"{name}_{dims[i].name}{dims[j].name}",
                    grid=grid, space_order=space_order, staggered=stag,
                    **kwargs)
        self._comps = comps

    @property
    def name(self):
        return self._name

    def div(self, shift=None, order=None, method='FD'):
        """Row-wise divergence -> vector."""
        from ..finite_differences.derivative import Derivative
        from ..finite_differences.differentiable import Add
        import sympy
        n = len(self._dims)
        comps = []
        for i in range(n):
            terms = []
            for j, d in enumerate(self._dims):
                c = self._comps[i][j]
                if c == 0:
                    continue
                x0 = {d: d + sympy.Rational(shift)} if shift is not None \
                    else {}
                terms.append(Derivative(c, d,
                                        fd_order=order or c.space_order,
                                        x0=x0, method=method))
            comps.append(Add(*terms))
        return vec_from_components(comps, self._dims)

    def diagonal(self):
        return self._new_from([[self._comps[i][i] if i == j else sympy.S.Zero
                                for j in range(len(self._dims))]
                               for i in range(len(self._dims))])

    def trace(self):
        from ..finite_differences.differentiable import Add
        return Add(*[self._comps[i][i] for i in range(len(self._dims))])


class VectorFunction(TensorLike):
    """Vector of Functions: component i staggered on dim i (reference
    default for velocity-like fields)."""

    is_VectorValued = True
    is_TensorValued = False
    is_TimeDependent = False
    _component_cls = Function

    def __init__(self, name=None, grid=None, space_order=2, staggered=None,
                 **kwargs):
        dims = grid.dimensions
        self._name = name
        self._dims = dims
        comps = []
        for i, d in enumerate(dims):
            stag = staggered if staggered is not None else (d,)
            comps.append([self._component_cls(
                name=f"{name}_{d.name}", grid=grid, space_order=space_order,
                staggered=stag, **kwargs)])
        self._comps = comps

    @property
    def name(self):
        return self._name

    @property
    def components(self):
        return [row[0] for row in self._comps]

    def __getitem__(self, key):
        return self._comps[key][0]

    def __iter__(self):
        return iter(self.components)

    def div(self, shift=None, order=None, method='FD'):
        from ..finite_differences.derivative import Derivative
        from ..finite_differences.differentiable import Add
        import sympy
        terms = []
        for c, d in zip(self.components, self._dims):
            x0 = {d: d + sympy.Rational(shift)} if shift is not None else {}
            order_c = order or getattr(c, 'space_order', None) or 2
            terms.append(Derivative(c, d, fd_order=order_c, x0=x0,
                                    method=method))
        return Add(*terms)

    @property
    def divergence(self):
        return self.div()

    def grad(self, shift=None, order=None, method='FD'):
        """Gradient -> tensor (d v_i / d x_j)."""
        from ..finite_differences.derivative import Derivative
        n = len(self._dims)
        mat = []
        for i in range(n):
            row = []
            for j, d in enumerate(self._dims):
                c = self.components[i]
                row.append(Derivative(c, d, fd_order=order or c.space_order,
                                      method=method))
            mat.append(row)
        return tensor_from_components(mat, self._dims)


class TensorTimeFunction(TensorFunction):
    is_TimeDependent = True
    _component_cls = TimeFunction


class VectorTimeFunction(VectorFunction):
    is_TimeDependent = True
    _component_cls = TimeFunction


def vec_from_components(comps, dims):
    out = object.__new__(VectorFunction)
    out._comps = [[c] for c in comps]
    out._dims = tuple(dims)
    out._name = 'vec'
    return out


def tensor_from_components(mat, dims):
    out = object.__new__(TensorFunction)
    out._comps = [list(row) for row in mat]
    out._dims = tuple(dims)
    out._name = 'tensor'
    out._symmetric = False
    return out
