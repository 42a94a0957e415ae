"""Vector- and tensor-valued functions for staggered-grid physics.

Reference parity: devito/types/tensor.py (TensorFunction:35,
VectorFunction:333, TensorTimeFunction:560, VectorTimeFunction:577) —
matrix/vector containers of component Functions with staggered defaults:
vector component i staggered on dim i; tensor diagonal at NODE, off-diagonal
staggered on both of its dims. Used by elastic/viscoelastic solvers.

Algebra follows the reference's matrix semantics: a VectorFunction is a
column (n, 1); ``*`` between containers is matrix multiplication with the
result type derived from the result shape (column -> vector, else tensor)
and time-dependence propagated from either operand; ``*`` with a scalar is
elementwise.  Derivative shortcuts (``v.dx``, ``tau.dy2``...) broadcast
component-wise, and ``div/grad/curl/laplacian`` accept per-axis (tuple) or
per-component (tuple-of-tuples) ``shift``s plus custom ``weights``
(reference: finite_differences/operators.py make_shift_x0).

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


def _is_timedep(obj):
    return bool(getattr(obj, 'is_TimeDependent', False)
                or getattr(obj, 'is_TimeFunction', False))


def _shift_of(shift, i, j):
    """Resolve a reference-style shift spec: scalar, per-axis tuple
    (indexed by j), or per-component tuple-of-tuples (shift[i][j])."""
    if shift is None:
        return None
    if isinstance(shift, (tuple, list)):
        s = shift[i] if i is not None and isinstance(shift[0],
                                                     (tuple, list)) \
            else shift[j if j is not None else i]
        if isinstance(s, (tuple, list)):
            s = s[j]
        return s
    return shift


def _x0_of(shift, d, i, j):
    s = _shift_of(shift, i, j)
    if s is None:
        return {}
    return {d: d + sympy.Rational(s)}


def _mk(comps2d, dims, timedep, name='anon'):
    """Build the right container for a 2-D component list: a single
    column is a vector, anything else a tensor; ``timedep`` picks the
    Time variant (reference: tens_func/vec_func type promotion,
    devito/types/tensor.py:30)."""
    n = len(comps2d)
    m = len(comps2d[0]) if n else 0
    if m == 1 and n >= 1:
        cls = VectorTimeFunction if timedep else VectorFunction
    else:
        cls = TensorTimeFunction if timedep else TensorFunction
    out = object.__new__(cls)
    out._comps = [list(row) for row in comps2d]
    out._dims = tuple(dims)
    out._name = name
    out._symmetric = False
    return out


class TensorLike:
    """Common container machinery (elementwise arithmetic, matrix algebra,
    broadcast derivatives)."""

    is_TensorValued = True
    is_VectorValued = False
    is_TimeDependent = False

    # sympy matrices defer binary ops to the higher-priority operand
    # (call_highest_priority), so `sympy.Matrix * TensorLike` routes to
    # our __rmul__ instead of a failed coercion
    _op_priority = 20.0

    def _new_from(self, comps, timedep=None):
        """Same-kind container (vector stays vector even as a row —
        reference: a transposed VectorFunction keeps its type), with
        optional time-dependence promotion."""
        td = self.is_TimeDependent if timedep is None else timedep
        if self.is_VectorValued:
            cls = VectorTimeFunction if td else VectorFunction
        else:
            cls = TensorTimeFunction if td else TensorFunction
        out = object.__new__(cls)
        out._comps = [list(row) for row in comps]
        out._dims = self._dims
        out._name = getattr(self, '_name', 'anon')
        out._symmetric = False
        return out

    @property
    def space_dimensions(self):
        return self._dims

    @property
    def shape(self):
        return (len(self._comps), len(self._comps[0]))

    def _map(self, f, timedep=None):
        return self._new_from(
            [[f(c) if c != 0 else sympy.S.Zero for c in row]
             for row in self._comps], timedep=timedep)

    def _zip(self, other, f):
        if isinstance(other, TensorLike):
            return self._new_from(
                [[f(a, b) for a, b in zip(ra, rb)]
                 for ra, rb in zip(self._comps, other._comps)],
                timedep=self.is_TimeDependent or other.is_TimeDependent)
        return self._map(lambda c: f(c, other),
                         timedep=self.is_TimeDependent or _is_timedep(other))

    # -- matrix algebra ----------------------------------------------------

    @staticmethod
    def _as_rows(other):
        if isinstance(other, TensorLike):
            return other._comps, other.is_TimeDependent
        if isinstance(other, sympy.MatrixBase):
            return [[other[i, j] for j in range(other.cols)]
                    for i in range(other.rows)], False
        return None, False

    def _matmul(self, other, reverse=False):
        rows_b, td_b = self._as_rows(other)
        a = rows_b if reverse else self._comps
        b = self._comps if reverse else rows_b
        n, m, m2, k = len(a), len(a[0]), len(b), len(b[0])
        if m != m2:
            raise ValueError(f"matmul shape mismatch ({n},{m})x({m2},{k})")
        out = [[sum(a[i][l] * b[l][j] for l in range(m)
                    if a[i][l] != 0 and b[l][j] != 0)
                for j in range(k)] for i in range(n)]
        return _mk(out, self._dims, self.is_TimeDependent or td_b,
                   getattr(self, '_name', 'anon'))

    def __add__(self, other):
        return self._zip(other, lambda a, b: a + b)

    __radd__ = __add__

    def __sub__(self, other):
        return self._zip(other, lambda a, b: a - b)

    def __rsub__(self, other):
        return self._zip(other, lambda a, b: b - a)

    def __mul__(self, other):
        if isinstance(other, TensorLike) or \
                isinstance(other, sympy.MatrixBase):
            return self._matmul(other)
        return self._map(lambda c: c * other,
                         timedep=self.is_TimeDependent or _is_timedep(other))

    def __rmul__(self, other):
        if isinstance(other, TensorLike) or \
                isinstance(other, sympy.MatrixBase):
            return self._matmul(other, reverse=True)
        return self._map(lambda c: other * c,
                         timedep=self.is_TimeDependent or _is_timedep(other))

    def __neg__(self):
        return self._map(lambda c: -c)

    def __eq__(self, other):
        if isinstance(other, TensorLike):
            return self.shape == other.shape and all(
                a == b for ra, rb in zip(self._comps, other._comps)
                for a, b in zip(ra, rb))
        return NotImplemented

    def __hash__(self):
        return hash(tuple(tuple(row) for row in self._comps))

    def __getitem__(self, key):
        if isinstance(key, tuple):
            return self._comps[key[0]][key[1]]
        if self.is_VectorValued:
            return self._comps[0][key] if len(self._comps) == 1 \
                else self._comps[key][0]
        return self._comps[key]

    def __len__(self):
        return len(self._comps)

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

    def as_mutable(self):
        """Plain sympy Matrix of the components (reference interop)."""
        flat = [c for row in self._comps for c in row]
        return sympy.Matrix(len(self._comps), len(self._comps[0]), flat)

    # -- broadcast derivatives & time shifts --------------------------------

    _NOT_SHORTCUTS = frozenset(['div', 'divergence', 'dt', 'dtl', 'dtr',
                                'data', 'dtype', 'dims', 'dimensions',
                                'domain', 'diagonal'])

    def __getattr__(self, name):
        # broadcast derivative shortcuts (v.dx, tau.dy2, v.dx45...) over
        # the components; anything else is a genuine miss
        if name.startswith('_') or not name.startswith('d') or \
                len(name) < 2 or name in self._NOT_SHORTCUTS:
            raise AttributeError(name)
        try:
            return self._map(lambda c: getattr(c, name))
        except AttributeError:
            raise AttributeError(name)

    def __call__(self, *args, **kwargs):
        """Re-parameterize broadcast derivatives: ``v.dx(w=c)``."""
        return self._map(lambda c: c(*args, **kwargs))

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

    @property
    def laplace(self):
        return self.laplacian()

    def values(self):
        return [c for row in self._comps for c in row if c != 0]

    def flat(self):
        return [c for row in self._comps for c in row]

    def __iter__(self):
        return iter(self.values())

    def func(self, *args, **kwargs):
        """Rebuild the container, re-deriving each component with the
        given overrides (reference: CompositeObject.func / test_tensors
        test_rebuild).  ``name=`` renames components by prefix
        substitution; other kwargs (``dimensions=``...) pass through."""
        old = getattr(self, '_name', 'anon')
        new = kwargs.pop('name', old)

        def _re(c):
            fn = getattr(c, 'function', None)
            if fn is None:
                return c
            kw = dict(kwargs)
            kw['name'] = fn.name.replace(old, new, 1)
            if 'dimensions' in kw and fn.is_TimeFunction:
                dims = as_tuple(kw['dimensions'])
                if dims and not getattr(dims[0], 'is_Time', False):
                    kw['dimensions'] = (fn.time_dim,) + tuple(dims)
            return fn.func(**kw)

        out = self._map(_re)
        out._name = new
        return out

    def __repr__(self):
        return f"{type(self).__name__}({self._name})"


class TensorFunction(TensorLike):
    """Symmetric rank-2 tensor of Functions: components named
    ``{name}_{di}{dj}``; diagonal at NODE, off-diagonal staggered on both
    dims (reference default)."""

    is_TimeDependent = False
    _component_cls = Function

    def __init__(self, name=None, grid=None, space_order=2, symmetric=True,
                 diagonal=False, staggered=None, components=None,
                 dimensions=None, shape=None, **kwargs):
        if grid is not None:
            dims = grid.dimensions
        else:
            dims = as_tuple(dimensions)
        self._name = name
        self._dims = dims
        self._symmetric = symmetric
        n = len(dims)
        if components is not None:
            rows, _ = TensorLike._as_rows(components) \
                if not isinstance(components, (list, tuple)) \
                else (list(components), False)
            self._comps = [[sympy.sympify(c) for c in row] for row in rows]
            return
        extra = dict(kwargs)
        if grid is None:
            extra.update(dimensions=dims, shape=shape)
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
                    **extra)
        self._comps = comps

    @property
    def name(self):
        return self._name

    def div(self, shift=None, order=None, method='FD', weights=None):
        """Row-wise divergence -> vector."""
        from ..finite_differences.derivative import Derivative
        from ..finite_differences.differentiable import Add
        n = len(self._dims)
        comps = []
        for i in range(n):
            terms = []
            for j, d in enumerate(self._dims):
                c = self._comps[i][j]
                if c == 0:
                    continue
                terms.append(Derivative(
                    c, d, fd_order=order or c.space_order,
                    x0=_x0_of(shift, d, i, j), weights=weights,
                    method=method))
            comps.append(Add(*terms))
        return _mk([[c] for c in comps], self._dims, self.is_TimeDependent)

    def laplacian(self, shift=None, order=None, method='FD'):
        """Row-contraction Laplacian -> vector: component j is
        ``sum_i d2 self[j, i] / d x_i2`` with per-(i, j) shifts
        (reference: TensorFunction.laplacian, types/tensor.py:263)."""
        from ..finite_differences.derivative import Derivative
        n = len(self._dims)
        comps = []
        for j in range(n):
            terms = []
            for i, d in enumerate(self._dims):
                c = self._comps[j][i]
                if c == 0:
                    continue
                terms.append(Derivative(
                    c, (d, 2), fd_order=order or c.space_order,
                    x0=_x0_of(shift, d, i, j), method=method))
            comps.append(sum(terms))
        return _mk([[c] for c in comps], self._dims, self.is_TimeDependent)

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
                 dimensions=None, shape=None, **kwargs):
        if grid is not None:
            dims = grid.dimensions
        else:
            dims = as_tuple(dimensions)
        self._name = name
        self._dims = dims
        extra = dict(kwargs)
        if grid is None:
            extra.update(dimensions=dims, shape=shape)
        comps = []
        for i, d in enumerate(dims):
            stag = staggered if staggered is not None else (d,)
            comps.append([self._component_cls(
                name=f"{name}_{d.name}", grid=grid, space_order=space_order,
                staggered=stag, **extra)])
        self._comps = comps

    @property
    def name(self):
        return self._name

    @property
    def components(self):
        return [row[0] for row in self._comps]

    def __getitem__(self, key):
        if isinstance(key, tuple):
            return self._comps[key[0]][key[1]]
        return self._comps[key][0] if len(self._comps[0]) == 1 \
            else self._comps[0][key]

    def __iter__(self):
        return iter(self.components)

    def div(self, shift=None, order=None, method='FD', weights=None):
        from ..finite_differences.derivative import Derivative
        from ..finite_differences.differentiable import Add
        terms = []
        for i, (c, d) in enumerate(zip(self.components, self._dims)):
            order_c = order or getattr(c, 'space_order', None) or 2
            terms.append(Derivative(c, d, fd_order=order_c,
                                    x0=_x0_of(shift, d, None, i),
                                    weights=weights, method=method))
        return Add(*terms)

    @property
    def divergence(self):
        return self.div()

    def grad(self, shift=None, order=None, method='FD', weights=None):
        """Gradient -> tensor (d v_i / d x_j), shift[i][j] per entry."""
        from ..finite_differences.derivative import Derivative
        n = len(self._dims)
        mat = []
        for i in range(n):
            row = []
            for j, d in enumerate(self._dims):
                c = self.components[i]
                row.append(Derivative(c, d, fd_order=order or c.space_order,
                                      x0=_x0_of(shift, d, i, j),
                                      weights=weights, method=method))
            mat.append(row)
        return _mk(mat, self._dims, self.is_TimeDependent)

    def laplacian(self, shift=None, order=None, method='FD'):
        """Component-wise scalar Laplacian -> vector."""
        comps = [c.laplacian(shift=shift, order=order, method=method)
                 for c in self.components]
        return _mk([[c] for c in comps], self._dims, self.is_TimeDependent)

    def outer(self, other):
        """Outer product v * w.T -> tensor."""
        return self._matmul(other.T if isinstance(other, TensorLike)
                            else other)


class TensorTimeFunction(TensorFunction):
    is_TimeDependent = True
    _component_cls = TimeFunction


class VectorTimeFunction(VectorFunction):
    is_TimeDependent = True
    _component_cls = TimeFunction


def vec_from_components(comps, dims, timedep=None):
    td = timedep if timedep is not None else \
        any(_is_timedep(getattr(c, 'function', c)) for c in comps)
    return _mk([[c] for c in comps], dims, td, 'vec')


def tensor_from_components(mat, dims, timedep=None):
    flat = [c for row in mat for c in row]
    td = timedep if timedep is not None else \
        any(_is_timedep(getattr(c, 'function', c)) for c in flat)
    return _mk(mat, dims, td, 'tensor')
