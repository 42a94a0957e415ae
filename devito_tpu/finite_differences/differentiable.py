"""The Differentiable protocol: arithmetic that preserves the ability to take
finite-difference derivatives, plus dynamic derivative shortcuts.

Reference parity: devito/finite_differences/differentiable.py (Differentiable
mixin:40, operator-preserving Add:579/Mul:601/Pow:725) and
tools.py:generate_fd_shortcuts:83. Shortcuts here are resolved dynamically in
``__getattr__`` (``u.dx``, ``u.dx2``, ``u.dxdy``, ``u.dxl``, ``u.dx45``...)
instead of being pre-generated per Function.
"""

import sympy

from ..utils import filter_ordered

__all__ = ['Differentiable', 'Add', 'Mul', 'Pow', 'diffify', 'evaluate_expr']


class Differentiable:
    """Mixin providing FD-derivative shortcuts and differentiability-
    preserving arithmetic."""

    # -- Introspection over the expression tree ---------------------------

    @property
    def _functions(self):
        """All DiscreteFunction accesses in this expression."""
        from ..types.basic import retrieve_functions
        return retrieve_functions(self)

    @property
    def dimensions(self):
        dims = []
        for f in self._functions:
            dims.extend(f.function.dimensions)
        return tuple(filter_ordered(dims))

    @property
    def space_dimensions(self):
        return tuple(d for d in self.dimensions if d.is_Space)

    @property
    def space_order(self):
        orders = [f.function.space_order for f in self._functions
                  if f.function.space_order is not None]
        return min(orders) if orders else None

    @property
    def time_order(self):
        orders = [f.function.time_order for f in self._functions
                  if getattr(f.function, 'time_order', None) is not None]
        return min(orders) if orders else None

    @property
    def grid(self):
        for f in self._functions:
            if f.function.grid is not None:
                return f.function.grid
        return None

    @property
    def time_dim(self):
        for f in self._functions:
            td = getattr(f.function, 'time_dim', None)
            if td is not None:
                return td
        g = self.grid
        return g.time_dim if g is not None else None

    @property
    def evaluate(self):
        return evaluate_expr(self)

    @property
    def is_TimeDependent(self):
        return any(d.is_Time for d in self.dimensions)

    # -- Arithmetic -------------------------------------------------------

    def __add__(self, other):
        return Add(self, sympy.sympify(other))

    def __radd__(self, other):
        return Add(sympy.sympify(other), self)

    def __sub__(self, other):
        return Add(self, Mul(sympy.Integer(-1), sympy.sympify(other)))

    def __rsub__(self, other):
        return Add(sympy.sympify(other), Mul(sympy.Integer(-1), self))

    def __mul__(self, other):
        return Mul(self, sympy.sympify(other))

    def __rmul__(self, other):
        return Mul(sympy.sympify(other), self)

    def __truediv__(self, other):
        return Mul(self, Pow(sympy.sympify(other), sympy.Integer(-1)))

    def __rtruediv__(self, other):
        return Mul(sympy.sympify(other), Pow(self, sympy.Integer(-1)))

    def __pow__(self, other):
        return Pow(self, sympy.sympify(other))

    def __rpow__(self, other):
        return Pow(sympy.sympify(other), self)

    def __neg__(self):
        return Mul(sympy.Integer(-1), self)

    # -- Derivative shortcuts ---------------------------------------------

    def __getattr__(self, name):
        if name.startswith('_') or not name.startswith('d'):
            raise AttributeError(name)
        deriv = _parse_derivative_shortcut(self, name)
        if deriv is None:
            raise AttributeError(name)
        return deriv

    @property
    def dt(self):
        return self._time_derivative(1)

    @property
    def dt2(self):
        return self._time_derivative(2)

    @property
    def dtl(self):
        return self._time_derivative(1, side='left')

    @property
    def dtr(self):
        return self._time_derivative(1, side='right')

    def _time_derivative(self, order, side=None):
        from .derivative import Derivative
        td = self.time_dim
        if td is None:
            raise AttributeError("Expression has no time dimension")
        # reference behavior: u.dt/u.dt2 use fd_order = time_order
        # (time_order=1 -> forward 2-point; time_order=2 -> centered 3-point)
        fd = self.time_order or 1
        return Derivative(self, (td, order), fd_order=fd, side=side)

    @property
    def laplace(self):
        """Sum of second derivatives over all space dimensions."""
        return self.laplacian()

    def laplacian(self, shift=None, order=None, method='FD'):
        from .derivative import Derivative
        dims = self.space_dimensions
        order = order or self.space_order
        terms = [Derivative(self, (d, 2), fd_order=order) for d in dims]
        return Add(*terms)

    def biharmonic(self, weight=1):
        """laplace(weight * laplace(self))"""
        lap = self.laplacian()
        return (Mul(sympy.sympify(weight), lap)).laplacian()

    @property
    def div(self):
        from .operators import div
        return div(self)

    @property
    def grad(self):
        from .operators import grad
        return grad(self)

    # sympy interop
    def _eval_at(self, func):
        return self


def _parse_derivative_shortcut(expr, name):
    """Parse 'dx', 'dy2', 'dxdy', 'dxl', 'dxr', 'dx45' against expr's
    dimensions. Returns a Derivative or None."""
    from .derivative import Derivative
    dims = {d.name: d for d in getattr(expr, 'dimensions', ())}
    td = expr.time_dim
    if td is not None:
        dims.setdefault(td.name, td)
        dims.setdefault('t', td)

    segments = []
    rest = name
    while rest:
        if not rest.startswith('d'):
            return None
        rest = rest[1:]
        # longest dimension-name match
        match = None
        for dn in sorted(dims, key=len, reverse=True):
            if rest.startswith(dn):
                match = dn
                break
        if match is None:
            return None
        rest = rest[len(match):]
        mod = ''
        while rest and not rest.startswith('d'):
            mod += rest[0]
            rest = rest[1:]
        segments.append((dims[match], mod))

    if not segments:
        return None

    derivs = []
    rot45 = False
    for d, mod in segments:
        order, side = 1, None
        if mod == 'l':
            side = 'left'
        elif mod == 'r':
            side = 'right'
        elif mod == '45':
            rot45 = True
        elif mod.isdigit():
            order = int(mod)
        elif mod:
            return None
        derivs.append((d, order, side))

    if rot45:
        from .rsfd import d45
        return d45(expr, segments[0][0])

    if any(d.is_Time for d, _, _ in derivs):
        # time derivative shortcut like u.dt via parser (only single-dim)
        if len(derivs) == 1:
            d, order, side = derivs[0]
            return expr._time_derivative(order, side=side)
        return None

    fd = expr.space_order
    dim_spec = tuple((d, o) for d, o, _ in derivs)
    side = derivs[0][2] if len(derivs) == 1 else None
    return Derivative(expr, *dim_spec, fd_order=fd, side=side)


class Add(Differentiable, sympy.Add):
    def __new__(cls, *args, **kwargs):
        return sympy.Add.__new__(cls, *args, **kwargs)


class Mul(Differentiable, sympy.Mul):
    def __new__(cls, *args, **kwargs):
        return sympy.Mul.__new__(cls, *args, **kwargs)


class Pow(Differentiable, sympy.Pow):
    def __new__(cls, *args, **kwargs):
        return sympy.Pow.__new__(cls, *args, **kwargs)


def diffify(expr):
    """Rebuild a plain sympy expression with differentiable Add/Mul/Pow heads
    so derivative shortcuts remain available."""
    if not isinstance(expr, sympy.Basic) or not expr.args:
        return expr
    args = [diffify(a) for a in expr.args]
    if expr.func is sympy.Add:
        return Add(*args)
    if expr.func is sympy.Mul:
        return Mul(*args)
    if expr.func is sympy.Pow:
        return Pow(*args)
    return expr.func(*args)


def evaluate_expr(expr, x0=None):
    """Recursively expand all Derivative (and other lazy Evaluable) nodes.

    ``x0``: default evaluation stagger offsets {dim: Rational}, typically the
    stagger of the equation's left-hand side (reference:
    Derivative._eval_at, derivative.py:24).
    """
    from .derivative import Derivative
    if isinstance(expr, Derivative):
        return expr._evaluate(x0=x0)
    if not isinstance(expr, sympy.Basic) or not expr.args:
        return expr
    if hasattr(expr, '_evaluate') and not isinstance(expr, sympy.Basic):
        return expr._evaluate(x0=x0)
    new_args = [evaluate_expr(a, x0=x0) for a in expr.args]
    if all(n is o for n, o in zip(new_args, expr.args)):
        return expr
    try:
        return expr.func(*new_args)
    except TypeError:
        return expr.func(*new_args, evaluate=False)
