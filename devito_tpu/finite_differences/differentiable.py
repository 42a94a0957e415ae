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

__all__ = ['Differentiable', 'Add', 'Mul', 'Pow', 'diffify', 'evaluate_expr',
           'interp_for_fd']


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

    @staticmethod
    def _is_tensor(other):
        from ..types.tensor import TensorLike
        return isinstance(other, TensorLike)

    def __add__(self, other):
        if self._is_tensor(other):
            return NotImplemented
        return Add(self, sympy.sympify(other))

    def __radd__(self, other):
        return Add(sympy.sympify(other), self)

    def __sub__(self, other):
        if self._is_tensor(other):
            return NotImplemented
        return Add(self, Mul(sympy.Integer(-1), sympy.sympify(other)))

    def __rsub__(self, other):
        return Add(sympy.sympify(other), Mul(sympy.Integer(-1), self))

    def __mul__(self, other):
        if self._is_tensor(other):
            return NotImplemented
        return Mul(self, sympy.sympify(other))

    def __rmul__(self, other):
        return Mul(sympy.sympify(other), self)

    def __truediv__(self, other):
        if self._is_tensor(other):
            return NotImplemented
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
        """Sum of second derivatives; ``shift`` is a scalar or per-axis
        tuple evaluating each term at ``d + shift_i`` (reference:
        differentiable.py laplacian / make_shift_x0)."""
        from .derivative import Derivative
        dims = self.space_dimensions
        order = order or self.space_order
        terms = []
        for i, d in enumerate(dims):
            x0 = {}
            if shift is not None:
                s = shift[i] if isinstance(shift, (tuple, list)) else shift
                x0 = {d: d + sympy.Rational(s)}
            terms.append(Derivative(self, (d, 2), fd_order=order, x0=x0,
                                    method=method))
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
    for d in getattr(expr, 'dimensions', ()):
        # SubDomain-defined functions iterate SubDimensions: u.dx works
        # through the root name, producing a derivative along the
        # SubDimension (same spacing as its parent)
        if getattr(d, 'is_Sub', False):
            dims.setdefault(d.root.name, d)
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
        elif mod == 'c':
            # explicitly-centered first derivative (u.dxc/u.dyc): skips
            # the 2-point demotion the bare u.dx applies at fd_order=2
            # (reference: side=centered blocks generic_derivative:139)
            side = 'centered'
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


def interp_for_fd(expr, x0, _in_deriv=False):
    """Project mismatched-stagger accesses onto the evaluation lattice
    ``x0`` (reference: differentiable.py interp_for_fd:1263 + the off-grid
    evaluation in types/basic.py:1071).

    ``_in_deriv``: internal — the expression is a derivative operand, where
    single-lattice products are interpolated jointly (product first, then
    2-pt average) so transpose-form derivative pairs stay exact adjoints.

    Bare function accesses (and jointly, products of them) whose stagger
    differs from ``x0`` along some dimension are replaced by a 2-point
    (interp_order=2) average along each mismatched dimension; functions with
    ``avg_mode='harmonic'/'safe_harmonic'`` (e.g. the elastic mu) average
    1/f and invert (IEEE inf-propagation makes a zero neighbor yield 0, the
    behavior of the reference's SAFEINV macro).
    """
    import sympy as sp
    from .derivative import Derivative
    from .tools import stencil_points
    from ..types.basic import AbstractFunction

    if x0 is None:
        return expr

    def _mismatch(fn_access):
        out = []
        f = fn_access.function
        for d, target in x0.items():
            if not d.is_Space:
                continue
            stag = f.stagger_offset(d)
            if (stag - sympy.Rational(target)) % 1 != 0:
                out.append((d, sympy.Rational(target), stag))
        return out

    def _avg(e, spec):
        terms = [(sp.S.One, e)]
        for d, target, stag in spec:
            pairs = stencil_points(2, 0, x0=target, stagger=stag)
            terms = [(w * w2, (t.subs(d, d + k) if k != 0 else t))
                     for (w2, t) in terms for (k, w) in pairs]
        return Add(*[Mul(w, t) for w, t in terms])

    def _interp_access(a):
        spec = _mismatch(a)
        if not spec:
            return a
        f = a.function
        if getattr(type(f), '_avg_mode', 'arithmetic') in ('harmonic',
                                                           'safe_harmonic'):
            return Pow(_avg(Pow(a, sp.Integer(-1)), spec), sp.Integer(-1))
        return _avg(a, spec)

    def _walk(e, in_deriv=False):
        if isinstance(e, AbstractFunction):
            return _interp_access(e)
        if isinstance(e, Derivative):
            sub_x0 = {d: v for d, v in x0.items() if d not in e.dims}
            inner = _walk_with(e.expr, sub_x0)
            if inner is e.expr:
                return e
            return Derivative(inner, *e._dims, fd_order=e._fd_order,
                              side=e._side, x0=e._x0,
                              transpose=e._transpose, weights=e._weights,
                              method=e._method)
        if isinstance(e, sp.Mul) and in_deriv:
            # A derivative OPERAND product: interpolate the WHOLE product
            # jointly when every access inside (coefficient fields such as
            # cos(theta) included) sits on one common lattice mismatched
            # with x0 — i.e. form the product on its natural lattice, then
            # 2-pt average the product onto x0. Required so that the
            # adjoint's in-product coefficients, e.g.
            # `(cos(theta)*(eps*p)).dy` at an edge, pair EXACTLY with the
            # forward's out-of-product coefficients
            # `cos(theta)*eps*(vx.dy)` at the node (reference analog:
            # interp_for_fd Mul rule, differentiable.py:1273).
            from ..types.basic import retrieve_functions
            accs = [a for a in retrieve_functions(e)]
            per_dim_ok = bool(accs)
            spec = {}
            for d, target in x0.items():
                if not d.is_Space:
                    continue
                stags = set()
                for a in accs:
                    f = a.function
                    if d in getattr(f, 'space_dimensions', ()):
                        stags.add(f.stagger_offset(d))
                mism = [s for s in stags
                        if (s - sympy.Rational(target)) % 1 != 0]
                if not mism:
                    continue
                if len(stags) > 1 or any(
                        getattr(type(a.function), '_avg_mode',
                                'arithmetic') != 'arithmetic'
                        for a in accs):
                    per_dim_ok = False  # disagreement / harmonic: fall back
                    break
                spec[d] = (d, sympy.Rational(target), mism[0])
            if per_dim_ok and spec:
                return _avg(e, list(spec.values()))
        if isinstance(e, sp.Mul):
            # group mismatched arithmetic bare accesses, interpolate the
            # product jointly (reference Mul rule, differentiable.py:1273)
            group, others = [], []
            gspec = {}
            for a in e.args:
                if isinstance(a, AbstractFunction):
                    spec = _mismatch(a)
                    mode = getattr(type(a.function), '_avg_mode',
                                   'arithmetic')
                    if spec and mode == 'arithmetic':
                        group.append(a)
                        for s in spec:
                            gspec[s[0]] = s
                        continue
                others.append(a)
            if group:
                # Products gather on the HALF (staggered) lattice. When the
                # target x0 is the integer lattice and some factors sit on
                # the half lattice (e.g. `(cos(theta) * vx).dy` at NODE with
                # vx x-staggered), project the remaining factors onto the
                # half lattice, multiply THERE, then 2-pt average the whole
                # product back to x0. This makes `c * u.dx` (at the edge)
                # and `(c * w).dx` (at the node) exact mutual transposes —
                # required for staggered-TTI adjoint dot tests at fp64
                # accuracy (reference analog: Mul._gather_for_diff,
                # differentiable.py:703 — staggered lattice wins).
                half = [s for s in gspec.values()
                        if (sympy.Rational(s[1]) % 1) == 0]
                if half:
                    sub = dict(x0)
                    for d, t, s in half:
                        sub[d] = s
                    new_args = [interp_for_fd(a, sub) for a in e.args]
                    return _avg(Mul(*new_args),
                                [(d, t, s) for (d, t, s) in half])
                joint = _avg(Mul(*group) if len(group) > 1 else group[0],
                             list(gspec.values()))
                return Mul(joint, *[_walk(o) for o in others])
            return Mul(*[_walk(o) for o in others])
        if not isinstance(e, sp.Basic) or not e.args:
            return e
        new_args = [_walk(a, in_deriv=in_deriv) for a in e.args]
        if all(n is o for n, o in zip(new_args, e.args)):
            return e
        try:
            return e.func(*new_args)
        except TypeError:
            return e.func(*new_args, evaluate=False)

    def _walk_with(e, sub_x0):
        if not sub_x0:
            return e
        return interp_for_fd(e, sub_x0, _in_deriv=True)

    return _walk(sympy.sympify(expr), in_deriv=_in_deriv)


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
