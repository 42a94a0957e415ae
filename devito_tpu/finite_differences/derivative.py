"""Lazy Derivative nodes.

Reference parity: devito/finite_differences/derivative.py (Derivative:24 —
dims, fd_order, deriv_order, side, x0 staggered evaluation point, ``.T``
transpose for adjoints) and finite_difference.py (expansion into weighted
sums of shifted accesses).
"""

import sympy
from sympy import Rational

from .differentiable import Differentiable, Add, Mul, evaluate_expr
from .tools import stencil_points
from ..utils import as_tuple

__all__ = ['Derivative']


def _normalize_x0(entry, dim):
    """Normalize an x0 entry to a Rational offset in grid-point units.

    Accepts: a number (already in point units), or an expression like
    ``x + x.spacing/2`` (reference API, spacing units)."""
    entry = sympy.sympify(entry)
    if entry.has(dim):
        off = entry - dim
        if dim.spacing in off.free_symbols:
            off = off.subs(dim.spacing, 1)
        return Rational(off)
    return Rational(entry)


def _expr_staggers(expr, dim):
    """The set of stagger offsets of the accesses in ``expr`` along
    ``dim``."""
    from ..types.basic import retrieve_functions
    offs = set()
    for f in retrieve_functions(expr):
        offs.add(f.function.stagger_offset(dim))
    return offs


def _expr_stagger(expr, dim):
    offs = _expr_staggers(expr, dim)
    if len(offs) == 1:
        return offs.pop()
    return Rational(0)


def _expr_any_stagger(expr):
    """True if any access in ``expr`` is a staggered function (in any
    dimension) — the reference keys its 2-point first-derivative bias on
    ``bool(expr.staggered)``, i.e. function-level staggering."""
    from ..types.basic import retrieve_functions
    for f in retrieve_functions(expr):
        fn = f.function
        for d in getattr(fn, 'space_dimensions', ()):
            if fn.stagger_offset(d) != 0:
                return True
    return False


class Derivative(Differentiable, sympy.Expr):
    """An unevaluated finite-difference derivative of an expression.

    ``Derivative(expr, x)``, ``Derivative(expr, (x, 2))``,
    ``Derivative(expr, x, y)`` (cross), with kwargs ``fd_order``, ``side``
    ('left'/'right'), ``x0`` ({dim: location}), ``weights`` (custom stencil
    weights), ``method`` ('FD'|'RSFD').
    """

    is_commutative = True

    def __new__(cls, expr, *dims, deriv_order=None, fd_order=None, side=None,
                x0=None, transpose=False, weights=None, method='FD', **kwargs):
        # Derivative of a constant is zero (the reference's Derivative
        # behaves likewise) — this is what lets linsolve's target->0/1
        # substitution probe work when the target sits inside a spatial
        # derivative (e.g. solve(Eq(pn.laplace), pn), 05_laplace.ipynb)
        if getattr(sympy.sympify(expr), 'is_number', False):
            return sympy.S.Zero
        # Normalize dims -> tuple of (dim, order)
        norm = []
        for d in dims:
            if isinstance(d, tuple):
                norm.append((d[0], int(d[1])))
            else:
                norm.append((d, 1))
        if deriv_order is not None and len(norm) == 1:
            norm = [(norm[0][0], int(deriv_order))]
        norm = tuple(norm)

        if fd_order is None:
            so = getattr(expr, 'space_order', None)
            fd_order = so if so is not None else 2
        elif isinstance(fd_order, dict):
            # per-dimension orders for cross derivatives (reference:
            # tests/test_derivatives.py test_xderiv_order:390 —
            # f.dxdy(fd_order={x: 2, y: 2}))
            so = getattr(expr, 'space_order', 2)
            fd_order = tuple(fd_order.get(d, so) for d, _ in norm)
        x0n = {}
        for k, v in (x0 or {}).items():
            x0n[k] = _normalize_x0(v, k)

        obj = sympy.Expr.__new__(cls, expr)
        obj._expr_arg = expr
        obj._dims = norm
        obj._fd_order = fd_order
        obj._side = side
        obj._x0 = x0n
        obj._transpose = bool(transpose)
        obj._weights = tuple(weights) if weights is not None else None
        obj._method = method
        return obj

    # -- sympy plumbing ---------------------------------------------------

    def __getnewargs_ex__(self):
        # sympy's Basic pickling reconstructs via ``cls(*args)`` with
        # args = (expr,) only, silently dropping dims/order/side/x0 —
        # a pickled Eq would then evaluate with its derivatives elided
        # (caught by tests/test_pickle_matrix.py test_derivative)
        return ((self._expr_arg,) + tuple(self._dims),
                {'fd_order': self._fd_order, 'side': self._side,
                 'x0': self._x0, 'transpose': self._transpose,
                 'weights': self._weights, 'method': self._method})

    @property
    def func(self):
        def _rebuild(*args):
            return Derivative(args[0], *self._dims, fd_order=self._fd_order,
                              side=self._side, x0=self._x0,
                              transpose=self._transpose, weights=self._weights,
                              method=self._method)
        return _rebuild

    def _hashable_content(self):
        # NB: must be plain-orderable (sympy's Add/Mul arg sorting compares
        # these entries with </>), hence string forms, cached. The function
        # *class ids* are included because same-named functions from
        # different constructions are distinct (reference caching
        # semantics) — string forms alone would make sympy's global
        # operation cache resurrect stale subtrees.
        try:
            return self._hc
        except AttributeError:
            from ..types.basic import retrieve_functions
            fids = tuple(sorted(id(type(f))
                                for f in retrieve_functions(self.expr)))
            self._hc = (
                sympy.srepr(self.expr), str(fids), str(self._dims),
                str(as_tuple(self._fd_order)), str(self._side),
                str(sorted((k.name, str(v)) for k, v in self._x0.items())),
                self._transpose, str(self._weights), self._method)
            return self._hc

    def __hash__(self):
        return hash(self._hashable_content())

    def __eq__(self, other):
        return (isinstance(other, Derivative)
                and self._hashable_content() == other._hashable_content())

    # -- public metadata --------------------------------------------------

    @property
    def expr(self):
        return self._expr_arg

    @property
    def dims(self):
        return tuple(d for d, _ in self._dims)

    @property
    def deriv_order(self):
        orders = tuple(o for _, o in self._dims)
        return orders[0] if len(orders) == 1 else orders

    @property
    def fd_order(self):
        return self._fd_order

    @property
    def side(self):
        return self._side

    @property
    def x0(self):
        return dict(self._x0)

    @property
    def weights(self):
        """Custom FD weights, or None (reference: Derivative.weights)."""
        return self._weights

    @property
    def T(self):
        """Transpose (adjoint) of this derivative: same weights, negated
        shifts (reference: Derivative.T — transpose mode for adjoints)."""
        return Derivative(self.expr, *self._dims, fd_order=self._fd_order,
                          side=self._side, x0=self._x0,
                          transpose=not self._transpose,
                          weights=self._weights, method=self._method)

    def __call__(self, x0=None, fd_order=None, side=None, weights=None,
                 method=None, w=None):
        """Re-parameterize (reference: ``u.dx(x0=..., fd_order=...)``;
        ``w=`` is the reference's alias for ``weights=``)."""
        weights = weights if weights is not None else w
        newx0 = dict(self._x0)
        if x0 is not None:
            if isinstance(x0, dict):
                for k, v in x0.items():
                    newx0[k] = _normalize_x0(v, k)
            else:
                newx0[self.dims[0]] = _normalize_x0(x0, self.dims[0])
        return Derivative(self.expr, *self._dims,
                          fd_order=fd_order if fd_order is not None
                          else self._fd_order,
                          side=side if side is not None else self._side,
                          x0=newx0, transpose=self._transpose,
                          weights=weights if weights is not None
                          else self._weights,
                          method=method or self._method)

    def _eval_at(self, target):
        """Project this derivative to evaluate at the stagger location of
        ``target`` (a function). Reference: Derivative._eval_at."""
        x0 = dict(self._x0)
        for d in self.dims:
            if d not in x0 and not d.is_Time:
                x0[d] = target.function.stagger_offset(d)
        return Derivative(self.expr, *self._dims, fd_order=self._fd_order,
                          side=self._side, x0=x0, transpose=self._transpose,
                          weights=self._weights, method=self._method)

    # -- expansion --------------------------------------------------------

    def _evaluate(self, x0=None, expand=True):
        """Expand into a weighted sum of shifted accesses."""
        if self._method == 'RSFD':
            from .rsfd import expand_rsfd
            return expand_rsfd(self, x0=x0)

        inner = evaluate_expr(self.expr, x0=x0)
        result = inner
        fd_orders = as_tuple(self._fd_order, len(self._dims))
        for (dim, order), fo in zip(self._dims, fd_orders):
            stags = _expr_staggers(result, dim)
            if len(stags) > 1:
                # mixed-stagger operand (e.g. div(b * v) with node b and
                # staggered v): the staggered lattice wins (reference:
                # fd_priority) and node factors are off-grid-interpolated
                # onto it before expansion
                from .differentiable import interp_for_fd
                lat = max(stags, key=lambda s: s != 0)
                result = interp_for_fd(result, {dim: lat})
                stag = lat
            else:
                stag = stags.pop() if stags else Rational(0)
            if dim in self._x0:
                target = self._x0[dim]
            elif x0 is not None and dim in x0:
                target = Rational(x0[dim])
            else:
                # Default evaluation on the expression's own lattice
                # (reference behavior: x0 defaults to expr.indices_ref, so
                # a bare staggered u.dx is the centered derivative at
                # u's own stagger; an Eq lhs re-projects via _eval_at)
                target = stag
            # First derivative at fd_order=2 demotes to the 2-point scheme
            # (reference generic_derivative:139-141: "strongly discouraged
            # so taking first order fd that is a lot better"), forward on
            # time/unstaggered expressions, backward on staggered ones
            if order == 1 and fo == 2 and self._side is None and \
                    self._weights is None:
                fo = 1
            bias = 'forward' if (dim.is_Time or
                                 not _expr_any_stagger(result)) \
                else 'backward'
            pairs = stencil_points(fo, order, x0=target, stagger=stag,
                                   side=self._side,
                                   transpose=self._transpose, bias=bias)
            if self._weights is not None:
                pairs = [(k, sympy.sympify(w))
                         for (k, _), w in zip(pairs, self._weights)]
            terms = []
            h = dim.spacing
            for k, w in pairs:
                if w == 0:
                    continue
                shifted = result if k == 0 else result.subs(dim, dim + k)
                terms.append(Mul(w * h**(-order), shifted))
            result = Add(*terms) if terms else sympy.S.Zero
        return result

    @property
    def evaluate(self):
        return self._evaluate()

    def __str__(self):
        ds = ', '.join(f"({d}, {o})" for d, o in self._dims)
        t = '.T' if self._transpose else ''
        return f"Derivative({self.expr}, {ds}){t}"

    __repr__ = __str__

    def _sympystr(self, printer):
        return str(self)
