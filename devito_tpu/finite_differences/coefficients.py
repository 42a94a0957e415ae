"""Legacy custom-FD-coefficients API (reference:
devito/finite_differences/coefficients.py Coefficient:6, Substitutions:35
— user-supplied stencil weights attached to equations via
``Eq(..., coefficients=Substitutions(...))``).

Matching the reference's semantics (verified against its execution):
supplied weights replace the Taylor weights but are still scaled by
``spacing**-deriv_order``. The modern per-derivative route
``u.dx2(weights=[...])`` shares the same scaling.
"""

import numpy as np
import sympy

from .derivative import Derivative

__all__ = ['Coefficient', 'Substitutions']


class Coefficient:
    """Custom weights for the ``deriv_order``-th derivative of
    ``function`` along ``dimension``."""

    def __init__(self, deriv_order, function, dimension, weights):
        self.deriv_order = int(deriv_order)
        self.function = function
        self.dimension = dimension
        self.weights = [sympy.sympify(float(w)) for w in np.asarray(weights)]

    def __repr__(self):
        return (f"Coefficient(d{self.deriv_order}/d{self.dimension}^"
                f"{self.deriv_order} {self.function.name}: {self.weights})")


class Substitutions:
    """A set of Coefficients applied to an equation's derivatives."""

    def __init__(self, *coefficients):
        self.coefficients = coefficients

    def find(self, function, dimension, deriv_order):
        for c in self.coefficients:
            if (c.deriv_order == deriv_order
                    and c.dimension is dimension
                    and c.function.function.name == function.name):
                return c.weights
        return None

    def apply(self, expr):
        """Rebuild ``expr`` with matching Derivative nodes carrying the
        custom weights."""
        if isinstance(expr, Derivative):
            if len(expr._dims) == 1 and expr._weights is None:
                dim, order = expr._dims[0]
                from ..types.basic import AbstractFunction
                inner = expr.expr
                if isinstance(inner, AbstractFunction):
                    w = self.find(inner.function, dim, order)
                    if w is not None:
                        return Derivative(inner, (dim, order),
                                          fd_order=expr._fd_order,
                                          side=expr._side, x0=expr._x0,
                                          transpose=expr._transpose,
                                          weights=w,
                                          method=expr._method)
            return expr
        if not isinstance(expr, sympy.Basic) or not expr.args:
            return expr
        new_args = [self.apply(a) for a in expr.args]
        if all(n is o for n, o in zip(new_args, expr.args)):
            return expr
        try:
            return expr.func(*new_args)
        except TypeError:
            return expr.func(*new_args, evaluate=False)
