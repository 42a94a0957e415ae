"""User-facing equation types.

Reference parity: devito/types/equation.py (Eq:13, Inc:206, Reduction
family:191-242). ``Eq(lhs, rhs, subdomain=..., implicit_dims=...)``;
``Inc`` is the ``+=`` (accumulation) form used for reductions/gradients.
"""

import sympy

from ..finite_differences.differentiable import evaluate_expr
from ..finite_differences.derivative import Derivative

__all__ = ['Eq', 'Inc', 'ReduceMax', 'ReduceMin', 'solve_eq_placeholder']


class Eq(sympy.Eq):
    """An assignment ``lhs := rhs`` over the (sub)domain."""

    is_Increment = False
    _reduction = None

    def __new__(cls, lhs, rhs=0, subdomain=None, coefficients=None,
                implicit_dims=None, **kwargs):
        kwargs.setdefault('evaluate', False)
        obj = sympy.Eq.__new__(cls, lhs, rhs, **kwargs)
        obj._subdomain = subdomain
        obj._coefficients = coefficients
        obj._implicit_dims = implicit_dims
        return obj

    @property
    def subdomain(self):
        return self._subdomain

    @property
    def implicit_dims(self):
        return self._implicit_dims

    @property
    def evaluate(self):
        """Expand all Derivative nodes; staggered derivatives default to
        evaluation at the lhs function's stagger location (reference:
        Derivative._eval_at)."""
        lhs, rhs = self.lhs, self.rhs
        x0 = None
        from .basic import AbstractFunction
        if isinstance(lhs, AbstractFunction):
            x0 = {d: lhs.function.stagger_offset(d)
                  for d in lhs.function.dimensions if d.is_Space}
        new_lhs = evaluate_expr(lhs)
        new_rhs = evaluate_expr(rhs, x0=x0)
        return self.func(new_lhs, new_rhs)

    @property
    def func(self):
        def _rebuild(*args, **kwargs):
            return type(self)(*args, subdomain=self._subdomain,
                              coefficients=self._coefficients,
                              implicit_dims=self._implicit_dims, **kwargs)
        return _rebuild

    def xreplace(self, rules):
        return self.func(self.lhs.xreplace(rules), self.rhs.xreplace(rules))

    def subs(self, *args, **kwargs):
        if len(args) == 1 and isinstance(args[0], dict):
            rules = args[0]
            return self.func(self.lhs.subs(rules), self.rhs.subs(rules))
        return self.func(self.lhs.subs(*args, **kwargs),
                         self.rhs.subs(*args, **kwargs))

    def __str__(self):
        return f"{type(self).__name__}({self.lhs}, {self.rhs})"

    __repr__ = __str__


class Inc(Eq):
    """Accumulation: ``lhs += rhs`` (reference: Inc:206). Duplicate writes
    (e.g. sparse injection) sum."""
    is_Increment = True


class ReduceMax(Eq):
    is_Increment = True
    _reduction = 'max'


class ReduceMin(Eq):
    is_Increment = True
    _reduction = 'min'


def solve_eq_placeholder():
    pass
