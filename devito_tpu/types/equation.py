"""User-facing equation types.

Reference parity: devito/types/equation.py (Eq:13, Inc:206, Reduction
family:191-242). ``Eq(lhs, rhs, subdomain=..., implicit_dims=...)``;
``Inc`` is the ``+=`` (accumulation) form used for reductions/gradients.
"""

import sympy

from ..finite_differences.differentiable import evaluate_expr
from ..finite_differences.derivative import Derivative

__all__ = ['Eq', 'Inc', 'ReduceMax', 'ReduceMin', 'TensorEq']


class Eq(sympy.Eq):
    """An assignment ``lhs := rhs`` over the (sub)domain."""

    is_Increment = False
    _reduction = None

    def __new__(cls, lhs, rhs=0, subdomain=None, coefficients=None,
                implicit_dims=None, **kwargs):
        from .tensor import TensorLike
        if isinstance(lhs, TensorLike) or isinstance(rhs, TensorLike):
            # Vector/tensor equation: a lightweight container flattened to
            # per-component equations during lowering (reference:
            # operator.py _lower_exprs flattening)
            return TensorEq(cls, lhs, rhs, subdomain=subdomain,
                            coefficients=coefficients,
                            implicit_dims=implicit_dims)
        kwargs.setdefault('evaluate', False)
        obj = sympy.Eq.__new__(cls, lhs, rhs, **kwargs)
        obj._subdomain = subdomain
        obj._coefficients = coefficients
        obj._implicit_dims = implicit_dims
        return obj

    def __getnewargs_ex__(self):
        # sympy reconstructs via ``cls(lhs, rhs)`` on unpickle, dropping
        # the subdomain/coefficients/implicit_dims metadata set in
        # ``__new__`` (tests/test_pickle_matrix.py test_eq_subdomain)
        return (tuple(self.args),
                {'subdomain': self._subdomain,
                 'coefficients': self._coefficients,
                 'implicit_dims': self._implicit_dims,
                 'evaluate': False})

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
        from ..finite_differences.differentiable import interp_for_fd
        coeffs = self._coefficients
        if coeffs is not None and hasattr(coeffs, 'apply'):
            # legacy custom-FD-weights API (reference:
            # finite_differences/coefficients.py Substitutions)
            rhs = coeffs.apply(rhs)
        if isinstance(lhs, AbstractFunction):
            x0 = {d: lhs.function.stagger_offset(d)
                  for d in lhs.function.dimensions if d.is_Space}
            # project mismatched-stagger material parameters to the lhs
            # lattice (reference: interp_for_fd)
            rhs = interp_for_fd(rhs, x0)
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


class TensorEq:
    """A vector/tensor-valued equation; flattened at lowering."""

    def __init__(self, eqcls, lhs, rhs, subdomain=None, coefficients=None,
                 implicit_dims=None):
        self.eqcls = eqcls
        self.lhs = lhs
        self.rhs = rhs
        self._subdomain = subdomain
        self._coefficients = coefficients
        self._implicit_dims = implicit_dims

    @property
    def subdomain(self):
        return self._subdomain

    def flatten(self):
        from .tensor import TensorLike
        out = []
        seen = set()
        lhs_c = self.lhs._comps
        for i, row in enumerate(lhs_c):
            for j, lc in enumerate(row):
                if lc == 0 or id(lc) in seen:
                    continue
                seen.add(id(lc))
                rc = self.rhs._comps[i][j] \
                    if isinstance(self.rhs, TensorLike) else self.rhs
                out.append(self.eqcls(lc, rc, subdomain=self._subdomain,
                                      coefficients=self._coefficients,
                                      implicit_dims=self._implicit_dims))
        return out

    def __repr__(self):
        return f"TensorEq({self.lhs!r}, {self.rhs!r})"
