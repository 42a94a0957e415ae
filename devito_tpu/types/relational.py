"""User API to specify relationals (reference:
devito/types/relational.py:27-167 — Le/Lt/Ge/Gt/Ne with negated/reversed
accessors, used to build ConditionalDimension conditions and subdomain
masks).

On the TPU build these lower through compiler/translate.py's relational
branch into elementwise compares fused into the consuming kernel, so thin
sympy subclasses carry all the semantics the reference attaches to them.
"""
import sympy

__all__ = ['Ge', 'Gt', 'Le', 'Lt', 'Ne', 'relational_min', 'relational_max']


class AbstractRel:
    """Mixin: negation/reversal algebra over the relation zoo."""

    @property
    def negated(self):
        for base, other in _ops.items():
            if isinstance(self, base):
                return other(*self.args)
        raise TypeError(f"No negation for {type(self)}")

    @property
    def reversed(self):
        for base, other in _rev.items():
            if isinstance(self, base):
                return other(self.rhs, self.lhs)
        raise TypeError(f"No reversal for {type(self)}")


class Le(AbstractRel, sympy.Le):
    """Less-than-or-equal relation usable in conditions."""

    def __new__(cls, lhs, rhs=0, subdomain=None, **kwargs):
        obj = sympy.Le.__new__(cls, lhs, rhs, **kwargs)
        obj._subdomain = subdomain
        return obj


class Lt(AbstractRel, sympy.Lt):
    """Strict less-than relation usable in conditions."""

    def __new__(cls, lhs, rhs=0, subdomain=None, **kwargs):
        obj = sympy.Lt.__new__(cls, lhs, rhs, **kwargs)
        obj._subdomain = subdomain
        return obj


class Ge(AbstractRel, sympy.Ge):
    """Greater-than-or-equal relation usable in conditions."""

    def __new__(cls, lhs, rhs=0, subdomain=None, **kwargs):
        obj = sympy.Ge.__new__(cls, lhs, rhs, **kwargs)
        obj._subdomain = subdomain
        return obj


class Gt(AbstractRel, sympy.Gt):
    """Strict greater-than relation usable in conditions."""

    def __new__(cls, lhs, rhs=0, subdomain=None, **kwargs):
        obj = sympy.Gt.__new__(cls, lhs, rhs, **kwargs)
        obj._subdomain = subdomain
        return obj


class Ne(AbstractRel, sympy.Ne):
    """Not-equal relation usable in conditions."""

    def __new__(cls, lhs, rhs=0, subdomain=None, **kwargs):
        obj = sympy.Ne.__new__(cls, lhs, rhs, **kwargs)
        obj._subdomain = subdomain
        return obj


_ops = {sympy.Le: Gt, sympy.Lt: Ge, sympy.Ge: Lt, sympy.Gt: Le,
        sympy.Ne: sympy.Eq}
_rev = {sympy.Le: Ge, sympy.Lt: Gt, sympy.Ge: Le, sympy.Gt: Lt,
        sympy.Ne: Ne}


def relational_min(expr, *args):
    """Minimum of a relational chain (reference helper)."""
    return sympy.Min(expr, *args)


def relational_max(expr, *args):
    """Maximum of a relational chain (reference helper)."""
    return sympy.Max(expr, *args)
