"""Differentiable elementary functions.

Reference parity: devito/finite_differences/elementary.py — sin/cos/...
wrappers whose applications participate in differentiable arithmetic (so
``sin(theta) * u.dx`` keeps derivative shortcuts working).
"""

import sympy

from .differentiable import Differentiable, Pow, diffify

__all__ = ['sin', 'cos', 'tan', 'sqrt', 'exp', 'log', 'sinh', 'cosh',
           'tanh', 'asin', 'acos', 'atan', 'floor', 'ceiling', 'Abs',
           'Min', 'Max', 'sign']


def _wrap(sympy_cls, name):
    cls = type(name, (Differentiable, sympy_cls), {})
    return cls


sin = _wrap(sympy.sin, 'sin')
cos = _wrap(sympy.cos, 'cos')
tan = _wrap(sympy.tan, 'tan')
exp = _wrap(sympy.exp, 'exp')
log = _wrap(sympy.log, 'log')
sinh = _wrap(sympy.sinh, 'sinh')
cosh = _wrap(sympy.cosh, 'cosh')
tanh = _wrap(sympy.tanh, 'tanh')
asin = _wrap(sympy.asin, 'asin')
acos = _wrap(sympy.acos, 'acos')
atan = _wrap(sympy.atan, 'atan')
floor = _wrap(sympy.floor, 'floor')
ceiling = _wrap(sympy.ceiling, 'ceiling')
Abs = _wrap(sympy.Abs, 'Abs')
Min = _wrap(sympy.Min, 'Min')
Max = _wrap(sympy.Max, 'Max')
sign = _wrap(sympy.sign, 'sign')


def sqrt(x):
    return Pow(sympy.sympify(x), sympy.Rational(1, 2))
