"""Constant: a scalar runtime parameter.

Reference parity: devito/types/constant.py (Constant:10) — a symbol whose
value is supplied (or overridden) at ``op.apply`` time. In the TPU build a
Constant lowers to a traced scalar argument of the jitted step, so changing
its value never retriggers compilation.
"""

import numpy as np
import sympy

from ..finite_differences.differentiable import Differentiable

__all__ = ['Constant']


class Constant(Differentiable, sympy.Symbol):

    is_Constant = True
    is_DiscreteFunction = False

    def __new__(cls, name=None, value=0, dtype=np.float32, **kwargs):
        # assumptions follow the dtype, as in the reference
        # (tests/test_symbolics.py test_real:122): a complex-dtype
        # Constant must not carry real=True or sympy may simplify
        # conj/im away.
        # Construction is UNCACHED: instances are distinct carriers of
        # `value` while staying sympy-EQUAL by (name, assumptions) —
        # the cached variant made `Constant(name='u', value=2)` clobber
        # an earlier same-named Constant's value (reference pins the
        # opposite: tests/test_caching.py test_constant_new:432)
        dt = np.dtype(dtype)
        if np.issubdtype(dt, np.complexfloating):
            obj = sympy.Symbol.__xnew__(cls, name, imaginary=True)
        else:
            obj = sympy.Symbol.__xnew__(cls, name, real=True)
        obj._value = value
        obj._dtype = dt
        return obj

    def __getnewargs_ex__(self):
        return (), {'name': self.name, 'value': self._value,
                    'dtype': self._dtype}

    @property
    def data(self):
        return self._value

    @data.setter
    def data(self, v):
        self._value = v

    @property
    def value(self):
        return self._value

    @value.setter
    def value(self, v):
        self._value = v

    @property
    def dtype(self):
        return self._dtype

    @property
    def dimensions(self):
        return ()

    @property
    def _functions(self):
        return []

    def _hashable_content(self):
        return super()._hashable_content() + ('Constant',)
