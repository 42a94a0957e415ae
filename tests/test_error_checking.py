"""In-loop stability scan (reference: tests/test_error_checking.py,
passes/iet/errors.py check_stability — errctl='max')."""

import numpy as np
import pytest

from devito_tpu import Eq, Function, Grid, Operator, TimeFunction
from devito_tpu.exceptions import ExecutionError


@pytest.mark.parametrize("expr", ['u/f', '(u + v)/f'])
def test_stability(expr):
    grid = Grid(shape=(10, 10))
    f = Function(name='f', grid=grid, space_order=2)  # noqa: F841
    u = TimeFunction(name='u', grid=grid, space_order=2)
    v = TimeFunction(name='v', grid=grid, space_order=2)  # noqa: F841
    eq = Eq(u.forward, eval(expr))
    op = Operator(eq, opt=('advanced', {'errctl': 'max'}))
    u.data[:] = 1.
    v.data[:] = 2.
    with pytest.raises(ExecutionError):
        op.apply(time_M=200, dt=.1)


def test_stability_clean_run():
    grid = Grid(shape=(10, 10))
    u = TimeFunction(name='u', grid=grid, space_order=2)
    op = Operator(Eq(u.forward, u * 0.5),
                  opt=('advanced', {'errctl': 'max'}))
    u.data[:] = 1.
    op.apply(time_M=200, dt=.1)  # no raise
    assert np.isfinite(u.data).all()
