"""Pallas stencil backend vs the XLA slice path (interpret mode on CPU).

Reference analog: the generated-code structure tests (tests/test_dle.py)
— here the two lowerings must agree numerically instead.
"""

import numpy as np
import pytest

from devito_tpu import (Grid, TimeFunction, Function, Eq, Operator, solve,
                        switchconfig)


@pytest.mark.parametrize('shape', [(32, 32), (16, 24, 32)])
def test_pallas_matches_xla(shape):
    g = Grid(shape=shape, extent=tuple(float(s - 1) for s in shape))
    u = TimeFunction(name='u', grid=g, time_order=2, space_order=4)
    vp = Function(name='vp', grid=g)
    vp.data[:] = 1.5
    st = solve((1 / (vp * vp)) * u.dt2 - u.laplace, u.forward)
    mid = tuple(s // 2 for s in shape)

    u.data[(0,) + mid] = 1.0
    op1 = Operator(Eq(u.forward, st), subs=g.spacing_map)
    with switchconfig(backend='xla'):
        op1.apply(time_M=5, dt=0.05)
    ref = np.array(u.data)

    u.data[:] = 0
    u.data[(0,) + mid] = 1.0
    op2 = Operator(Eq(u.forward, st), subs=g.spacing_map)
    with switchconfig(backend='pallas'):
        op2.apply(time_M=5, dt=0.05)
    got = np.array(u.data)

    assert getattr(op2.schedule.body[0], '_pallas_plan', None) is not None
    assert np.abs(got - ref).max() < 1e-5


def test_pallas_fallback_increment(grid2d):
    # increments stay on the XLA path but still execute correctly
    from devito_tpu import Inc
    u = TimeFunction(name='u', grid=grid2d)
    f = Function(name='f', grid=grid2d)
    u.data[:] = 1.0
    op = Operator([Eq(u.forward, u), Inc(f, u)])
    with switchconfig(backend='pallas'):
        op.apply(time_M=3, dt=1.0)
    assert np.allclose(f.data, 4.0)
