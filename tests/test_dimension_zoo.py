"""Dimension-family behaviors (reference: tests/test_dimensions.py —
SubDimension regions, ConditionalDimension subsampling + conditions,
DefaultDimension)."""

import numpy as np
import pytest

from devito_tpu import (Grid, Function, TimeFunction, Eq, Operator, solve,
                        ConditionalDimension, SubDimension, Dimension,
                        DefaultDimension, dimensions)


def test_conditional_subsampling_factor():
    """save every `factor` steps via ConditionalDimension(factor=...)
    (reference: test_dimension.py test_subsampled_time)."""
    g = Grid(shape=(12, 12), extent=(11., 11.))
    u = TimeFunction(name='u', grid=g)
    factor = 4
    tsub = ConditionalDimension('t_sub', parent=g.time_dim, factor=factor)
    usave = TimeFunction(name='usave', grid=g, save=5, time_dim=tsub)
    op = Operator([Eq(u.forward, u + 1), Eq(usave, u)])
    op.apply(time_M=15, dt=1.)
    d = np.asarray(usave.data)
    # row k holds u at t = k*factor (u(t) = t)
    for k in range(4):
        assert np.allclose(d[k], k * factor), (k, d[k, 0, 0])


def test_conditional_condition_guard():
    """elementwise boolean condition guards the assignment
    (reference: ConditionalDimension condition=...)."""
    g = Grid(shape=(10, 10), extent=(9., 9.))
    x, y = g.dimensions
    u = TimeFunction(name='u', grid=g)
    ci = ConditionalDimension(name='ci', parent=y, condition=y < 5)
    op = Operator(Eq(u.forward, u + 1, implicit_dims=[ci]))
    op.apply(time_M=2, dt=1.)
    # 2-slot rolling buffer: slot 0 holds u(t=2) after 3 iterations
    d = np.asarray(u.data)[0]
    assert np.allclose(d[:, :5], 2.)
    assert np.allclose(d[:, 5:], 0.)


def test_subdomain_middle_region():
    """SubDomain thickness specs restrict the write region
    (reference: test_subdomains.py)."""
    from devito_tpu import SubDomain

    class Middle(SubDomain):
        name = 'mid'

        def define(self, dims):
            x, y = dims
            return {x: ('middle', 3, 3), y: ('middle', 2, 2)}

    mid = Middle()
    g = Grid(shape=(12, 12), extent=(11., 11.), subdomains=(mid,))
    f = Function(name='f', grid=g)
    Operator(Eq(f, 1, subdomain=g.subdomains['mid'])).apply()
    d = np.asarray(f.data)
    assert np.allclose(d[3:-3, 2:-2], 1.)
    assert d[:3].sum() == 0 and d[:, :2].sum() == 0


def test_default_dimension_extra_axis():
    """DefaultDimension adds a non-grid axis (reference:
    DefaultDimension:405 — e.g. per-receiver buffers)."""
    g = Grid(shape=(8, 8), extent=(7., 7.))
    x, y = g.dimensions
    c = DefaultDimension(name='c', default_value=3)
    f = Function(name='f', grid=g, dimensions=(c, x, y),
                 shape=(3, 8, 8))
    assert f.shape == (3, 8, 8)
    f.data[:] = np.arange(3)[:, None, None]
    assert np.allclose(np.asarray(f.data)[2], 2.)


def test_free_dimensions_constructor():
    i, j = dimensions('i j')
    assert isinstance(i, Dimension) and i.name == 'i'


def test_time_bounds_validation():
    """OOB time_M raises a typed error (reference: _arg_check
    InvalidArgument)."""
    from devito_tpu.exceptions import InvalidArgument
    g = Grid(shape=(8, 8), extent=(7., 7.))
    u = TimeFunction(name='u', grid=g, save=5)
    op = Operator(Eq(u.forward, u + 1))
    with pytest.raises(InvalidArgument):
        op.apply(time_M=10, dt=1.)


def test_subdimension_in_user_equations():
    """SubDimension.left/right/middle via eq.subs(x, xi) — the
    reference's boundary-strip idiom (reference: types/dimension.py
    SubDimension:688; oracle-verified row pattern)."""
    import numpy as np
    from devito_tpu import Grid, TimeFunction, Eq, Operator, SubDimension
    g = Grid(shape=(12, 12))
    x, y = g.dimensions
    u = TimeFunction(name='u', grid=g)
    xl = SubDimension.left(name='xl', parent=x, thickness=3)
    xr = SubDimension.right(name='xr', parent=x, thickness=2)
    xm = SubDimension.middle(name='xm', parent=x, thickness_left=4,
                             thickness_right=5)
    Operator([Eq(u.forward, u + 1).subs(x, xl)]).apply(time_M=0, dt=1.)
    rows = np.asarray(u.data)[1].sum(axis=1)
    assert rows[:3].min() == 12. and rows[3:].max() == 0.

    v = TimeFunction(name='v', grid=g)
    Operator([Eq(v.forward, v + 1).subs(x, xr)]).apply(time_M=0, dt=1.)
    rows = np.asarray(v.data)[1].sum(axis=1)
    assert rows[-2:].min() == 12. and rows[:-2].max() == 0.

    w = TimeFunction(name='w', grid=g)
    Operator([Eq(w.forward, w + 1).subs(x, xm)]).apply(time_M=0, dt=1.)
    rows = np.asarray(w.data)[1].sum(axis=1)
    assert rows[4:7].min() == 12.
    assert rows[:4].max() == 0. and rows[7:].max() == 0.
