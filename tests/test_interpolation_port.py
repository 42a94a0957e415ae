"""Ports of the reference's interpolation test matrix
(reference: tests/test_interpolation.py — generic interpolate/inject
behaviors beyond the seismic-suite and oracle coverage)."""

import numpy as np
import pytest

from devito_tpu import (Grid, Function, TimeFunction, Eq, Operator,
                        SparseFunction, SparseTimeFunction)


def unit_box(name='a', shape=(11, 11), grid=None):
    """Function filled with its x-coordinate (reference idiom)."""
    grid = grid or Grid(shape=shape)
    a = Function(name=name, grid=grid)
    xs = np.linspace(0., 1., shape[0])
    a.data[:] = xs.reshape((-1,) + (1,) * (len(shape) - 1))
    return a


def unit_box_time(name='a', shape=(11, 11)):
    grid = Grid(shape=shape)
    a = TimeFunction(name=name, grid=grid, time_order=1)
    xs = np.linspace(0., 1., shape[0])
    a.data[:] = xs.reshape((1, -1) + (1,) * (len(shape) - 1))
    return a


def points(grid, ranges, npoints, name='points'):
    """SparseFunction with npoints points spread across `ranges`."""
    p = SparseFunction(name=name, grid=grid, npoint=npoints,
                       coordinates=np.stack(
                           [np.linspace(lo, hi, npoints)
                            for lo, hi in ranges], axis=1))
    return p


def time_points(grid, ranges, npoints, nt, name='points'):
    return SparseTimeFunction(
        name=name, grid=grid, npoint=npoints, nt=nt,
        coordinates=np.stack([np.linspace(lo, hi, npoints)
                              for lo, hi in ranges], axis=1))


SHAPE_COORDS = [((11, 11), [(.05, .9), (.01, .8)]),
                ((11, 11, 11), [(.05, .9), (.01, .8), (0.07, 0.84)])]


@pytest.mark.parametrize('shape, coords', SHAPE_COORDS)
def test_interpolate(shape, coords):
    """Interpolating the x-coordinate field recovers each point's
    x-coordinate (reference: test_interpolate:128)."""
    a = unit_box(shape=shape)
    p = points(a.grid, coords, npoints=20)
    Operator(p.interpolate(a)).apply()
    assert np.allclose(np.asarray(p.data),
                       np.asarray(p.coordinates.data)[:, 0], rtol=1e-6)


@pytest.mark.parametrize('shape, coords', SHAPE_COORDS)
def test_interpolate_cumm(shape, coords):
    """increment=True accumulates onto existing point data
    (reference: test_interpolate_cumm:143)."""
    a = unit_box(shape=shape)
    p = points(a.grid, coords, npoints=20)
    p.data[:] = 1.
    Operator(p.interpolate(a, increment=True)).apply()
    assert np.allclose(np.asarray(p.data),
                       np.asarray(p.coordinates.data)[:, 0] + 1.,
                       rtol=1e-6)


def test_interpolate_time_shift():
    """u_t shifts which time row of the field is read
    (reference: test_interpolate_time_shift:160)."""
    a = unit_box_time(shape=(11, 11))
    t = a.grid.time_dim
    a.data[1] = 2. * np.asarray(a.data[0])
    p = time_points(a.grid, [(.05, .9), (.01, .8)], npoints=20, nt=10)
    Operator(p.interpolate(a, u_t=t + 1)).apply(time_M=0, dt=1.)
    assert np.allclose(np.asarray(p.data)[0],
                       2. * np.asarray(p.coordinates.data)[:, 0],
                       rtol=1e-6)


def test_interpolation_dx():
    """Interpolation of a derivative expression
    (reference: test_interpolation_dx:249)."""
    grid = Grid(shape=(11, 11))
    u = TimeFunction(name='u', grid=grid, space_order=2)
    u.data[:] = 0.
    # u = x^2 -> du/dx = 2x (interior, exact for so=2)
    xs = np.linspace(0., 1., 11)
    u.data[0] = (xs ** 2).reshape(-1, 1)
    p = time_points(grid, [(.2, .8), (.5, .5)], npoints=7, nt=2)
    Operator(p.interpolate(u.dx)).apply(time_M=0, dt=1.)
    got = np.asarray(p.data)[0]
    # FD of x^2 on the grid then linearly interpolated: compare against
    # 2x at the points with grid-resolution tolerance
    want = 2. * np.asarray(p.coordinates.data)[:, 0]
    assert np.allclose(got, want, atol=0.12)


@pytest.mark.parametrize('shape, coords, result', [
    ((11, 11), [(.05, .95), (.45, .45)], 1.),
    ((11, 11, 11), [(.05, .95), (.45, .45), (.45, .45)], 0.5)])
def test_inject(shape, coords, result):
    """Injection scatters weighted contributions to corner points
    (reference: test_inject:271)."""
    a = unit_box(shape=shape)
    a.data[:] = 0.
    p = points(a.grid, coords, npoints=19)
    Operator(p.inject(field=a, expr=Function(name='dummy', grid=a.grid)
                      + 1.)).apply()
    indices = [slice(4, 6)] * len(shape)
    indices[0] = slice(1, -1)
    assert np.allclose(np.asarray(a.data)[tuple(indices)], result,
                       rtol=1e-5)


def test_inject_from_field():
    """Injection of values read from another field
    (reference: test_inject_from_field:381)."""
    grid = Grid(shape=(11, 11))
    a = Function(name='a', grid=grid)
    a.data[:] = 0.
    b = Function(name='b', grid=grid)
    b.data[:] = 1.
    p = points(grid, [(.05, .95), (.45, .45)], npoints=19)
    Operator(p.inject(field=a, expr=b)).apply()
    assert np.allclose(np.asarray(a.data)[1:-1, 4:6], 1., rtol=1e-5)


def test_edge_sparse():
    """Points exactly on domain corners/edges interpolate without
    out-of-bounds corner reads (reference: test_edge_sparse:400)."""
    grid = Grid(shape=(11, 11), extent=(10., 10.))
    u = unit_box(shape=(11, 11), grid=grid)
    p = SparseFunction(name='p', grid=grid, npoint=4,
                       coordinates=[[0., 0.], [10., 10.],
                                    [0., 10.], [10., 0.]])
    Operator(p.interpolate(u)).apply()
    got = np.asarray(p.data)
    assert np.allclose(got, [0., 1., 0., 1.], atol=1e-6)


@pytest.mark.parametrize('stagg', ['x', 'y'])
def test_interpolate_staggered(stagg):
    """Interpolation from a staggered field accounts for the half-cell
    offset (reference: test_interpolate_staggered:427)."""
    grid = Grid(shape=(11, 11), extent=(10., 10.))
    x, y = grid.dimensions
    s = x if stagg == 'x' else y
    a = Function(name='a', grid=grid, staggered=s)
    # value = staggered x-coordinate: i + 0.5 along the staggered axis
    xs = np.arange(11) + 0.5
    if stagg == 'x':
        a.data[:] = xs.reshape(-1, 1)
    else:
        a.data[:] = xs.reshape(1, -1)
    p = SparseFunction(name='p', grid=grid, npoint=5,
                       coordinates=np.stack(
                           [np.linspace(2., 8., 5)] * 2, axis=1))
    Operator(p.interpolate(a)).apply()
    # interpolating the staggered coordinate field returns the point's
    # coordinate along that axis
    assert np.allclose(np.asarray(p.data), np.linspace(2., 8., 5),
                       atol=1e-6)


def test_sparse_function_no_time():
    """SparseFunction (no time axis) inject + interpolate round-trip."""
    grid = Grid(shape=(11, 11), extent=(10., 10.))
    a = Function(name='a', grid=grid)
    a.data[:] = 0.
    p = SparseFunction(name='p', grid=grid, npoint=1,
                       coordinates=[[5., 5.]])
    p.data[:] = 7.
    Operator(p.inject(field=a, expr=p)).apply()
    assert abs(float(np.asarray(a.data)[5, 5]) - 7.) < 1e-6
    q = SparseFunction(name='q', grid=grid, npoint=1,
                       coordinates=[[5., 5.]])
    Operator(q.interpolate(a)).apply()
    assert abs(float(np.asarray(q.data)[0]) - 7.) < 1e-6


def test_interp_injection_concatenation():
    """Interpolation + Injection (and + a bare Eq) concatenate like the
    reference's plain lists (advisor r3: list(other) raised on
    non-iterables)."""
    from devito_tpu import TimeFunction, Eq
    grid = Grid(shape=(11, 11), extent=(10., 10.))
    u = TimeFunction(name='u', grid=grid, space_order=2, time_order=1)
    sf = SparseTimeFunction(name='sf', grid=grid, npoint=1, nt=4,
                            coordinates=[[5., 5.]])
    sf2 = SparseTimeFunction(name='sf2', grid=grid, npoint=1, nt=4,
                             coordinates=[[5., 5.]])
    interp = sf.interpolate(u)
    inj = sf2.inject(field=u.forward, expr=sf2)
    both = interp + inj
    assert isinstance(both, list) and len(both) == 2
    eq = Eq(u.forward, u)
    assert len(sf.interpolate(u) + eq) == 2
    assert len(eq + sf.interpolate(u)) == 2
    sf2.data[:] = 1.
    op = Operator([Eq(u.forward, u)] + (sf.interpolate(u)
                                        + sf2.inject(u.forward, expr=sf2)))
    op.apply(time_m=0, time_M=1, dt=1.0)
    assert abs(float(np.asarray(u.data)[0, 5, 5]) - 2.) < 1e-6


def test_interpolate_p_t_shift():
    """p_t= shifts the RECORDED row (reference:
    test_interpolate_time_shift:160 — the p_t arm)."""
    grid = Grid(shape=(11, 11))
    a = TimeFunction(name='a', grid=grid, save=10)
    for i in range(10):
        a.data[i] = float(i)
    p = SparseTimeFunction(name='p', grid=grid, npoint=4, nt=10,
                           coordinates=np.random.RandomState(1).rand(4, 2))
    pt = p.dimensions[0]
    Operator(p.interpolate(a, p_t=pt + 1)).apply(time_m=0, time_M=8, dt=1.)
    d = np.asarray(p.data)
    assert np.allclose(d[0], 0.0)                   # row 0 never written
    for i in range(1, 10):
        assert np.allclose(d[i], float(i - 1), atol=1e-5)


def test_interpolate_u_t_and_p_t():
    """u_t and p_t compose (reference: the combined arm)."""
    grid = Grid(shape=(11, 11))
    a = TimeFunction(name='a', grid=grid, save=10)
    for i in range(10):
        a.data[i] = float(i)
    p = SparseTimeFunction(name='p', grid=grid, npoint=4, nt=10,
                           coordinates=np.random.RandomState(2).rand(4, 2))
    t = a.dimensions[0]
    pt = p.dimensions[0]
    Operator(p.interpolate(a, u_t=t + 1, p_t=pt + 1)).apply(
        time_m=0, time_M=8, dt=1.)
    d = np.asarray(p.data)
    for i in range(1, 10):
        assert np.allclose(d[i], float(i), atol=1e-5)


def test_interpolate_expr_with_point_dim():
    """Interpolating an expression scaled by the sparse POINT dimension
    (reference: test_interpolate_custom:211 — the per-point scaling
    pattern; here via the time row instead of a custom dim)."""
    grid = Grid(shape=(11, 11))
    a = unit_box(name='ax', grid=grid)
    p = time_points(grid, [(.05, .9), (.01, .8)], npoints=5, nt=3,
                    name='pc')
    xcoords = np.asarray(p.coordinates.data)[:, 0]
    t = grid.time_dim
    op = Operator(p.interpolate(a * t))
    op.apply(time_m=0, time_M=2, dt=1.)
    d = np.asarray(p.data)
    assert np.allclose(d[0], 0.0 * xcoords, atol=1e-5)
    assert np.allclose(d[1], 1.0 * xcoords, atol=1e-5)
    assert np.allclose(d[2], 2.0 * xcoords, atol=1e-5)


def test_inject_time_shift():
    """Injection with u_t back-shift (reference:
    test_inject_time_shift:319)."""
    grid = Grid(shape=(11, 11), extent=(1., 1.))
    a = TimeFunction(name='at', grid=grid, save=4)
    p = time_points(grid, [(.45, .60), (.45, .60)], npoints=4, nt=4,
                    name='pi')
    p.data[:] = 1.
    t = a.dimensions[0]
    op = Operator(p.inject(field=a, expr=p, u_t=t - 1))
    op.apply(time_m=1, time_M=3, dt=1.)
    d = np.asarray(a.data)
    # rows 0..2 received the injection (u_t = t-1), row 3 did not
    assert d[:3].sum() > 0 and np.allclose(d[3], 0.)


def test_inject_multi_expr_list():
    """Injection of several eqs via list concatenation (reference:
    test_multi_inject:295 shape)."""
    grid = Grid(shape=(11, 11), extent=(1., 1.))
    a = Function(name='am', grid=grid)
    b = Function(name='bm', grid=grid)
    p = points(grid, [(.45, .60), (.45, .60)], npoints=4, name='pm')
    exprs = p.inject(field=a, expr=1.) + p.inject(field=b, expr=2.)
    Operator(exprs).apply()
    da, db = np.asarray(a.data), np.asarray(b.data)
    assert abs(da.sum() - 4.0) < 1e-5
    assert abs(db.sum() - 8.0) < 1e-5


def test_wrong_coords_shape_raises():
    """Mis-shaped coordinates raise a typed error (reference:
    test_wrong_coords:859)."""
    grid = Grid(shape=(11, 11))
    with pytest.raises(Exception):
        SparseFunction(name='pw', grid=grid, npoint=3,
                       coordinates=np.zeros((3, 5)))
