"""Port of the reference runtime-argument matrix
(/root/reference/tests/test_operator.py TestArguments): bare-dim size
overrides, per-dimension subranges, per-function data overrides (by a
differently- or identically-named symbol), time-bound inference from the
smallest saved field, and derivation-order/consistency rules.

The reference asserts on the generated C's argument map; here the
observable contract is execution effect (which region got written, which
buffer received the result), so every case verifies by running.
"""

import numpy as np
import pytest

from devito_tpu import (Eq, Grid, Function, Operator, TimeFunction,
                        SparseTimeFunction)
from devito_tpu.exceptions import InvalidArgument


def test_override_function_size():
    """op(x=3, y=4, z=5) iterates each dim up to the given index
    inclusive (reference test_override_function_size)."""
    grid = Grid(shape=(5, 6, 7))
    g = Function(name='g', grid=grid)
    op = Operator(Eq(g, 1.))
    op(x=3, y=4, z=5)
    assert (np.asarray(g.data[4:]) == 0.).all()
    assert (np.asarray(g.data[:, 5:]) == 0.).all()
    assert (np.asarray(g.data[:, :, 6:]) == 0.).all()
    assert (np.asarray(g.data[:4, :5, :6]) == 1.).all()


def test_override_function_subrange():
    grid = Grid(shape=(5, 6, 7))
    g = Function(name='g', grid=grid)
    op = Operator(Eq(g, 1.))
    op(x_m=1, x_M=3, y_m=2, y_M=4, z_m=3, z_M=5)
    mask = np.ones((5, 6, 7), dtype=bool)
    mask[1:4, 2:5, 3:6] = False
    data = np.asarray(g.data)
    assert (data[mask] == 0.).all()
    assert (data[1:4, 2:5, 3:6] == 1.).all()


def test_override_timefunction_subrange():
    grid = Grid(shape=(5, 6, 7))
    f = TimeFunction(name='f', grid=grid, time_order=0, save=5)
    op = Operator(Eq(f, 1.), opt='noop')
    op(x_m=1, x_M=3, y_m=2, y_M=4, z_m=3, z_M=5, time_m=1, time_M=4)
    data = np.asarray(f.data)
    mask = np.ones(data.shape, dtype=bool)
    mask[1:5, 1:4, 2:5, 3:6] = False
    assert (data[mask] == 0.).all()
    assert (data[1:5, 1:4, 2:5, 3:6] == 1.).all()


def test_override_function_data():
    """Per-function data overrides route reads AND writes to the
    override (reference test_override_function_data)."""
    grid = Grid(shape=(5, 6, 7))
    a = Function(name='a', grid=grid)
    op = Operator(Eq(a, a + 3))

    a.data[:] = 1.
    op()
    assert (np.asarray(a.data) == 4.).all()

    # override with a differently-named symbol
    a1 = Function(name='a1', grid=grid)
    a1.data[:] = 2.
    op(a=a1)
    assert (np.asarray(a1.data) == 5.).all()
    assert (np.asarray(a.data) == 4.).all()  # original untouched

    # override with a same-named (but distinct) symbol
    a2 = Function(name='a', grid=grid)
    a2.data[:] = 3.
    op(a=a2)
    assert (np.asarray(a2.data) == 6.).all()
    assert (np.asarray(a.data) == 4.).all()


def test_override_timefunction_data():
    grid = Grid(shape=(5, 6, 7))
    a = TimeFunction(name='a', grid=grid, save=2, time_order=0)
    op = Operator(Eq(a, a + 3), opt='noop')

    a.data[:] = 1.
    op(time_m=0, time=1)
    assert (np.asarray(a.data) == 4.).all()

    a1 = TimeFunction(name='a1', grid=grid, save=2, time_order=0)
    a1.data[:] = 2.
    op(time_m=0, time=1, a=a1)
    assert (np.asarray(a1.data) == 5.).all()

    a2 = TimeFunction(name='a', grid=grid, save=2, time_order=0)
    a2.data[:] = 3.
    op(time_m=0, time=1, a=a2)
    assert (np.asarray(a2.data) == 6.).all()


def test_dimension_size_infer(nt=100):
    """Default time_M comes from the smallest saved field: running with
    no time bounds fills all nt rows (reference test_dimension_size_infer
    asserts time_M == nt-1 in the argument map)."""
    grid = Grid(shape=(3, 5, 7))
    a = Function(name='a', grid=grid)
    b = TimeFunction(name='b', grid=grid, save=nt, time_order=0)
    a.data[:] = 7.
    op = Operator(Eq(b, a))
    op()
    assert (np.asarray(b.data) == 7.).all()  # every row 0..nt-1 written


def test_default_time_bound_from_two_saves():
    """With two saved fields of different nt, the smaller bounds the
    default loop (reference argument derivation: min over sizes)."""
    grid = Grid(shape=(4, 4))
    b = TimeFunction(name='b', grid=grid, save=10, time_order=0)
    c = TimeFunction(name='c', grid=grid, save=6, time_order=0)
    op = Operator([Eq(b, 1.), Eq(c, 1.)], opt='noop')
    op()
    assert (np.asarray(c.data) == 1.).all()
    assert (np.asarray(b.data[:6]) == 1.).all()
    assert (np.asarray(b.data[6:]) == 0.).all()


def test_incomplete_override_shape_raises():
    """An override whose shape disagrees with the build-time shape is a
    typed error, not a downstream XLA crash (reference
    test_illegal_override/test_incomplete_override)."""
    grid = Grid(shape=(5, 6, 7))
    grid2 = Grid(shape=(8, 8, 8))
    a = Function(name='a', grid=grid)
    a2 = Function(name='a', grid=grid2)
    op = Operator(Eq(a, a + 3))
    with pytest.raises(InvalidArgument):
        op(a=a2)


def test_argument_derivation_order(nt=100):
    """Runtime kwargs beat defaults; explicit time_M beats the inferred
    one (reference test_argument_derivation_order)."""
    grid = Grid(shape=(3, 5, 7))
    a = Function(name='a', grid=grid)
    b = TimeFunction(name='b', grid=grid, save=nt, time_order=0)
    a.data[:] = 1.
    op = Operator(Eq(b, a))
    op(time_M=4)
    data = np.asarray(b.data)
    assert (data[:5] == 1.).all()
    assert (data[5:] == 0.).all()


def test_sparse_default_bounds():
    """Sparse interpolation with no explicit bounds derives the time
    range from the sparse function's nt (reference
    test_default_sparse_functions)."""
    grid = Grid(shape=(5, 6, 7))
    f = TimeFunction(name='f', grid=grid, save=4, time_order=0)
    f.data[:] = 2.
    s = SparseTimeFunction(name='s', grid=grid, npoint=3, nt=4)
    s.coordinates.data[:, 0] = np.arange(0., 3.) * grid.spacing[0]
    s.coordinates.data[:, 1] = np.arange(1., 4.) * grid.spacing[1]
    s.coordinates.data[:, 2] = np.arange(2., 5.) * grid.spacing[2]
    op = Operator(s.interpolate(f))
    op()
    assert np.allclose(np.asarray(s.data), 2., rtol=1e-6)


def test_loose_kwargs_rejected_then_ignored():
    """Unknown kwargs raise by default; configuration['ignore-unknowns']
    downgrades (reference test_loose_kwargs semantics)."""
    from devito_tpu import configuration, switchconfig
    grid = Grid(shape=(4, 4))
    g = Function(name='g', grid=grid)
    op = Operator(Eq(g, 1.))
    with pytest.raises(InvalidArgument):
        op(bogus=3)
    with switchconfig(**{'ignore-unknowns': True}):
        op(bogus=3)
    assert (np.asarray(g.data) == 1.).all()
