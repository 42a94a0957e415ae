"""Port of the reference time-marching semantics suite
(/root/reference/tests/test_timestepping.py): forward/backward marching
with saved and rolling-buffer wavefields, mixed buffered+unrolled
operators, chained forward->backward operators, and automatic time-loop
bound detection when the updated slot is ``u`` itself (Eq(u, ...) with a
dt2 read implies t in [to, nt-1-to] forward; Eq(u.backward, ...) implies
a backward loop).
"""

import numpy as np
import pytest

from devito_tpu import Eq, Grid, Operator, TimeFunction


@pytest.fixture
def grid():
    return Grid(shape=(11, 11))


@pytest.fixture
def a(grid):
    return TimeFunction(name='a', grid=grid, time_order=1, save=6)


@pytest.fixture
def b(grid):
    return TimeFunction(name='b', grid=grid, time_order=1, save=6)


@pytest.fixture
def c(grid):
    return TimeFunction(name='c', grid=grid, time_order=1, save=None)


@pytest.fixture
def d(grid):
    return TimeFunction(name='d', grid=grid, time_order=2, save=6)


def test_forward(a):
    a.data[0, :] = 1.
    Operator(Eq(a.forward, a + 1.))()
    for i in range(a.shape[0]):
        assert np.allclose(a.data[i], 1. + i, rtol=1e-12)


def test_backward(b):
    b.data[-1, :] = 7.
    Operator(Eq(b.backward, b - 1.))()
    for i in range(b.shape[0]):
        assert np.allclose(b.data[i], 2. + i, rtol=1e-12)


def test_forward_unroll(a, c, nt=5):
    """Forward marching with a rolling-buffer and a saved field in one
    operator: the saved field records the buffered field's new slot."""
    a.data[0, :] = 1.
    c.data[0, :] = 1.
    Operator([Eq(c.forward, c + 1.), Eq(a.forward, c.forward)])(time=nt - 1)
    for i in range(nt):
        assert np.allclose(a.data[i], 1. + i, rtol=1e-12)


def test_forward_backward(a, b, nt=5):
    a.data[0, :] = 1.
    b.data[0, :] = 1.
    Operator(Eq(a.forward, a + 1.))(time=nt - 1)
    Operator(Eq(b, a + 1.))(time=nt - 1)
    for i in range(nt):
        assert np.allclose(b.data[i], 2. + i, rtol=1e-12)


def test_forward_backward_overlapping(a, b, nt=5):
    """Same, but both operators built before either runs."""
    a.data[0, :] = 1.
    b.data[0, :] = 1.
    op_fwd = Operator(Eq(a.forward, a + 1.))
    op_bwd = Operator(Eq(b, a + 1.))
    op_fwd(time=nt - 1)
    op_bwd(time=nt - 1)
    for i in range(nt):
        assert np.allclose(b.data[i], 2. + i, rtol=1e-12)


def test_loop_bounds_forward(d):
    """Writing Eq(d, 2 + d.dt2) reads d[t-1], d[t], d[t+1]: the forward
    loop must auto-clamp by the dt2 stencil's actual read offsets
    (radius 1 each side), i.e. only rows 1..nt-2 are written."""
    d.data[:] = 1.
    Operator(Eq(d, 2. + d.dt2), opt='noop')(dt=1.)
    assert np.allclose(d.data[0], 1., rtol=1e-12)
    assert np.allclose(d.data[-1], 1., rtol=1e-12)
    for i in range(1, d.data.shape[0] - 1):
        assert np.allclose(d.data[i], 1. + i, rtol=1e-12)


def test_loop_bounds_backward(d):
    """Eq(d.backward, d - 1) marches backwards with auto bounds."""
    d.data[:] = 5.
    Operator(Eq(d.backward, d - 1), opt='noop')()
    assert np.allclose(d.data[0], 0., rtol=1e-12)
    assert np.allclose(d.data[-1], 5., rtol=1e-12)
    for i in range(1, d.data.shape[0] - 1):
        assert np.allclose(d.data[i], i, rtol=1e-12)
