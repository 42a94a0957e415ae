"""Custom FD coefficients (legacy Substitutions API + per-derivative
weights) and Buffer rolling storage.

Reference: tests/test_symbolic_coefficients.py, types/dense.py
save=Buffer. Weight-scaling semantics verified against the executed
reference: supplied weights replace the Taylor weights but remain scaled
by spacing**-deriv_order.
"""

import numpy as np
import pytest

from devito_tpu import (Grid, TimeFunction, Function, Eq, Operator, solve,
                        Buffer, Coefficient, Substitutions)


def test_substitutions_replace_weights():
    g = Grid(shape=(11, 11), dtype=np.float64)
    x, y = g.dimensions
    u = TimeFunction(name='u', grid=g, space_order=2)
    c = Coefficient(2, u, x, np.array([1., -2., 1.]))
    eq = Eq(u.forward, u.dx2, coefficients=Substitutions(c))
    s = str(eq.evaluate)
    assert '/h_x**2' in s and '-2.0' in s


def test_substitutions_numerics():
    """Custom weights equal to the Taylor ones give identical numerics."""
    g = Grid(shape=(16, 16), extent=(15., 15.), dtype=np.float64)
    x, y = g.dimensions
    rng = np.random.default_rng(0)
    f = rng.standard_normal((16, 16))

    u1 = TimeFunction(name='u1', grid=g, space_order=2)
    u1.data[0] = f
    op1 = Operator(Eq(u1.forward, u1.dx2))
    op1.apply(time_M=0, dt=1.)

    u2 = TimeFunction(name='u2', grid=g, space_order=2)
    u2.data[0] = f
    c = Coefficient(2, u2, x, np.array([1., -2., 1.]))
    op2 = Operator(Eq(u2.forward, u2.dx2,
                      coefficients=Substitutions(c)))
    op2.apply(time_M=0, dt=1.)
    assert np.allclose(np.asarray(u1.data)[1], np.asarray(u2.data)[1],
                       atol=1e-13)


def test_per_derivative_weights():
    """u.dx2(weights=[...]) carries through evaluation with h scaling
    (reference: make_derivative weights path)."""
    g = Grid(shape=(11, 11), dtype=np.float64)
    u = TimeFunction(name='u', grid=g, space_order=2)
    d = u.dx2(weights=[1., -2., 1.])
    s = str(d.evaluate)
    assert 'h_x' in s


def test_buffer_rolling_storage():
    """save=Buffer(k): k modulo slots, stepping semantics (reference:
    test_buffering.py basics)."""
    g = Grid(shape=(8, 8), extent=(7., 7.))
    b = TimeFunction(name='b', grid=g, save=Buffer(4))
    assert b._time_size == 4
    assert b.dimensions[0].is_Stepping
    op = Operator(Eq(b.forward, b + 1))
    op.apply(time_M=5, dt=1.)
    rows = np.asarray(b.data)[:, 4, 4]
    # b(t) = t for t=1..6; rows hold t with t % 4 == row
    assert sorted(rows.tolist()) == [3., 4., 5., 6.]


def test_buffer_vs_default_equivalence():
    """A Buffer(2) run reproduces the default rolling-buffer solution."""
    g = Grid(shape=(12, 12), extent=(11., 11.), dtype=np.float64)
    rng = np.random.default_rng(1)
    f = rng.standard_normal((12, 12))

    u = TimeFunction(name='u', grid=g, space_order=2)
    u.data[0] = f
    Operator(Eq(u.forward, solve(Eq(u.dt, 0.2 * u.laplace),
                                 u.forward))).apply(time_M=9, dt=1e-3)

    w = TimeFunction(name='w', grid=g, space_order=2, save=Buffer(2))
    w.data[0] = f
    Operator(Eq(w.forward, solve(Eq(w.dt, 0.2 * w.laplace),
                                 w.forward))).apply(time_M=9, dt=1e-3)
    # final state lives in row 10 % nslots
    assert np.allclose(np.asarray(u.data)[10 % 2],
                       np.asarray(w.data)[10 % 2], atol=1e-14)
