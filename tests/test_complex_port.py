"""Complex-valued fields (port of the complex subset of the reference's
tests/test_dtypes.py:220-346 — overrides, time/space derivatives,
injection reductions). XLA supports complex64/128 natively; the C-printer
machinery the reference tests alongside is N/A here."""

import numpy as np
import pytest

import jax
jax.config.update("jax_enable_x64", True)  # complex128 paths

from devito_tpu import (Grid, Function, TimeFunction, SparseTimeFunction,
                        Constant, Eq, Operator)


@pytest.mark.parametrize('dtype', [np.complex64, np.complex128])
def test_complex_override(dtype):
    """Complex Constant overridden at apply (reference
    test_complex_override:220)."""
    grid = Grid(shape=(5, 5))
    x, y = grid.dimensions

    c = Constant(name='c', dtype=dtype, value=1.0 + 0.0j)
    u = Function(name='u', grid=grid, dtype=dtype)
    eq = Eq(u, x * x.spacing + c * y * y.spacing)
    op = Operator(eq)
    op.apply(c=dtype(2.0 + 1.0j))

    dx, dy = grid.spacing_map.values()
    xx, yy = np.meshgrid(np.linspace(0, 4, 5, dtype=dtype),
                         np.linspace(0, 4, 5, dtype=dtype))
    expected = xx * float(dx) + yy * float(dy) * dtype(2.0 + 1.0j)
    assert np.allclose(np.asarray(u.data).T, expected)


@pytest.mark.parametrize('dtype', [np.complex64, np.complex128])
def test_complex_time_deriv(dtype):
    """Time derivative of a complex-valued function (reference
    test_complex_time_deriv:242)."""
    grid = Grid(shape=(5, 5))
    x, y = grid.dimensions
    t = grid.time_dim

    f = TimeFunction(name='f', grid=grid, space_order=2, dtype=dtype)
    g = Function(name='g', grid=grid, dtype=dtype)
    eqns = [Eq(f.forward, t * x * x.spacing * (1.0 + 0.0j) +
               t * y * y.spacing * (0.0 + 1.0j)),
            Eq(g, f.dt)]
    op = Operator(eqns)
    op.apply(time=10, dt=1.0)

    dx, dy = grid.spacing_map.values()
    xx, yy = np.meshgrid(np.linspace(0, 4, 5, dtype=dtype),
                         np.linspace(0, 4, 5, dtype=dtype))
    expected = xx * float(dx) + yy * float(dy) * dtype(0.0 + 1.0j)
    assert np.allclose(np.asarray(g.data).T, expected)


@pytest.mark.parametrize('dtype', [np.complex64, np.complex128])
def test_complex_field_evolution_vs_numpy(dtype):
    """A Schrodinger-like complex evolution matches a NumPy oracle in
    the interior (framework-specific numerics check; the reference's
    space-deriv analog uses complex grid spacing, an API corner we do
    not support)."""
    n = 24
    grid = Grid(shape=(n, n), extent=(float(n - 1), float(n - 1)))
    u = TimeFunction(name='u', grid=grid, dtype=dtype, time_order=2,
                     space_order=4)
    u.data[1][n // 2, n // 2] = 1.0 + 2.0j
    eq = Eq(u.forward, 2 * u - u.backward + (0.1 + 0.05j) * u.laplace)
    op = Operator(eq, subs=grid.spacing_map)
    nt = 4
    op.apply(time_m=1, time_M=nt, dt=0.01)

    # oracle: zero-halo 4th-order laplacian
    c = np.array([-1 / 12, 4 / 3, -5 / 2, 4 / 3, -1 / 12])
    ref = np.zeros((n, n), dtype)
    prev = np.zeros((n, n), dtype)
    ref[n // 2, n // 2] = 1.0 + 2.0j

    def lap(f):
        p = np.pad(f, 2)
        out = np.zeros_like(f)
        for k, w in zip(range(-2, 3), c):
            out += w * (p[2 + k:2 + k + n, 2:2 + n]
                        + p[2:2 + n, 2 + k:2 + k + n])
        return out

    buf = [prev, ref]
    for _ in range(1, nt + 1):
        new = 2 * buf[1] - buf[0] + dtype(0.1 + 0.05j) * lap(buf[1])
        buf = [buf[1], new]
    tol = 1e-5 if dtype == np.complex64 else 1e-12
    got = np.asarray(u.data)[(nt + 1) % 3]
    assert np.allclose(got, buf[1], rtol=tol, atol=tol)


@pytest.mark.parametrize('dtypeu', [np.complex64, np.complex128])
def test_complex_injection(dtypeu):
    """Injecting a complex source accumulates complex values (reference
    test_complex_reduction:297 minus the C-codegen assertions)."""
    grid = Grid((11, 11))
    u = TimeFunction(name="u", grid=grid, space_order=2, time_order=1,
                     dtype=dtypeu)
    s = SparseTimeFunction(name="s", grid=grid, npoint=1, nt=10,
                           dtype=dtypeu)
    s.data[:] = 1 + 2j
    s.coordinates.data[:] = [.5, .5]
    op = Operator([Eq(u.forward, u)] + s.inject(u.forward, expr=s))
    op(dt=1.0)
    assert np.isclose(complex(np.asarray(u.data)[0, 5, 5]), 8. + 16.j)
