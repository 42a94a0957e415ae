"""RSFD (rotated staggered-grid FD) validation.

Reference parity: devito/finite_differences/rsfd.py (d45, drot) — accuracy
of the rotated first derivative on smooth fields, node and staggered
lattices, and the div45/grad45 surface."""

import numpy as np
import pytest

from devito_tpu import (Grid, Function, Eq, Operator, VectorFunction,
                        div45, grad45)


def _fields_2d(n=64, so=8):
    g = Grid(shape=(n, n), extent=(float(n - 1), float(n - 1)))
    u = Function(name='u', grid=g, space_order=so)
    w = Function(name='w', grid=g, space_order=so)
    X, Y = np.meshgrid(np.arange(float(n)), np.arange(float(n)),
                       indexing='ij')
    kx, ky = 2 * np.pi / (n - 1), 2 * np.pi / ((n - 1) / 2)
    u.data[:] = np.sin(kx * X + ky * Y)
    return g, u, w, X, Y, kx, ky


def test_dx45_accuracy_2d():
    g, u, w, X, Y, kx, ky = _fields_2d()
    Operator([Eq(w, u.dx45)]).apply()
    exact = kx * np.cos(kx * X + ky * Y)
    err = np.abs(w.data[8:-8, 8:-8] - exact[8:-8, 8:-8]).max()
    assert err / np.abs(exact).max() < 1e-5


def test_dy45_accuracy_2d():
    g, u, w, X, Y, kx, ky = _fields_2d()
    Operator([Eq(w, u.dy45)]).apply()
    exact = ky * np.cos(kx * X + ky * Y)
    err = np.abs(w.data[8:-8, 8:-8] - exact[8:-8, 8:-8]).max()
    assert err / np.abs(exact).max() < 1e-5


def test_d45_exact_on_linear():
    # RSFD reproduces the exact derivative of a linear field
    g = Grid(shape=(32, 32), extent=(31., 31.))
    u = Function(name='u', grid=g, space_order=4)
    w = Function(name='w', grid=g, space_order=4)
    X, Y = np.meshgrid(np.arange(32.), np.arange(32.), indexing='ij')
    u.data[:] = 3.0 * X + 2.0 * Y
    Operator([Eq(w, u.dx45)]).apply()
    assert np.allclose(w.data[4:-4, 4:-4], 3.0, atol=1e-4)


def test_d45_3d_accuracy():
    n, so = 48, 8
    g = Grid(shape=(n, n, n), extent=((n - 1.,) * 3))
    u = Function(name='u', grid=g, space_order=so)
    w = Function(name='w', grid=g, space_order=so)
    ax = np.arange(float(n))
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing='ij')
    kx, ky, kz = (2 * np.pi / (n - 1), 2 * np.pi / ((n - 1) / 2),
                  2 * np.pi / (n - 1))
    u.data[:] = np.sin(kx * X + ky * Y + kz * Z)
    Operator([Eq(w, u.dz45)]).apply()
    exact = kz * np.cos(kx * X + ky * Y + kz * Z)
    err = np.abs(w.data[so:-so, so:-so, so:-so]
                 - exact[so:-so, so:-so, so:-so]).max()
    assert err / np.abs(exact).max() < 1e-4


def test_grad45_div45_surface():
    g, u, w, X, Y, kx, ky = _fields_2d(n=48)
    gr = grad45(u)
    assert len(gr.values()) == 2
    v = VectorFunction(name='v', grid=g, space_order=8)
    d = div45(v)
    # lowering works end-to-end
    Operator([Eq(w, div45(grad45(u)))]).apply()
    lap = -(kx ** 2 + ky ** 2) * np.sin(kx * X + ky * Y)
    err = np.abs(w.data[12:-12, 12:-12] - lap[12:-12, 12:-12]).max()
    assert err / np.abs(lap).max() < 1e-3


def test_d45_rejects_partial_stagger():
    from devito_tpu.finite_differences.rsfd import d45
    g = Grid(shape=(16, 16))
    x, y = g.dimensions
    u = Function(name='u', grid=g, space_order=4)
    from sympy import Rational
    with pytest.raises(ValueError):
        d45(u, x, x0={x: Rational(1, 2)})  # partial staggering
