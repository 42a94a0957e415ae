"""Separable (tensor-product) sparse interpolation.

When runtime receiver coordinates factorize into a per-axis product
(surface grids, receiver lines — the overwhelmingly common acquisition
geometries), interpolation runs as a chain of per-axis MXU contractions
instead of pointwise corner gathers (operations/separable.py).  These
tests pin (a) numerical equivalence with the gather path for linear and
sinc interpolators, including permuted point order and out-of-bounds
clipping, and (b) that non-factorizable clouds fall back cleanly.

Reference semantics: devito/operations/interpolators.py:210
(WeightedInterpolator corner gathers) — same weights, different schedule.
"""

import numpy as np
import pytest

from devito_tpu import Grid, Function, TimeFunction, Eq, Operator
from devito_tpu.models.seismic.source import Receiver, TimeAxis
from devito_tpu.operations.separable import separable_geometry, linear_terms


def _surface_coords(xs, ys, z):
    X, Y = np.meshgrid(xs, ys, indexing='ij')
    return np.stack([X.ravel(), Y.ravel(), np.full(X.size, z)], axis=1)


def _run_pair(coords, monkeypatch, interp='linear', expr_of=None, so=4):
    """Apply the same interpolation with and without the separable path;
    return (separable, gather) receiver data."""
    shape = (24, 20, 16)
    rng = np.random.default_rng(7)
    init = rng.random((2,) + shape).astype('f4')
    ta = TimeAxis(start=0, stop=10, step=1)
    out = []
    for flag in ('1', '0'):
        monkeypatch.setenv('DEVITO_TPU_SEPARABLE', flag)
        grid = Grid(shape=shape, extent=(230., 190., 150.))
        u = TimeFunction(name='u', grid=grid, space_order=so)
        u.data[:] = init
        kw = {'interpolation': interp} if interp != 'linear' else {}
        rec = Receiver(name='rec', grid=grid, time_range=ta,
                       npoint=coords.shape[0], coordinates=coords, **kw)
        expr = expr_of(u) if expr_of is not None else u
        op = Operator([Eq(u.forward, u + 0.1 * u.laplace),
                       rec.interpolate(expr=expr)])
        op.apply(time_M=8)
        out.append(np.array(rec.data))
    return out


@pytest.mark.parametrize('interp', ['linear', 'sinc'])
def test_surface_grid_matches_gather(monkeypatch, interp):
    coords = _surface_coords(np.linspace(5., 220., 40),
                             np.linspace(5., 180., 32), 75.)
    sep, gat = _run_pair(coords, monkeypatch, interp=interp, so=8)
    assert np.abs(sep - gat).max() < 2e-5 * max(1, np.abs(gat).max())
    assert np.linalg.norm(gat) > 0


def test_permuted_point_order(monkeypatch):
    coords = _surface_coords(np.linspace(5., 220., 40),
                             np.linspace(5., 180., 32), 75.)
    rng = np.random.default_rng(3)
    perm = rng.permutation(len(coords))
    sep, gat = _run_pair(coords[perm], monkeypatch)
    assert np.abs(sep - gat).max() < 2e-6 * max(1, np.abs(gat).max())


def test_out_of_bounds_points_contribute_zero(monkeypatch):
    # one x-plane beyond the domain: those product slots must read zero,
    # matching the gather path's validity mask
    xs = np.concatenate([np.linspace(5., 220., 39), [400.]])
    coords = _surface_coords(xs, np.linspace(5., 180., 32), 75.)
    sep, gat = _run_pair(coords, monkeypatch)
    assert np.abs(sep - gat).max() < 2e-6 * max(1, np.abs(gat).max())
    oob = sep.reshape(sep.shape[0], 40, 32)[:, -1, :]
    assert np.abs(oob).max() == 0


def test_linear_combination_expr(monkeypatch):
    coords = _surface_coords(np.linspace(5., 220., 40),
                             np.linspace(5., 180., 32), 75.)
    sep, gat = _run_pair(coords, monkeypatch,
                         expr_of=lambda u: 2.0 * u + 0.5 * u.dx)
    assert np.abs(sep - gat).max() < 2e-5 * max(1, np.abs(gat).max())


def test_random_cloud_not_separable():
    shape = (24, 20, 16)
    grid = Grid(shape=shape, extent=(230., 190., 150.))
    ta = TimeAxis(start=0, stop=10, step=1)
    rng = np.random.default_rng(0)
    coords = rng.random((2048, 3)) * [220., 180., 140.]
    rec = Receiver(name='rec', grid=grid, time_range=ta,
                   npoint=2048, coordinates=coords)
    assert separable_geometry(rec, {}) is None


def test_small_sets_skip_factorization():
    shape = (24, 20, 16)
    grid = Grid(shape=shape, extent=(230., 190., 150.))
    ta = TimeAxis(start=0, stop=10, step=1)
    coords = _surface_coords(np.linspace(5., 220., 8),
                             np.linspace(5., 180., 8), 75.)
    rec = Receiver(name='rec', grid=grid, time_range=ta,
                   npoint=64, coordinates=coords)
    assert separable_geometry(rec, {}) is None  # below min_points


def test_linear_terms_decomposition():
    grid = Grid(shape=(8, 8, 8))
    u = TimeFunction(name='u', grid=grid, space_order=2)
    v = Function(name='v', grid=grid, space_order=2)
    terms = linear_terms((2 * u + 0.5 * v).evaluate)
    assert terms is not None and len(terms) == 2
    assert linear_terms((u * v).evaluate) is None
