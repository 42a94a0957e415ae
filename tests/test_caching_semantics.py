"""Symbol construction/caching semantics (reference: test_caching.py —
the reference's symbol cache; here construction is uncached, matching
the reference's current direction, with clear_cache kept for API
parity)."""

import numpy as np

import devito_tpu
from devito_tpu import Grid, Function, TimeFunction, Eq, Operator


def test_name_reuse_makes_fresh_function():
    """Re-creating a Function with the same name gives fresh data."""
    g = Grid(shape=(8, 8))
    f1 = Function(name='fcache', grid=g)
    f1.data[:] = 7.
    f2 = Function(name='fcache', grid=g)
    assert np.allclose(np.asarray(f2.data), 0.)
    # the first instance keeps its own buffer
    assert np.allclose(np.asarray(f1.data), 7.)


def test_same_name_distinct_grids():
    g1 = Grid(shape=(8, 8))
    g2 = Grid(shape=(12, 12))
    a = Function(name='g_fn', grid=g1)
    b = Function(name='g_fn', grid=g2)
    assert a.shape == (8, 8) and b.shape == (12, 12)


def test_clear_cache_api():
    devito_tpu.clear_cache()  # no-op safety, kept for API parity


def test_operator_isolated_from_later_writes():
    """An Operator bound to one instance is unaffected by same-named
    functions created later."""
    g = Grid(shape=(8, 8), extent=(7., 7.))
    u = TimeFunction(name='u_iso', grid=g)
    op = Operator(Eq(u.forward, u + 1))
    u2 = TimeFunction(name='u_iso', grid=g)   # decoy
    u2.data[0, :, :] = 50.
    op.apply(time_M=2, dt=1.)
    assert np.asarray(u.data).max() == 3.
    assert np.asarray(u2.data).max() == 50.


def test_equation_holds_instance():
    g = Grid(shape=(8, 8))
    f = Function(name='eq_fn', grid=g)
    eq = Eq(f, 5)
    f2 = Function(name='eq_fn', grid=g)   # decoy after the Eq
    Operator(eq).apply()
    assert np.allclose(np.asarray(f.data), 5.)
    assert np.allclose(np.asarray(f2.data), 0.)
