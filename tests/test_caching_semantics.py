"""Symbol construction/caching semantics (reference: test_caching.py —
the reference's symbol cache; here construction is uncached, matching
the reference's current direction, with clear_cache kept for API
parity)."""

import numpy as np

import devito_tpu
from devito_tpu import (Grid, Function, TimeFunction, Eq, Operator,
                        Dimension, SubDimension, ConditionalDimension,
                        Constant)


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


class TestHashingEquality:
    """Hash/equality semantics across the symbol zoo (reference:
    tests/test_caching.py TestHashing/TestCaching — the C-object rows
    (Lock/LocalObject/CSymbol) are N/A under XLA)."""

    def test_function_same_name_distinct_hash(self):
        grid = Grid(shape=(6, 6))
        f0 = Function(name='fh', grid=grid)
        f1 = Function(name='fh', grid=grid)
        # reference semantics: every user construction is a NEW function
        # (equal hashes are permitted — sympy hashes by class NAME+args —
        # but the objects must be distinct and unequal)
        assert f0 is not f1
        assert f0 != f1

    def test_shifted_access_shares_function(self):
        grid = Grid(shape=(6, 6))
        x, y = grid.dimensions
        f = Function(name='fsh', grid=grid)
        g = f.subs({x: x + 1})
        assert g.function is f.function
        assert type(g) is type(f)

    def test_dimension_cached_by_name(self):
        d0 = Dimension(name='dcache')
        d1 = Dimension(name='dcache')
        assert d0 is d1
        assert hash(d0) == hash(d1)
        assert d0.spacing is d1.spacing

    def test_subdimension_identity(self):
        x = Dimension(name='xsd2')
        a = SubDimension.left('sdl2', x, 2)
        b = SubDimension.left('sdl2', x, 2)
        c = SubDimension.left('sdl3', x, 3)
        assert a == b and hash(a) == hash(b)
        assert a != c

    def test_conditional_dimension_distinctions(self):
        t = Dimension(name='tcd2')
        a = ConditionalDimension(name='cdh', parent=t, factor=4)
        b = ConditionalDimension(name='cdh', parent=t, factor=4)
        c = ConditionalDimension(name='cdh2', parent=t, factor=8)
        assert a == b
        assert a != c and a.factor != c.factor

    def test_constant_symbol_equality(self):
        a = Constant(name='ceq', value=1.0)
        b = Constant(name='ceq', value=2.0)
        # sympy Symbol semantics: same name + assumptions -> equal symbol
        # but DISTINCT instances each carrying their own value
        # (reference test_caching.py test_constant_new:432)
        assert a == b and a is not b
        assert float(a.value) == 1.0 and float(b.value) == 2.0

    def test_constant_dtype_assumption_distinct(self):
        import numpy as np
        r = Constant(name='cdx', dtype=np.float32)
        c = Constant(name='cdx', dtype=np.complex64)
        # complex constants carry different sympy assumptions -> distinct
        assert r.is_real is True
        assert c.is_real is not True

    def test_tensor_components_cached(self):
        from devito_tpu import TensorTimeFunction
        grid = Grid(shape=(6, 6))
        tau = TensorTimeFunction(name='tauh', grid=grid)
        assert tau[0, 1].function is tau[1, 0].function  # symmetric
        tau2 = TensorTimeFunction(name='tauh', grid=grid)
        assert tau2[0, 0].function is not tau[0, 0].function

    def test_rebuild_same_params_is_identity(self):
        grid = Grid(shape=(6, 6))
        f = Function(name='frb', grid=grid, space_order=4)
        assert f._rebuild() is f.function
        g = f._rebuild(name='frb2')
        assert g.function is not f.function
        assert g.name == 'frb2' and g.space_order == 4

    def test_rebuild_does_not_share_data(self):
        grid = Grid(shape=(6, 6))
        f = Function(name='frd', grid=grid)
        f.data[:] = 3.0
        g = f._rebuild(name='frd2')
        assert float(np.asarray(g.data).max()) == 0.0
        assert float(np.asarray(f.data).max()) == 3.0

    def test_indexed_reapplication_preserves_class(self):
        grid = Grid(shape=(6, 6))
        x, y = grid.dimensions
        u = Function(name='uix2', grid=grid)
        v = type(u)(x + 2, y - 1)   # sympy re-application
        assert v.function is u.function
        assert tuple(v.indexify().indices) == (x + 2, y - 1)

    def test_equation_expansion_uses_instance_weights(self):
        """Two same-named functions with different space_order expand
        with THEIR orders (no cross-contamination through any cache)."""
        grid = Grid(shape=(12, 12))
        a = Function(name='fw', grid=grid, space_order=2)
        b = Function(name='fw', grid=grid, space_order=8)
        ea = str(a.dx2.evaluate)
        eb = str(b.dx2.evaluate)
        assert ea != eb
        assert ea.count('fw') < eb.count('fw')

    def test_sparse_coordinates_not_shared(self):
        from devito_tpu.types.sparse import SparseFunction
        grid = Grid(shape=(8, 8), extent=(7., 7.))
        s1 = SparseFunction(name='shc', grid=grid, npoint=2,
                            coordinates=[(1., 1.), (2., 2.)])
        s2 = SparseFunction(name='shc', grid=grid, npoint=2,
                            coordinates=[(3., 3.), (4., 4.)])
        assert not np.array_equal(np.asarray(s1.coordinates.data),
                                  np.asarray(s2.coordinates.data))

    def test_grid_not_cached(self):
        g1 = Grid(shape=(6, 6))
        g2 = Grid(shape=(6, 6))
        assert g1 is not g2
        # but their default dimensions ARE the shared cached symbols
        assert g1.dimensions[0] is g2.dimensions[0]
