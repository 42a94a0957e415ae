"""Ports of the reference's SubDomainSet behavior matrix
(reference: tests/test_subdomains.py — iterate-N-domains, multi-equation,
multi-set, sparse-coupled and distributed cases)."""

from math import floor

import numpy as np
import pytest

import jax

from devito_tpu import (Grid, Function, TimeFunction, Eq, Operator, solve,
                        SubDomainSet)


def test_iterate_ndomains():
    """N per-region thickness vectors iterate correctly
    (reference: test_iterate_NDomains:269)."""
    n_domains = 10
    bounds_xm = np.zeros((n_domains,), dtype=np.int32)
    bounds_xM = np.zeros((n_domains,), dtype=np.int32)
    bounds_ym = np.zeros((n_domains,), dtype=np.int32)
    bounds_yM = np.zeros((n_domains,), dtype=np.int32)
    for j in range(n_domains):
        bounds_xm[j] = j
        bounds_xM[j] = n_domains - 1 - j
        bounds_ym[j] = floor(j / 2)
        bounds_yM[j] = floor(j / 2)
    bounds = (bounds_xm, bounds_xM, bounds_ym, bounds_yM)

    grid = Grid(extent=(10, 10), shape=(10, 10))
    inner_sd = SubDomainSet(name='inner', N=n_domains, bounds=bounds)
    f = TimeFunction(name='f', grid=grid)
    f.data[:] = 0
    eq = Eq(f.forward, solve(Eq(f.dt, 1), f.forward), subdomain=inner_sd)
    Operator(eq).apply(time_m=0, time_M=9, dt=1)

    expected = np.zeros((10, 10))
    for j in range(n_domains):
        expected[j, bounds_ym[j]:n_domains - bounds_yM[j]] = 10
    assert np.allclose(np.asarray(f.data[0]), expected)


def test_multi_eq():
    """Multiple equations, only one on the SubDomainSet
    (reference: test_multi_eq:311)."""
    Nx = Ny = 10
    bounds = (np.array([1, Nx // 2 + 1], dtype=np.int32),
              np.array([Nx // 2 + 1, 1], dtype=np.int32), 1, 1)
    grid = Grid(extent=(Nx, Ny), shape=(Nx, Ny))
    my_sd = SubDomainSet(name='mydomains', N=2, bounds=bounds)
    assert my_sd.n_domains == 2
    f = Function(name='f', grid=grid)
    g = Function(name='g', grid=grid)
    Operator([Eq(f, f + 1, subdomain=my_sd), Eq(g, g + 1)]).apply()
    df, dg = np.asarray(f.data), np.asarray(g.data)
    assert np.allclose(dg, 1.)
    expected = np.zeros((Nx, Ny))
    expected[1:Nx // 2 - 1, 1:-1] = 1.
    expected[Nx // 2 + 1:-1, 1:-1] = 1.
    assert np.allclose(df, expected)


def test_multi_sets():
    """Two distinct SubDomainSets in one operator
    (reference: test_multi_sets:397)."""
    Nx = Ny = 10
    grid = Grid(extent=(Nx, Ny), shape=(Nx, Ny))
    sd1 = SubDomainSet(name='d1', N=1,
                       bounds=(np.array([1]), np.array([6]),
                               np.array([1]), np.array([1])))
    sd2 = SubDomainSet(name='d2', N=1,
                       bounds=(np.array([6]), np.array([1]),
                               np.array([1]), np.array([1])))
    f = Function(name='f', grid=grid)
    Operator([Eq(f, f + 1, subdomain=sd1),
              Eq(f, f + 2, subdomain=sd2)]).apply()
    d = np.asarray(f.data)
    assert np.allclose(d[1:4, 1:-1], 1.)
    assert np.allclose(d[6:-1, 1:-1], 2.)
    assert d.sum() == 3 * 8 + 2 * 3 * 8


def test_3d_set():
    """3-D SubDomainSet (reference: test_3D:702)."""
    grid = Grid(shape=(8, 8, 8))
    sd = SubDomainSet(name='s3', N=2,
                      bounds=(np.array([1, 5]), np.array([5, 1]),
                              np.array([1, 1]), np.array([1, 1]),
                              np.array([2, 2]), np.array([2, 2])))
    f = Function(name='f', grid=grid)
    Operator(Eq(f, 1, subdomain=sd)).apply()
    d = np.asarray(f.data)
    assert np.allclose(d[1:3, 1:-1, 2:-2], 1.)
    assert np.allclose(d[5:-1, 1:-1, 2:-2], 1.)
    assert d.sum() == 2 * (2 * 6 * 4)


def test_subdomainset_w_sparse():
    """A sparse interpolation coexists with SubDomainSet equations
    (reference: test_subdomainset_w_sparse:763)."""
    from devito_tpu import SparseTimeFunction
    grid = Grid(shape=(10, 10), extent=(9., 9.))
    sd = SubDomainSet(name='sdp', N=1,
                      bounds=(np.array([2]), np.array([2]),
                              np.array([2]), np.array([2])))
    u = TimeFunction(name='u', grid=grid)
    rec = SparseTimeFunction(name='rec', grid=grid, npoint=1, nt=4,
                             coordinates=[[4.5, 4.5]])
    op = Operator([Eq(u.forward, u + 1, subdomain=sd),
                   rec.interpolate(expr=u.forward)])
    op.apply(time_M=2, dt=1.)
    # the receiver sits inside the region: it records 1, 2, 3
    assert np.allclose(np.asarray(rec.data)[:3].ravel(), [1., 2., 3.])


def test_subdomainset_sharded():
    """SubDomainSet on a sharded grid matches serial (reference:
    test_subdomainset_mpi:451)."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    from devito_tpu.parallel.distributor import Distributor

    def run(shard):
        grid = Grid(shape=(16, 16), extent=(15., 15.))
        if shard:
            grid._distributor = Distributor(grid, topology=(2, 2),
                                            devices=jax.devices()[:4])
        sd = SubDomainSet(name='sdm', N=2,
                          bounds=(np.array([1, 9]), np.array([9, 1]),
                                  np.array([2, 2]), np.array([2, 2])))
        f = TimeFunction(name='f', grid=grid, space_order=2)
        op = Operator(Eq(f.forward, f + f.laplace + 1, subdomain=sd),
                      subs=grid.spacing_map)
        op.apply(time_M=3, dt=1.)
        return np.asarray(f.data)

    assert np.allclose(run(False), run(True), atol=1e-5)


def test_subdomainset_subclass_scalar_bounds():
    """Subclass-style SubDomainSet with SCALAR bounds (reference:
    test_issue_1761:551 — numerical form)."""
    from devito_tpu import Function
    from devito_tpu.finite_differences.elementary import sin

    class DummySubdomains(SubDomainSet):
        name = 'dummydomain'

    grid = Grid(shape=(10, 10))
    dummy = DummySubdomains(N=1, bounds=(1, 1, 1, 1), grid=grid)
    f = TimeFunction(name='f', grid=grid)
    g = TimeFunction(name='g', grid=grid)
    phi = Function(name='phi', grid=grid)
    theta = Function(name='theta', grid=grid)
    phi.data[:] = np.pi / 2     # sin(phi) = 1
    theta.data[:] = np.pi / 2
    f.data[:] = 2.
    g.data[:] = 3.
    op = Operator([Eq(f.forward, f * sin(phi), subdomain=dummy),
                   Eq(g.forward, g * sin(theta), subdomain=dummy)])
    op.apply(time_M=1, dt=1.)
    df, dg = np.asarray(f.data[0]), np.asarray(g.data[0])
    assert np.allclose(df[1:-1, 1:-1], 2., atol=1e-5)
    assert np.allclose(dg[1:-1, 1:-1], 3., atol=1e-5)
    # outside the region: untouched initial values
    assert np.allclose(df[0], 2.) and np.allclose(dg[0], 3.)


def test_subdomainset_two_sets_one_refused(monkeypatch):
    """Two sets + re-update of the first target (reference:
    test_issue_1761_b:577 — numerical form)."""
    from devito_tpu import Function

    class D1(SubDomainSet):
        name = 'd1761b1'

    class D2(SubDomainSet):
        name = 'd1761b2'

    grid = Grid(shape=(10, 10))
    d1 = D1(N=1, bounds=(1, 1, 1, 1), grid=grid)
    d2 = D2(N=1, bounds=(2, 2, 2, 2), grid=grid)
    f = TimeFunction(name='f', grid=grid)
    g = TimeFunction(name='g', grid=grid)
    op = Operator([Eq(f.forward, f + 1, subdomain=d1),
                   Eq(g.forward, g + 2, subdomain=d2),
                   Eq(f.forward, f.forward + 10, subdomain=d1)])
    op.apply(time_M=0, dt=1.)
    df, dg = np.asarray(f.data[1]), np.asarray(g.data[1])
    assert np.all(df[1:-1, 1:-1] == 11.)
    assert np.all(dg[2:-2, 2:-2] == 2.)
    assert np.all(dg[:2] == 0.)


def test_subdomainset_guarded_by_constant_condition():
    """SubDomainSet equations guarded by Constant-valued conditions
    (reference: test_guarding:675 — numerical form)."""
    from devito_tpu import Constant, ConditionalDimension

    class Dummy(SubDomainSet):
        name = 'dummyg'

    grid = Grid(shape=(10, 10))
    dummy = Dummy(N=1, bounds=(1, 1, 1, 1), grid=grid)
    time = grid.time_dim
    c = Constant(name='c', value=0.)
    cond_a = ConditionalDimension(name='cond_a', parent=time,
                                  condition=c < 1.)
    cond_b = ConditionalDimension(name='cond_b', parent=time,
                                  condition=c >= 1.)
    f = TimeFunction(name='f', grid=grid)
    g = TimeFunction(name='g', grid=grid)
    op = Operator([Eq(f.forward, f + 1., subdomain=dummy,
                      implicit_dims=[cond_a]),
                   Eq(g.forward, g + 1., subdomain=dummy,
                      implicit_dims=[cond_b])])
    op.apply(time_M=3, dt=1., c=0.)
    assert np.all(np.asarray(f.data[0])[1:-1, 1:-1] == 4.)
    assert np.all(np.asarray(g.data[0]) == 0.)

    f.data[:] = 0.
    g.data[:] = 0.
    op.apply(time_M=3, dt=1., c=2.)
    assert np.all(np.asarray(f.data[0]) == 0.)
    assert np.all(np.asarray(g.data[0])[1:-1, 1:-1] == 4.)


def test_subdomainset_cire_derivative():
    """A nested derivative on a SubDomainSet (CIRE interplay; reference:
    test_issue_1761_d:650 — numerical form)."""
    grid = Grid(shape=(12, 12), extent=(11., 11.))
    sd = SubDomainSet(name='dcire', N=1,
                      bounds=(np.array([2]), np.array([2]),
                              np.array([2]), np.array([2])))
    f = TimeFunction(name='f', grid=grid, space_order=4)
    op = Operator(Eq(f.forward, f.dx.dx + 1, subdomain=sd),
                  subs=grid.spacing_map)
    op.apply(time_M=1, dt=1.)
    d = np.asarray(f.data[0])
    assert np.all(d[2:-2, 2:-2] != 0.)
    assert np.all(d[:2] == 0.) and np.all(d[:, :2] == 0.)


def test_multi_eq_split_regions():
    """Equations on the same set with a dependence in between
    (reference: test_multi_eq_split:368 shape)."""
    grid = Grid(shape=(10, 10))
    sd = SubDomainSet(name='dsplit', N=2,
                      bounds=(np.array([1, 6]), np.array([6, 1]),
                              np.array([1, 1]), np.array([1, 1])))
    f = Function(name='f', grid=grid)
    g = Function(name='g', grid=grid)
    Operator([Eq(f, f + 1, subdomain=sd),
              Eq(g, f * 2, subdomain=sd)]).apply()
    df, dg = np.asarray(f.data), np.asarray(g.data)
    assert np.all(dg[1:3, 1:-1] == 2.)
    assert np.all(dg[6:-1, 1:-1] == 2.)
    assert dg.sum() == 2 * df.sum()


class TestBorder:
    """Border frame regions (reference: tests/test_subdomains.py
    TestBorder:783-975 — corner policies, uneven/one-sided borders)."""

    def test_exceptions(self):
        from devito_tpu import Border
        grid = Grid(shape=(5,))
        with pytest.raises(ValueError):
            Border(grid, (1, 1))
        with pytest.raises(ValueError):
            Border(grid, ((1, 1, 1),))

    @pytest.mark.parametrize('corners', ['nooverlap', 'overlap',
                                         'nocorners'])
    def test_uneven_border(self, corners):
        """(reference: test_uneven_border:794)."""
        from devito_tpu import Border, Function
        shape = (6, 8)
        grid = Grid(shape=shape)
        border = Border(grid, (1, (2, 1)), corners=corners)
        f = Function(name='f', grid=grid, dtype=np.int32)
        Operator(Eq(f, f + 1, subdomain=border)).apply()
        check = np.ones(shape)
        check[1:-1, 2:-1] = 0
        if corners == 'nocorners':
            check[0, :2] = 0
            check[-1, :2] = 0
            check[0, -1] = 0
            check[-1, -1] = 0
        elif corners == 'overlap':
            check[0, :2] = 2
            check[-1, :2] = 2
            check[0, -1] = 2
            check[-1, -1] = 2
        assert np.all(np.asarray(f.data) == check)

    @pytest.mark.parametrize('corners', ['nooverlap', 'overlap',
                                         'nocorners'])
    def test_one_sided_border(self, corners):
        """(reference: test_one_sided_border:824)."""
        from devito_tpu import Border, Function
        shape = (6, 8)
        grid = Grid(shape=shape)
        x, y = grid.dimensions
        border = Border(grid, 1, dims={x: 'left', y: 'right'},
                        corners=corners)
        f = Function(name='f', grid=grid, dtype=np.int32)
        Operator(Eq(f, f + 1, subdomain=border)).apply()
        check = np.zeros(shape)
        check[0, :] = 1
        check[:, -1] = 1
        if corners == 'overlap':
            check[0, -1] = 2
        elif corners == 'nocorners':
            check[0, 0] = 0
            check[0, -1] = 0
            check[-1, -1] = 0
        assert np.all(np.asarray(f.data) == check)

    def test_border_3d_nooverlap(self):
        """Every frame cell exactly once under nooverlap (reference:
        test_border_3d:939 subset)."""
        from devito_tpu import Border, Function
        shape = (6, 7, 8)
        grid = Grid(shape=shape)
        border = Border(grid, 1)
        f = Function(name='f', grid=grid, dtype=np.int32)
        Operator(Eq(f, f + 1, subdomain=border)).apply()
        d = np.asarray(f.data)
        check = np.ones(shape)
        check[1:-1, 1:-1, 1:-1] = 0
        assert np.all(d == check)
