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
