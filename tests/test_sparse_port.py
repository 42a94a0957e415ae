"""Sparse-function ports (reference: tests/test_sparse.py).

The heavyweight precomputed/matrix variants live in test_msf.py and
test_interpolation_port.py; this file ports the exact-numerics
injection case (test_mpi_no_data, tests/test_sparse.py:470) serial and
sharded."""

import numpy as np
import pytest

import jax

from devito_tpu import (Grid, Function, TimeFunction, SparseTimeFunction,
                        Eq, Operator)
from devito_tpu.parallel.distributor import Distributor

# the reference's expected wavefield after 6 steps of m + m.laplace with
# a unit-coincident point injecting `time` (tests/test_sparse.py:487)
EXPECTED = np.array(
    [[0., 0., 0., 0., 0., 0., 0., 0., 0., 0., 0.],
     [0., 0., 0., 0., 0., 1., 0., 0., 0., 0., 0.],
     [0., 0., 0., 0., 4., -10., 4., 0., 0., 0., 0.],
     [0., 0., 0., 6., -30., 55., -30., 6., 0., 0., 0.],
     [0., 0., 4., -30., 102., -158., 102., -30., 4., 0., 0.],
     [0., 1., -10., 55., -158., 239., -158., 55., -10., 1., 0.],
     [0., 0., 4., -30., 102., -158., 102., -30., 4., 0., 0.],
     [0., 0., 0., 6., -30., 55., -30., 6., 0., 0., 0.],
     [0., 0., 0., 0., 4., -10., 4., 0., 0., 0., 0.],
     [0., 0., 0., 0., 0., 1., 0., 0., 0., 0., 0.],
     [0., 0., 0., 0., 0., 0., 0., 0., 0., 0., 0.]])


def _run(topology=None, halo='auto'):
    from devito_tpu import switchconfig
    grid = Grid(shape=(11, 11), extent=(10, 10))
    if topology is not None:
        ndev = int(np.prod(topology))
        if len(jax.devices()) < ndev:
            pytest.skip("not enough devices")
        grid._distributor = Distributor(grid, topology=topology,
                                        devices=jax.devices()[:ndev])
    time = grid.time_dim
    sp = SparseTimeFunction(name="s", grid=grid, npoint=1, nt=1,
                            coordinates=[[5., 5.]])
    m = TimeFunction(name="m", grid=grid, space_order=2, time_order=1)
    eq = [Eq(m.forward, m + m.laplace)]
    op = Operator(eq + sp.inject(field=m.forward, expr=time))
    with switchconfig(halo=halo):
        op(time_M=5, dt=1.0)
    return np.asarray(m.data)[0]


def test_inject_time_expr():
    """Injecting the time-dimension symbol itself (no source data read)
    reproduces the reference's exact integer wavefield
    (tests/test_sparse.py:470 test_mpi_no_data)."""
    out = _run()
    assert np.array_equal(out, EXPECTED.astype(out.dtype))


@pytest.mark.parametrize('topology,halo', [((2, 2), 'gspmd'),
                                           ((2, 2), 'explicit'),
                                           ((4, 1), 'explicit')])
def test_inject_time_expr_sharded(topology, halo):
    """Same exact wavefield under sharding — the reference runs this
    under mpiexec modes [1, 4]."""
    out = _run(topology=topology, halo=halo)
    assert np.array_equal(out, EXPECTED.astype(out.dtype))
