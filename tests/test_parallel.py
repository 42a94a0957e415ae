"""Multi-chip (virtual mesh) correctness: sharded runs must match
single-device runs exactly.

Reference parity: tests/test_mpi.py — distributed acoustic runs vs serial
(there via mpiexec subprocesses; here via an 8-device host-CPU mesh,
XLA GSPMD inserting the halo collectives — SURVEY.md §4/§2.7).
"""

import numpy as np
import pytest

import jax

from devito_tpu import Grid, TimeFunction, Function, Eq, Operator, solve
from devito_tpu.parallel.distributor import Distributor, compute_dims


def _acoustic_once(grid, nt=8, dt=0.05):
    u = TimeFunction(name='u', grid=grid, time_order=2, space_order=4)
    vp = Function(name='vp', grid=grid)
    vp.data[:] = 1.5
    st = solve((1 / (vp * vp)) * u.dt2 - u.laplace, u.forward)
    mid = tuple(s // 2 for s in grid.shape)
    u.data[(0,) + mid] = 1.0
    op = Operator(Eq(u.forward, st), subs=grid.spacing_map)
    op.apply(time_M=nt - 1, dt=dt)
    return np.array(u.data)


def test_compute_dims():
    assert compute_dims(8, 2) == (4, 2)
    assert compute_dims(6, 2) == (3, 2)
    assert compute_dims(8, 3) == (2, 2, 2)
    assert compute_dims(1, 2) == (1, 1)


@pytest.mark.parametrize('topology', [(4, 2), (2, 2), (8, 1)])
def test_sharded_matches_serial_2d(topology):
    ndev = int(np.prod(topology))
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    shape = (32, 32)
    ref = _acoustic_once(Grid(shape=shape, extent=(31., 31.)))

    grid = Grid(shape=shape, extent=(31., 31.))
    grid._distributor = Distributor(grid, topology=topology,
                                    devices=jax.devices()[:ndev])
    got = _acoustic_once(grid)
    assert np.abs(got - ref).max() < 1e-5


def test_sharded_matches_serial_3d():
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    shape = (16, 16, 16)
    ref = _acoustic_once(Grid(shape=shape,
                              extent=tuple(float(s - 1) for s in shape)))
    grid = Grid(shape=shape, extent=tuple(float(s - 1) for s in shape))
    grid._distributor = Distributor(grid, topology=(4, 2, 1),
                                    devices=jax.devices()[:8])
    got = _acoustic_once(grid)
    assert np.abs(got - ref).max() < 1e-5


def test_sharded_sparse_ops():
    """Injection/interpolation with replicated points over a sharded
    grid."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    from devito_tpu import SparseTimeFunction
    shape = (24, 24)

    def run(grid):
        u = TimeFunction(name='u', grid=grid, space_order=2)
        nt = 6
        src = SparseTimeFunction(name='src', grid=grid, npoint=2, nt=nt,
                                 coordinates=[[11., 11.], [5.5, 17.2]])
        src.data[:] = 1.0
        rec = SparseTimeFunction(name='rec', grid=grid, npoint=3, nt=nt,
                                 coordinates=[[11., 11.], [6., 17.],
                                              [20., 3.]])
        op = Operator([Eq(u.forward, 0.5 * u),
                       src.inject(field=u.forward, expr=src),
                       rec.interpolate(expr=u)])
        op.apply(time_M=nt - 2, dt=1.0)
        return np.array(rec.data)

    ref = run(Grid(shape=shape, extent=(23., 23.)))
    grid = Grid(shape=shape, extent=(23., 23.))
    grid._distributor = Distributor(grid, topology=(2, 2),
                                    devices=jax.devices()[:4])
    got = run(grid)
    assert np.abs(got - ref).max() < 1e-5


def test_distributed_data_windowed_access():
    """Sharded runs expose `.data` as a global-indexing view: windowed
    reads slice the sharded device array (no full gather), writes stay
    device-resident (reference: data/data.py Data + the distributed
    indexing engine, data/distributed/)."""
    import numpy as np
    from devito_tpu import Grid, TimeFunction, Eq, Operator, solve
    from devito_tpu.data import Data

    grid = Grid(shape=(32, 32), extent=(31., 31.), topology=('*', '*'))
    u = TimeFunction(name='u', grid=grid, time_order=2, space_order=2)
    u.data[0, 16, 16] = 1.0
    op = Operator(Eq(u.forward, solve(u.dt2 - u.laplace, u.forward)),
                  subs=grid.spacing_map)
    op.apply(time_M=4, dt=0.1)

    assert isinstance(u.data, Data), type(u.data)
    # windowed read: only a 2x4x4 block crosses the device boundary
    win = u.data[0:2, 14:18, 14:18]
    assert win.shape == (2, 4, 4)
    assert np.isfinite(win).all()
    # consistency with the full gather
    full = np.asarray(u.data)
    assert np.array_equal(win, full[0:2, 14:18, 14:18])
    # single-element read
    assert u.data[0, 16, 16] == full[0, 16, 16]
    # device-resident windowed write, then verify
    u.data[0, 0:2, 0:2] = 7.0
    assert np.allclose(u.data[0, 0:2, 0:2], 7.0)
    # negative index
    assert u.data[0, -1, -1] == full[0, -1, -1]
