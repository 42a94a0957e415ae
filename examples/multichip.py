"""Multi-chip walkthrough (reference: examples/mpi notebooks — MPI
overview, distributed data initialization; here: device meshes,
sharded runs, the global-indexing Data view, and halo modes).

Runs on any device count — tests use the 8-device virtual CPU mesh
(the TPU analog of the reference's localhost-mpiexec trick).
"""

import numpy as np

from devito_tpu import (Grid, Function, TimeFunction, Eq, Operator, solve,
                        configuration, switchconfig)

__all__ = ['sharded_diffusion', 'topologies_demo', 'halo_modes_demo']


def sharded_diffusion(shape=(64, 64), steps=40, topology=('*', '*')):
    """Shard the grid over the mesh; same user code as single-chip
    (reference: DEVITO_MPI=1 runs of unchanged scripts). ``topology=None``
    runs unsharded."""
    kw = {'topology': topology} if topology is not None else {}
    grid = Grid(shape=shape, extent=tuple(float(s - 1) for s in shape),
                dtype=np.float64, **kw)
    u = TimeFunction(name='u', grid=grid, space_order=2)
    u.data[0, shape[0] // 2, shape[1] // 2] = 1.
    op = Operator(Eq(u.forward, solve(Eq(u.dt, 0.2 * u.laplace),
                                      u.forward)), subs=grid.spacing_map)
    op.apply(time_M=steps - 1, dt=0.1)
    return u, grid


def topologies_demo():
    """CustomTopology shortcuts (reference: mpi/distributed.py
    CustomTopology '*' semantics)."""
    out = {}
    for topo in (('*', '*'), ('*', 1), (1, '*')):
        g = Grid(shape=(32, 32), extent=(31., 31.), topology=topo)
        dist = g.distributor
        out[topo] = dist.topology if dist is not None else None
    return out


def halo_modes_demo(steps=20):
    """Explicit shard_map+ppermute halos vs GSPMD (reference: the 6
    generated MPI exchange schemes; here two modes, numerically equal)."""
    results = {}
    for mode in ('gspmd', 'explicit'):
        with switchconfig(halo=mode):
            grid = Grid(shape=(64, 64), extent=(63., 63.),
                        dtype=np.float64, topology=('*', '*'))
            u = TimeFunction(name='u', grid=grid, space_order=2)
            u.data[0, 32, 32] = 1.
            op = Operator(Eq(u.forward, solve(Eq(u.dt, 0.2 * u.laplace),
                                              u.forward)),
                          subs=grid.spacing_map)
            op.apply(time_M=steps - 1, dt=0.1)
            results[mode] = np.asarray(u.data).copy()
    return results
