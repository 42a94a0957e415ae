"""Distributor: multi-chip spatial domain decomposition over a JAX mesh.

Reference parity: devito/mpi/distributed.py (Distributor:316 — Cartesian
communicator with computed dims, neighborhood; CustomTopology:905). The TPU
analog partitions the Grid's space dimensions over a `jax.sharding.Mesh`;
halo exchange is expressed with `shard_map` + `jax.lax.ppermute` per axis
(see parallel/halo.py), and reductions with `psum` — XLA collectives over
ICI instead of generated MPI code (mpi/routines.py).
"""

import numpy as np

from ..utils import as_tuple

__all__ = ['Distributor', 'compute_dims']


def compute_dims(nprocs, ndim):
    """Factor ``nprocs`` into a balanced ``ndim``-tuple (reference:
    compute_dims, mpi/distributed.py:1011 — MPI_Dims_create-like)."""
    dims = [1] * ndim
    remaining = nprocs
    primes = []
    n = remaining
    f = 2
    while f * f <= n:
        while n % f == 0:
            primes.append(f)
            n //= f
        f += 1
    if n > 1:
        primes.append(n)
    for p in sorted(primes, reverse=True):
        i = int(np.argmin(dims))
        dims[i] *= p
    return tuple(sorted(dims, reverse=True))


class Distributor:
    """Maps a Grid's space dimensions onto a device mesh.

    ``topology``: per-dim process counts (``'*'`` entries auto-derived, as
    in the reference's CustomTopology shortcuts), or None for automatic
    factorization over all available devices.
    """

    def __init__(self, grid, topology=None, devices=None, axis_names=None):
        import jax
        self._grid = grid
        devices = devices if devices is not None else jax.devices()
        nd = grid.dim
        nprocs = len(devices)
        if topology is None:
            # shard the outermost (up to two) dims; keep innermost whole
            # (TPU-first: last dim stays contiguous for lane efficiency)
            if nd == 1:
                topo = (nprocs,)
            else:
                t2 = compute_dims(nprocs, min(nd, 2))
                topo = t2 + (1,) * (nd - len(t2))
        else:
            topo = []
            known = 1
            stars = 0
            for t in topology:
                if t == '*':
                    stars += 1
                else:
                    known *= int(t)
            fill = compute_dims(nprocs // known, stars) if stars else ()
            fi = 0
            for t in topology:
                if t == '*':
                    topo.append(fill[fi])
                    fi += 1
                else:
                    topo.append(int(t))
            topo = tuple(topo)
        if int(np.prod(topo)) != nprocs:
            raise ValueError(f"Topology {topo} != {nprocs} devices")
        self._topology = topo
        self._axis_names = tuple(axis_names or
                                 (d.name for d in grid.dimensions))

        from jax.sharding import Mesh
        mesh_devs = np.array(devices).reshape(topo)
        self._mesh = Mesh(mesh_devs, self._axis_names)

    # jax Device objects are process-local handles: pickle the topology
    # and re-bind devices on load (the reference pickles Operators and
    # re-attaches the MPI comm at run time — tests/test_pickle.py)
    def __getstate__(self):
        state = dict(self.__dict__)
        state.pop('_mesh', None)
        return state

    def __setstate__(self, state):
        import jax
        self.__dict__.update(state)
        ndev = int(np.prod(self._topology))
        devices = jax.devices()[:ndev]
        if len(devices) < ndev:
            raise RuntimeError(
                f"unpickling a Distributor over {ndev} devices but only "
                f"{len(devices)} available")
        from jax.sharding import Mesh
        mesh_devs = np.array(devices).reshape(self._topology)
        self._mesh = Mesh(mesh_devs, self._axis_names)

    @property
    def mesh(self):
        return self._mesh

    @property
    def topology(self):
        return self._topology

    @property
    def nprocs(self):
        return int(np.prod(self._topology))

    @property
    def axis_names(self):
        return self._axis_names

    @property
    def shape_local(self):
        return tuple(s // t for s, t in zip(self._grid.shape,
                                            self._topology))

    def sharding(self, with_time_axis=False):
        """NamedSharding for (possibly time-prefixed) grid arrays."""
        from jax.sharding import NamedSharding, PartitionSpec
        spec = [None] if with_time_axis else []
        for name, t in zip(self._axis_names, self._topology):
            spec.append(name if t > 1 else None)
        return NamedSharding(self._mesh, PartitionSpec(*spec))

    def __repr__(self):
        return f"Distributor(topology={self._topology})"
