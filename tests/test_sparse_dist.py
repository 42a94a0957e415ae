"""Sparse point owner-bucketing on the explicit halo path.

The reference scatters sparse point data to owning MPI ranks
(SparseDistributor, devito/mpi/distributed.py:729; _dist_scatter,
devito/types/sparse.py:715).  The TPU redesign keeps shapes static:
fixed-capacity -1-padded ownership buckets ride the mesh
(parallel/halo.py bucket_sparse_points), each shard gathers/scatters
only its ~P/N owned points, and straddling points combine their
owned-corner partials through the existing corner-ownership mask +
psum.
"""

import numpy as np
import pytest

import jax

from devito_tpu import Grid, TimeFunction, Eq, Operator, solve
from devito_tpu.parallel.halo import bucket_sparse_points
from devito_tpu.types.sparse import SparseTimeFunction


class TestBuckets:

    def _grid(self, shape=(64, 64)):
        return Grid(shape=shape, extent=tuple(10. * (n - 1)
                                              for n in shape))

    def test_interior_points_land_in_one_bucket(self):
        grid = self._grid()
        # 4 points, one per quadrant interior, topology (2, 2)
        coords = np.array([[100., 100.], [100., 500.],
                           [500., 100.], [500., 500.]])
        b = bucket_sparse_points(coords, grid, (2, 2), radius=2)
        assert b.shape[:2] == (2, 2)
        counts = (b >= 0).sum(axis=-1)
        assert counts.tolist() == [[1, 1], [1, 1]]
        assert b[0, 0, 0] == 0 and b[0, 1, 0] == 1
        assert b[1, 0, 0] == 2 and b[1, 1, 0] == 3

    def test_straddler_appears_in_both_buckets(self):
        grid = self._grid()
        # x = 315 -> grid point 31.5, shard boundary at 32: the support
        # [29.5, 33.5] overlaps both x-shards
        coords = np.array([[315., 100.]])
        b = bucket_sparse_points(coords, grid, (2, 1), radius=2)
        counts = (b >= 0).sum(axis=-1)
        assert counts.tolist() == [[1], [1]]

    def test_capacity_is_max_bucket_and_padding(self):
        grid = self._grid()
        coords = np.array([[100., 100.], [110., 100.], [120., 100.],
                           [500., 500.]])
        b = bucket_sparse_points(coords, grid, (2, 2), radius=1)
        assert b.shape == (2, 2, 3)
        assert (b[0, 0] >= 0).sum() == 3
        assert (b[1, 1] >= 0).sum() == 1
        assert (b[1, 1][1:] == -1).all()
        assert (b[0, 1] == -1).all()


@pytest.mark.skipif(len(jax.devices()) < 4,
                    reason="needs >=4 virtual devices")
class TestOwnerShardedExecution:

    def _run(self, topology, rec_x=None):
        shape = (64, 64)
        grid = Grid(shape=shape, extent=(630., 630.), topology=topology)
        u = TimeFunction(name='u', grid=grid, time_order=2, space_order=4)
        src = SparseTimeFunction(name='src', grid=grid, npoint=1, nt=51)
        src.coordinates.data[:] = [[315., 315.]]
        src.data[:, 0] = np.sin(0.3 * np.arange(51))
        nrec = 16
        rec = SparseTimeFunction(name='rec', grid=grid, npoint=nrec,
                                 nt=51)
        xs = rec_x if rec_x is not None else np.linspace(10., 620., nrec)
        rec.coordinates.data[:] = np.stack(
            [xs, np.full(nrec, 100.)], 1)
        eq = Eq(u.forward, solve(Eq(u.dt2, 4.0 * u.laplace), u.forward))
        op = Operator([eq, src.inject(u.forward, expr=src),
                       rec.interpolate(expr=u)])
        op.apply(time_m=1, time_M=49, dt=0.5)
        return np.asarray(rec.data).copy(), op

    def test_sharded_matches_serial(self):
        r1, _ = self._run(None)
        r8, op = self._run(('*', '*'))
        hr = op._halo_runner_for()
        assert hr is not None, "expected explicit halo path"
        assert np.linalg.norm(r1) > 0
        assert np.allclose(r1, r8, atol=1e-5), np.abs(r1 - r8).max()

    def test_boundary_receivers_match_serial(self):
        # receivers pinned near/on the shard boundaries: straddling
        # supports must combine owned-corner partials exactly
        xs = np.array([314., 315., 316., 157.5, 472.5, 10., 620., 313.,
                       317., 300., 330., 400., 100., 500., 50., 600.])
        r1, _ = self._run(None, rec_x=xs)
        r8, _ = self._run(('*', '*'), rec_x=xs)
        assert np.linalg.norm(r1) > 0
        assert np.allclose(r1, r8, atol=1e-5), np.abs(r1 - r8).max()

    def test_per_shard_point_counts(self):
        # the done-criterion of VERDICT item 5: per-shard counts shrink
        # to ~P/N (+ straddlers), asserted on the actual bucket buffer
        r8, op = self._run(('*', '*'))
        hr = op._halo_runner_for()
        wbufs, rbufs, params, tm, tM, bound = op._prepare(
            {'dt': 0.5, 'time_m': 1, 'time_M': 49}, shard=False,
            zcompact=False)
        _, rshard = hr.prepare_buffers(wbufs, rbufs)
        own = np.asarray(rshard['rec_own'])
        topo = own.shape[:-1]
        assert int(np.prod(topo)) >= 4
        counts = (own >= 0).sum(axis=-1)
        # every shard holds far fewer than all 16 points
        assert counts.max() <= 16 // 2
        # and all 16 points are covered at least once
        assert len(set(own[own >= 0].tolist())) == 16
