"""Cross-topology redistribution (reference: the distributed indexing
engine, devito/data/distributed/__init__.py — VERDICT r3 item 7)."""

import numpy as np
import pytest

import jax

from devito_tpu import Grid, Function, TimeFunction
from devito_tpu.parallel import redistribute
from devito_tpu.parallel.distributor import Distributor


def _grid(shape, topology=None, ndev=None):
    grid = Grid(shape=shape, extent=tuple(float(s - 1) for s in shape))
    if topology is not None:
        grid._distributor = Distributor(grid, topology=topology,
                                        devices=jax.devices()[:ndev])
    return grid


@pytest.mark.parametrize('src_topo,dst_topo', [
    ((2, 2), (4, 1)),
    ((4, 1), (1, 4)),
    ((2, 2), None),      # gather to unsharded
    (None, (2, 4)),      # scatter from unsharded
])
def test_reshard_roundtrip_matches_serial(src_topo, dst_topo):
    need = max(int(np.prod(t)) if t else 1 for t in (src_topo, dst_topo))
    if len(jax.devices()) < need:
        pytest.skip("not enough devices")
    ref = np.arange(16. * 24, dtype=np.float32).reshape(16, 24)

    gs = _grid((16, 24), src_topo, int(np.prod(src_topo)) if src_topo
               else None)
    gd = _grid((16, 24), dst_topo, int(np.prod(dst_topo)) if dst_topo
               else None)
    f = Function(name='fsrc', grid=gs, space_order=2)
    g = Function(name='fdst', grid=gd, space_order=4)  # different halo
    f.data[:] = ref
    f._device_array()  # make the source device-authoritative

    redistribute(f, g)
    assert np.array_equal(np.asarray(g.data), ref)

    # round-trip back
    f2 = Function(name='fsrc2', grid=gs, space_order=2)
    redistribute(g, f2)
    assert np.array_equal(np.asarray(f2.data), ref)


def test_reshard_timefunction_uneven():
    """Uneven extents (13 not divisible by 2 or 4) reshard correctly."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    ref = np.random.RandomState(0).randn(3, 13, 16).astype(np.float32)
    gs = _grid((13, 16), (2, 2), 4)
    gd = _grid((13, 16), (4, 1), 4)
    u = TimeFunction(name='ursrc', grid=gs, time_order=2, space_order=2)
    v = TimeFunction(name='urdst', grid=gd, time_order=2, space_order=2)
    u.data[:] = ref
    redistribute(u, v)
    assert np.allclose(np.asarray(v.data), ref)


def test_reshard_dtype_and_layout():
    """Redistribution crosses storage dtypes (fp32 -> bf16 storage)."""
    ref = np.linspace(0, 1, 8 * 128, dtype=np.float32).reshape(8, 128)
    gs = _grid((8, 128))
    gd = _grid((8, 128))
    f = Function(name='flsrc', grid=gs, space_order=2)
    g = Function(name='fldst', grid=gd, space_order=2)
    g.set_storage_dtype('bfloat16')
    f.data[:] = ref
    redistribute(f, g)
    assert np.allclose(np.asarray(g.data), ref, atol=4e-3)


def test_reshard_shape_mismatch_raises():
    gs = _grid((8, 8))
    f = Function(name='fmm1', grid=gs)
    g = Function(name='fmm2', grid=_grid((8, 10)))
    with pytest.raises(ValueError):
        redistribute(f, g)


@pytest.mark.parametrize('src_topo,dst_topo', [
    ((2, 2, 1), (4, 1, 1)),
    ((1, 2, 2), (2, 2, 1)),
])
def test_reshard_3d_topologies(src_topo, dst_topo):
    """3-D grids reshard across different mesh factorizations."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    ref = np.random.RandomState(2).randn(8, 12, 16).astype(np.float32)
    gs = _grid((8, 12, 16), src_topo, 4)
    gd = _grid((8, 12, 16), dst_topo, 4)
    f = Function(name='f3s', grid=gs, space_order=2)
    g = Function(name='f3d', grid=gd, space_order=2)
    f.data[:] = ref
    redistribute(f, g)
    assert np.allclose(np.asarray(g.data), ref)


def test_reshard_timefunction_save_axis():
    """Save-mode TimeFunctions (full history) reshard with the time
    axis replicated."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    ref = np.random.RandomState(3).randn(5, 16, 16).astype(np.float32)
    gs = _grid((16, 16), (2, 2), 4)
    gd = _grid((16, 16), (1, 4), 4)
    u = TimeFunction(name='usv', grid=gs, save=5, space_order=2)
    v = TimeFunction(name='usvd', grid=gd, save=5, space_order=2)
    u.data[:] = ref
    redistribute(u, v)
    assert np.allclose(np.asarray(v.data), ref)
