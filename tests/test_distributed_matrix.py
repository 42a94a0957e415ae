"""Distributed-numerics matrix: solver x topology x halo mode.

Reference parity: tests/test_mpi.py runs the full seismic solver zoo
under mpiexec across rank layouts and asserts parity with serial runs
(TestIsotropicAcoustic test_mpi.py:3327, plus the TTI/elastic/visco
sweeps). Here the mesh is the 8-device virtual host-CPU mesh (conftest)
and the two communication backends under test are the explicit
shard_map+ppermute halo path and the GSPMD partitioner fallback
(SURVEY.md §2.7); every cell of the matrix must reproduce the serial
wavefield/receiver output.
"""

import numpy as np
import pytest

import jax

from devito_tpu import switchconfig
from devito_tpu.parallel.distributor import Distributor


def _shard(grid, topology):
    ndev = int(np.prod(topology))
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    grid._distributor = Distributor(grid, topology=topology,
                                    devices=jax.devices()[:ndev])


def _acoustic(topology, halo, save=False):
    from devito_tpu.models.seismic import acoustic_setup
    solver = acoustic_setup(shape=(28, 28), spacing=(10., 10.), tn=80.,
                            nbl=6, space_order=4)
    if topology:
        _shard(solver.model.grid, topology)
    with switchconfig(halo=halo):
        rec, u, _ = solver.forward(save=save)
    return {'rec': np.array(rec.data), 'u': np.array(u.data)}


def _tti(topology, halo):
    from devito_tpu.models.seismic.tti import tti_setup
    solver = tti_setup(shape=(24, 24), spacing=(10., 10.), tn=60., nbl=4,
                       space_order=4)
    if topology:
        _shard(solver.model.grid, topology)
    with switchconfig(halo=halo):
        rec, u, v, _ = solver.forward()
    return {'rec': np.array(rec.data), 'u': np.array(u.data),
            'v': np.array(v.data)}


def _elastic(topology, halo):
    from devito_tpu.models.seismic.elastic import elastic_setup
    solver = elastic_setup(shape=(24, 24), spacing=(10., 10.), tn=60.,
                           nbl=4, space_order=4)
    if topology:
        _shard(solver.model.grid, topology)
    with switchconfig(halo=halo):
        rec1, rec2, v, tau, _ = solver.forward()
    return {'rec1': np.array(rec1.data), 'rec2': np.array(rec2.data),
            'vx': np.array(v[0].data)}


def _viscoacoustic(topology, halo):
    from devito_tpu.models.seismic.viscoacoustic import viscoacoustic_setup
    solver = viscoacoustic_setup(shape=(24, 24), spacing=(10., 10.),
                                 tn=60., nbl=4, space_order=4)
    if topology:
        _shard(solver.model.grid, topology)
    with switchconfig(halo=halo):
        rec, p, v, _ = solver.forward()
    return {'rec': np.array(rec.data), 'p': np.array(p.data)}


def _viscoelastic(topology, halo):
    from devito_tpu.models.seismic.viscoelastic import viscoelastic_setup
    solver = viscoelastic_setup(shape=(24, 24), spacing=(10., 10.),
                                tn=50., nbl=4, space_order=4)
    if topology:
        _shard(solver.model.grid, topology)
    with switchconfig(halo=halo):
        rec1, rec2, v, tau, _ = solver.forward()
    return {'rec1': np.array(rec1.data), 'rec2': np.array(rec2.data)}


def _self_adjoint(topology, halo):
    from devito_tpu.models.seismic.self_adjoint import sa_setup
    solver = sa_setup(shape=(24, 24), spacing=(10., 10.), tn=60., npad=4,
                      space_order=4)
    if topology:
        _shard(solver.model.grid, topology)
    with switchconfig(halo=halo):
        rec, u, _ = solver.forward()
    return {'rec': np.array(rec.data), 'u': np.array(u.data)}


_RUNNERS = {
    'acoustic': _acoustic,
    'tti': _tti,
    'elastic': _elastic,
    'viscoacoustic': _viscoacoustic,
    'viscoelastic': _viscoelastic,
    'self_adjoint': _self_adjoint,
}

# serial references, computed once per solver kind
_serial_cache = {}


def _serial(kind):
    if kind not in _serial_cache:
        _serial_cache[kind] = _RUNNERS[kind](None, 'auto')
    return _serial_cache[kind]


def _check(kind, topology, halo):
    ref = _serial(kind)
    got = _RUNNERS[kind](topology, halo)
    for name in ref:
        r, g = ref[name], got[name]
        scale = max(float(np.abs(r).max()), 1e-3)
        err = np.abs(g - r).max() / scale
        assert err < 2e-5, \
            f"{kind}/{name} topology={topology} halo={halo}: " \
            f"relative max err {err:.2e}"


TOPOLOGIES_2D = [(4, 2), (2, 2), (8, 1), (1, 8)]


@pytest.mark.parametrize('halo', ['auto', 'gspmd'])
@pytest.mark.parametrize('topology', TOPOLOGIES_2D)
@pytest.mark.parametrize('kind', sorted(_RUNNERS))
def test_solver_matrix_2d(kind, topology, halo):
    _check(kind, topology, halo)


@pytest.mark.parametrize('halo', ['auto', 'gspmd'])
@pytest.mark.parametrize('topology', [(2, 2, 2), (4, 2, 1), (1, 2, 4)])
def test_acoustic_3d(topology, halo):
    from devito_tpu.models.seismic import acoustic_setup
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")

    def run(topo, halo):
        solver = acoustic_setup(shape=(16, 16, 16),
                                spacing=(10., 10., 10.), tn=50., nbl=4,
                                space_order=4)
        if topo:
            _shard(solver.model.grid, topo)
        with switchconfig(halo=halo):
            rec, u, _ = solver.forward()
        return np.array(rec.data), np.array(u.data)

    key = 'acoustic3d'
    if key not in _serial_cache:
        _serial_cache[key] = run(None, 'auto')
    r0, u0 = _serial_cache[key]
    r1, u1 = run(topology, halo)
    assert np.abs(r1 - r0).max() / max(np.abs(r0).max(), 1e-3) < 2e-5
    assert np.abs(u1 - u0).max() / max(np.abs(u0).max(), 1e-3) < 2e-5


@pytest.mark.parametrize('topology', [(4, 2), (2, 2)])
def test_acoustic_explicit_forced(topology):
    """halo='explicit' must not raise for the damped-BC acoustic solver
    (round-1 VERDICT item 4: the BC idiom used to disqualify the fast
    path) and must match serial."""
    _check('acoustic', topology, 'explicit')


@pytest.mark.parametrize('halo', ['auto', 'gspmd'])
@pytest.mark.parametrize('topology', [(4, 2), (2, 2)])
def test_acoustic_save_matrix(topology, halo):
    """save=True (full wavefield history) under sharding: the save
    buffer itself is sharded and must match serial."""
    key = 'acoustic-save'
    if key not in _serial_cache:
        _serial_cache[key] = _acoustic(None, 'auto', save=True)
    ref = _serial_cache[key]
    got = _acoustic(topology, halo, save=True)
    for name in ref:
        r, g = ref[name], got[name]
        err = np.abs(g - r).max() / max(float(np.abs(r).max()), 1e-3)
        assert err < 2e-5, f"{name}: {err:.2e}"
