"""Multi-chip walkthrough tests (reference: examples/mpi notebooks run
under mpiexec in CI; here on the virtual 8-device mesh)."""

import numpy as np

from examples.multichip import (sharded_diffusion, topologies_demo,
                                halo_modes_demo)


def test_sharded_matches_serial():
    u_s, grid_s = sharded_diffusion(topology=('*', '*'))
    u_1, _ = sharded_diffusion(topology=None)
    assert np.allclose(np.asarray(u_s.data), np.asarray(u_1.data),
                       atol=1e-13)


def test_topologies():
    out = topologies_demo()
    assert out[('*', '1') if ('*', '1') in out else ('*', 1)][1] == 1
    full = out[('*', '*')]
    assert int(np.prod(full)) >= 1


def test_halo_modes_agree():
    res = halo_modes_demo()
    assert np.allclose(res['gspmd'], res['explicit'], atol=1e-12)
