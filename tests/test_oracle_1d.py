"""1-D grid + default-extent parity vs the executed reference (the
reference Grid defaults to the unit box: extent 1.0 per dimension)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit('/', 1)[0])
from oracle import harness  # noqa: E402

pytestmark = pytest.mark.skipif(not harness.available(),
                                reason="reference oracle unavailable")


def test_1d_diffusion_vs_oracle():
    ref = harness.reference()
    with ref.use():
        import devito as dv
        g = dv.Grid(shape=(32,), dtype=np.float64)
        u = dv.TimeFunction(name='u', grid=g, space_order=2)
        u.data[0, 16] = 1.
        dv.Operator(dv.Eq(u.forward,
                          dv.solve(dv.Eq(u.dt, 0.3 * u.laplace),
                                   u.forward)))(time_M=20, dt=1e-4)
        r1d = np.asarray(u.data).copy()
    from devito_tpu import Grid, TimeFunction, Eq, Operator, solve
    g2 = Grid(shape=(32,), dtype=np.float64)
    u2 = TimeFunction(name='u', grid=g2, space_order=2)
    u2.data[0, 16] = 1.
    Operator(Eq(u2.forward, solve(Eq(u2.dt, 0.3 * u2.laplace),
                                  u2.forward))).apply(time_M=20, dt=1e-4)
    assert np.allclose(np.asarray(u2.data), r1d, atol=1e-14)


def test_default_extent_is_unit_box():
    from devito_tpu import Grid
    g = Grid(shape=(32, 16))
    assert np.allclose(g.extent, (1., 1.))
    assert np.isclose(float(g.spacing[0]), 1 / 31)
