"""Round-off determinism matrix, ported from the reference's
tests/test_roundoff.py: a chaotic logistic map iterated thousands of steps
must produce BIT-IDENTICAL trajectories through the rolling-buffer and the
full-save formulations (any re-association or staging difference between
the two paths amplifies exponentially and is caught at rtol=0).

Reference runs 10000 iterations; 2000 is far past the Lyapunov horizon of
float32 (~100 steps) and keeps the matrix fast.
"""

import numpy as np
import pytest

from devito_tpu import Constant, Eq, Grid, Operator, TimeFunction

ITER = 2000
DATS = [0.5, 0.624, 3.6767, 4.0]


def _run_pair(lmap_of, dat, dtype):
    r = Constant(name='r', dtype=dtype)
    r.data = dtype(dat)
    s = dtype(0.1)
    grid = Grid(shape=(2, 2), extent=(1, 1), dtype=dtype)
    dt = grid.stepping_dim.spacing
    f0 = TimeFunction(name='f0', grid=grid, time_order=2, dtype=dtype)
    f1 = TimeFunction(name='f1', grid=grid, time_order=2, save=ITER + 2,
                      dtype=dtype)
    ic = dtype(0.7235)
    f0.data[1, :, :] = ic
    f1.data[1, :, :] = ic
    op0 = Operator([Eq(f0.forward, dtype(0.0)),
                    lmap_of(f0, r, s, dt, dtype)])
    op1 = Operator(lmap_of(f1, r, s, dt, dtype))
    op0.apply(time_m=1, time_M=ITER, dt=s)
    op1.apply(time_m=1, time_M=ITER, dt=s)
    a = np.array(f0.data[(ITER + 1) % 3])
    b = np.array(f1.data[ITER + 1])
    # bit-identity (NaN-safe): some (dat, dtype) corners legitimately
    # leave the attractor in low precision; the invariant under test is
    # that the rolling-buffer and full-save trajectories never diverge
    assert np.array_equal(a.view(np.uint8), b.view(np.uint8))


@pytest.mark.parametrize('dat', DATS)
@pytest.mark.parametrize('dtype', [np.float32, np.float64])
def test_lm_forward(dat, dtype):
    """Logistic map with a forward term that should cancel."""
    _run_pair(lambda f, r, s, dt, dty: Eq(
        f.forward, r * f * (1.0 - f + (1.0 / s) * dt * f.forward
                            - f.forward)), dat, dtype)


@pytest.mark.parametrize('dat', DATS)
@pytest.mark.parametrize('dtype', [np.float32, np.float64])
def test_lm_backward(dat, dtype):
    """Logistic map with a backward term that should cancel."""
    _run_pair(lambda f, r, s, dt, dty: Eq(
        f.forward, r * f * (1.0 - f + (1.0 / s) * dt * f.backward
                            - f.backward)), dat, dtype)


@pytest.mark.parametrize('dat', DATS)
@pytest.mark.parametrize('dtype', [np.float32, np.float64])
def test_lm_fb(dat, dtype):
    """Logistic map with forward and backward terms."""
    _run_pair(lambda f, r, s, dt, dty: Eq(
        f.forward, r * f * (1.0 - f + (1.0 / s) * dt * f.backward
                            - f.backward + (1.0 / s) * dt * f.forward
                            - f.forward)), dat, dtype)


@pytest.mark.parametrize('dat', DATS)
@pytest.mark.parametrize('dtype', [np.float32, np.float64])
def test_lm_ds(dat, dtype):
    """Logistic map with a 2nd time-derivative term (the reference halves
    r for this variant to keep the map on its attractor)."""
    _run_pair(lambda f, r, s, dt, dty: Eq(
        f.forward, -r * f.dt2 * s ** 2 * (1.0 - f)
        + r * (1.0 - f) * (f.backward + f.forward)), 0.5 * dat, dtype)
