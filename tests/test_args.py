"""Runtime-argument validation (reference: per-type _arg_check,
devito/operator/operator.py:583 — typed InvalidArgument errors instead of
downstream XLA shape errors or silent index clamping)."""

import numpy as np
import pytest

from devito_tpu import (Grid, TimeFunction, Function, Eq, Operator, solve,
                        InvalidArgument)
from devito_tpu.models.seismic import acoustic_setup


def _op(shape=(24, 24), save=None, dtype=np.float32):
    grid = Grid(shape=shape, extent=tuple(float(s - 1) for s in shape),
                dtype=dtype)
    u = TimeFunction(name='u', grid=grid, time_order=2, space_order=4,
                     save=save)
    st = solve(u.dt2 - u.laplace, u.forward)
    return grid, u, Operator(Eq(u.forward, st), subs=grid.spacing_map)


def test_override_shape_mismatch_raises():
    grid, u, op = _op()
    other = Grid(shape=(30, 30), extent=(29., 29.))
    u2 = TimeFunction(name='u', grid=other, time_order=2, space_order=4)
    with pytest.raises(InvalidArgument, match="shape"):
        op.apply(u=u2, time_M=3, dt=0.1)


def test_override_dtype_mismatch_raises():
    grid, u, op = _op()
    g64 = Grid(shape=(24, 24), extent=(23., 23.), dtype=np.float64)
    u2 = TimeFunction(name='u', grid=g64, time_order=2, space_order=4)
    with pytest.raises(InvalidArgument, match="dtype"):
        op.apply(u=u2, time_M=3, dt=0.1)


def test_time_M_out_of_bounds_raises():
    grid, u, op = _op(save=12)
    with pytest.raises(InvalidArgument, match="out of bounds"):
        op.apply(time_M=40, dt=0.1)


def test_negative_time_m_raises():
    grid, u, op = _op()
    with pytest.raises(InvalidArgument, match="time_m"):
        op.apply(time_m=-2, time_M=3, dt=0.1)


def test_unknown_kwarg_raises():
    grid, u, op = _op()
    with pytest.raises(InvalidArgument, match="Unknown"):
        op.apply(time_M=3, dt=0.1, bogus=1)


def test_src_time_M_bound_matches_reference():
    """Default forward bounds derive from the source row count; explicitly
    exceeding them is rejected instead of clamping gather rows."""
    solver = acoustic_setup(shape=(24, 24), spacing=[12.5, 12.5], nbl=4,
                            tn=100., space_order=4,
                            preset='layers-isotropic')
    nt = solver.geometry.nt
    with pytest.raises(InvalidArgument, match="out of bounds"):
        solver.forward(time_M=nt + 10)


def test_spatial_bounds_override():
    """Per-dimension x_m/x_M apply kwargs restrict the iteration region
    (reference: dimension _arg_values spatial overrides)."""
    import numpy as np
    from devito_tpu import Grid, Function, TimeFunction, Eq, Operator
    g = Grid(shape=(10, 10))
    f = Function(name='fsb', grid=g)
    Operator(Eq(f, 1)).apply(x_m=2, x_M=5, y_m=1, y_M=8)
    d = np.asarray(f.data)
    assert d.sum() == 32.0
    assert d[2:6, 1:9].min() == 1.0 and d[0].sum() == 0

    u = TimeFunction(name='usb', grid=g)
    op = Operator(Eq(u.forward, u + 1))
    op.apply(time_M=2, dt=1., x_m=3, x_M=6)
    rows = np.asarray(u.data)[0].sum(axis=1)
    assert rows[3] == 20. and rows[0] == 0.
    # same operator, full domain afterwards (per-apply runner cache)
    op.apply(time_M=2, dt=1.)
    assert np.asarray(u.data)[0].sum() > 200.


def test_bare_dim_with_explicit_bound():
    """op(x=3, x_M=5): the explicit x_M wins over the bare-dim shorthand
    and the shorthand must not leak to the unknown-kwargs check
    (ADVICE r2: conflicting bounds resolution)."""
    import numpy as np
    from devito_tpu import Grid, Function, Eq, Operator
    g = Grid(shape=(10, 10))
    f = Function(name='fbd', grid=g)
    Operator(Eq(f, 1)).apply(x=3, x_M=5)
    d = np.asarray(f.data)
    assert d[:6].sum() == 60.0 and d[6:].sum() == 0.0


def test_bare_dim_non_integer_raises():
    """A non-numeric bare-dim value raises the typed InvalidArgument, not
    a raw TypeError (ADVICE r2)."""
    from devito_tpu import Grid, Function, Eq, Operator
    g = Grid(shape=(10, 10))
    f = Function(name='fni', grid=g)
    op = Operator(Eq(f, 1))
    with pytest.raises(InvalidArgument, match="integer scalar"):
        op.apply(x=g.dimensions[0])


def test_layout_registry_no_cross_family_leak():
    """A z-compact layout registered for one function must not poison a
    later, unrelated function that reuses the name (regression: a stale
    name-keyed registry entry made builtins.norm slice a padded buffer
    with compact halo offsets, dropping the last lane column)."""
    import numpy as np
    from devito_tpu import Grid, Function
    from devito_tpu.builtins import norm
    from devito_tpu.types.dense import _layout_registry
    g1 = Grid(shape=(16, 16))
    f1 = Function(name='flk', grid=g1)
    # simulate a prior operator choosing the compact layout for f1
    f1.set_device_layout('zcompact')
    assert f1.is_zcompact
    g2 = Grid(shape=(12, 12), extent=(11., 11.), dtype=np.float64)
    f2 = Function(name='flk', grid=g2, dtype=np.float64)
    assert not f2.is_zcompact  # different family: entry must not apply
    f2.data[:] = np.arange(144.).reshape(12, 12) - 70.
    ref = np.linalg.norm(np.arange(144.) - 70.)
    assert np.isclose(norm(f2), ref, rtol=1e-12)
