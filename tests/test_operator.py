"""Operator end-to-end numerical tests vs NumPy references.

Reference parity: tests/test_operator.py (89 tests) — behavioral subset:
time marching with rolling buffers, save mode, increments, subdomains,
multiple equations, backward direction, conditional (subsampled) saves.
"""

import numpy as np
import pytest

from devito_tpu import (Grid, Function, TimeFunction, SparseTimeFunction,
                        Eq, Inc, Operator, Constant, solve,
                        ConditionalDimension)


def test_identity_copy(grid2d):
    u = TimeFunction(name='u', grid=grid2d)
    u.data[0] = np.random.rand(*u.data[0].shape).astype(np.float32)
    op = Operator(Eq(u.forward, u))
    op.apply(time_M=0, dt=1.0)
    assert np.allclose(u.data[1], u.data[0])


def test_arithmetic_update(grid2d):
    u = TimeFunction(name='u', grid=grid2d)
    u.data[:] = 1.0
    op = Operator(Eq(u.forward, u + 2.0))
    op.apply(time_M=3, dt=1.0)
    # after 4 steps: values 1 + 2*4 = 9 in slot (4 % 2)
    assert np.allclose(u.data[0], 9.0)


def test_rolling_buffer_slots(grid2d):
    u = TimeFunction(name='u', grid=grid2d, time_order=2)
    u.data[:] = 0.0
    op = Operator(Eq(u.forward, u + 1))
    op.apply(time_M=4, dt=1.0)  # t=0..4 writes slots 1,2,0,1,2
    # u(t+1) = u(t) + 1 -> values: slot1=1, slot2=2, slot0=3, slot1=4, slot2=5
    assert np.allclose(u.data[2], 5.0)
    assert np.allclose(u.data[1], 4.0)
    assert np.allclose(u.data[0], 3.0)


def test_save_mode(grid2d):
    nt = 6
    u = TimeFunction(name='u', grid=grid2d, save=nt)
    u.data[0] = 1.0
    op = Operator(Eq(u.forward, u + 1))
    op.apply(dt=1.0)  # default time_M = nt-2
    for i in range(nt):
        assert np.allclose(u.data[i], 1.0 + i), i


def test_increment(grid2d):
    u = TimeFunction(name='u', grid=grid2d)
    f = Function(name='f', grid=grid2d)
    u.data[:] = 1.0
    op = Operator([Eq(u.forward, u), Inc(f, u)])
    op.apply(time_M=4, dt=1.0)
    assert np.allclose(f.data, 5.0)


def test_constant(grid2d):
    c = Constant(name='c', value=3.0)
    u = TimeFunction(name='u', grid=grid2d)
    op = Operator(Eq(u.forward, u + c))
    op.apply(time_M=1, dt=1.0)
    assert np.allclose(u.data[0], 6.0)
    # override at apply time without recompile
    u.data[:] = 0.0
    op.apply(time_M=1, dt=1.0, c=5.0)
    assert np.allclose(u.data[0], 10.0)


def test_static_equation_prologue(grid2d):
    f = Function(name='f', grid=grid2d)
    u = TimeFunction(name='u', grid=grid2d)
    op = Operator([Eq(f, 7.0), Eq(u.forward, u + f)])
    op.apply(time_M=1, dt=1.0)
    assert np.allclose(f.data, 7.0)
    assert np.allclose(u.data[0], 14.0)


def test_subdomain_interior(grid2d):
    u = TimeFunction(name='u', grid=grid2d)
    op = Operator(Eq(u.forward, u + 1, subdomain=grid2d.interior))
    op.apply(time_M=0, dt=1.0)
    assert np.allclose(u.data[1][1:-1, 1:-1], 1.0)
    assert np.allclose(u.data[1][0, :], 0.0)
    assert np.allclose(u.data[1][:, -1], 0.0)


def test_backward_direction(grid2d):
    v = TimeFunction(name='v', grid=grid2d)
    v.data[:] = 0.0
    op = Operator(Eq(v.backward, v + 1))
    assert op.schedule.direction == -1
    op.apply(time_m=1, time_M=4, dt=1.0)
    # iterates t=4,3,2,1 accumulating
    assert np.allclose(v.data[0], 4.0)


def test_diffusion_vs_numpy():
    nx = ny = 21
    g = Grid(shape=(nx, ny), extent=(2., 2.))
    u = TimeFunction(name='u', grid=g, time_order=1, space_order=2)
    nu, dt, nt = 0.05, 1e-4, 30
    stencil = solve(Eq(u.dt, nu * u.laplace), u.forward)
    op = Operator(Eq(u.forward, stencil))
    u.data[0, 8:13, 8:13] = 1.0
    init = u.data[0].copy()
    op.apply(time_m=0, time_M=nt - 1, dt=dt)
    res = np.array(u.data[nt % 2])

    dx = 2. / (nx - 1)
    ref = init.copy()
    for n in range(nt):
        p = np.pad(ref, 1)
        lap = ((p[2:, 1:-1] - 2 * p[1:-1, 1:-1] + p[:-2, 1:-1]) / dx ** 2 +
               (p[1:-1, 2:] - 2 * p[1:-1, 1:-1] + p[1:-1, :-2]) / dx ** 2)
        ref = ref + dt * nu * lap
    assert np.abs(res - ref).max() < 1e-5


def test_conditional_dimension_subsampled_save():
    g = Grid(shape=(8, 8))
    nt, factor = 12, 3
    time = g.time_dim
    tsub = ConditionalDimension('tsub', parent=time, factor=factor)
    u = TimeFunction(name='u', grid=g)
    usave = TimeFunction(name='usave', grid=g, time_dim=tsub,
                         save=(nt + factor - 1) // factor)
    op = Operator([Eq(u.forward, u + 1), Eq(usave, u)])
    op.apply(time_m=0, time_M=nt - 2, dt=1.0)
    # at t multiple of factor, usave[t//factor] = u(t) = t
    for i in range((nt - 1) // factor):
        assert np.allclose(usave.data[i], i * factor), i


def test_sparse_injection_weights():
    g = Grid(shape=(11, 11), extent=(10., 10.))
    u = TimeFunction(name='u', grid=g, space_order=2)
    s = SparseTimeFunction(name='s', grid=g, npoint=1, nt=4,
                           coordinates=[[5.25, 5.5]])
    s.data[:] = 1.0
    op = Operator(s.inject(field=u.forward, expr=s))
    op.apply(time_M=0, dt=1.0)
    got = np.array(u.data[1, 5:7, 5:7])
    expect = np.array([[0.75 * 0.5, 0.75 * 0.5],
                       [0.25 * 0.5, 0.25 * 0.5]])
    assert np.allclose(got, expect, atol=1e-6)
    assert abs(u.data[1].sum() - 1.0) < 1e-6


def test_sparse_interp_linear_field():
    # interpolating a linear field is exact
    g = Grid(shape=(11, 11), extent=(10., 10.))
    u = TimeFunction(name='u', grid=g, space_order=2)
    xs = np.arange(11, dtype=np.float32)
    u.data[:] = xs[None, :, None] + 2.0 * xs[None, None, :]
    pts = np.array([[3.3, 7.7], [0.1, 9.4], [5.0, 5.0]])
    rec = SparseTimeFunction(name='r', grid=g, npoint=3, nt=3,
                             coordinates=pts)
    op = Operator(rec.interpolate(expr=u))
    op.apply(time_m=0, time_M=1, dt=1.0)
    expect = pts[:, 0] + 2 * pts[:, 1]
    assert np.allclose(rec.data[0], expect, rtol=1e-5)


def test_function_override(grid2d):
    u = TimeFunction(name='u', grid=grid2d)
    u2 = TimeFunction(name='u2', grid=grid2d)
    u.data[:] = 1.0
    u2.data[:] = 5.0
    op = Operator(Eq(u.forward, u + 1))
    op.apply(time_M=0, dt=1.0, u=u2)
    assert np.allclose(u2.data[1], 6.0)
    assert np.allclose(u.data[1], 1.0)  # untouched


def test_performance_summary(grid2d):
    u = TimeFunction(name='u', grid=grid2d, space_order=2)
    op = Operator(Eq(u.forward, u.laplace))
    summary = op.apply(time_M=5, dt=1.0)
    assert 'section0' in summary
    assert summary['section0'].time > 0
    assert summary['section0'].ops > 0


def test_per_section_summary():
    """Multi-equation operators report one PerfEntry per section with
    exact flop/point counts (reference: per-Section profiling,
    operator/profiling.py PerformanceSummary)."""
    import numpy as np
    from devito_tpu import Grid, TimeFunction, Eq, Operator, solve
    g = Grid(shape=(16, 16), extent=(15., 15.))
    u = TimeFunction(name='u', grid=g, space_order=2)
    v = TimeFunction(name='v', grid=g, space_order=2)
    u.data[0, 8, 8] = 1.
    op = Operator([Eq(u.forward, solve(Eq(u.dt, 0.5 * u.laplace), u.forward)),
                   Eq(v.forward, v + u.forward)])
    summary = op.apply(time_M=4, dt=0.01)
    assert 'section0' in summary and 'section1' in summary
    assert summary.labels['section0'] == 'u'
    assert summary.labels['section1'] == 'v'
    assert summary['section0'].ops > 0 and summary['section1'].ops > 0
    total = sum(e.time for e in summary.values())
    assert np.isclose(total, summary.globals['fdlike'].time, rtol=1e-6)


def test_layout_switch_retraces():
    """An apply that switches a slot's device layout (padded <-> z-compact
    — e.g. overriding an edge-padded physical parameter with a fresh
    zero-halo one) must re-trace the runner: padded and compact buffers
    can share (shape, dtype) while the traced offsets differ (regression:
    jax's callable-identity trace cache reused the padded-offset trace
    for a compact buffer and read the parameter 4 lanes off, nan-ing
    the wavefield)."""
    from devito_tpu.models.seismic import acoustic_setup
    from devito_tpu.builtins import smooth

    wave = acoustic_setup(shape=(50, 60), spacing=(10., 10.),
                          kernel='OT2', tn=400.0, space_order=4, nbl=40,
                          preset='layers-isotropic')
    vel0 = Function(name='vel0_ls', grid=wave.model.grid, space_order=4)
    smooth(vel0, wave.model.vp)
    wave.forward(time_M=3)             # vp: halo 'edge' -> padded layout
    d, uu = wave.forward(vp=vel0, time_M=3)[0:2]   # vel0: 'zero' -> compact
    assert np.isfinite(np.asarray(uu.data)).all()
