"""Phase-unrolled (static-slot) execution (compiler/executor.py
build_runner): the time loop unrolls by the lcm of the stepping-buffer
sizes so slot routing is static and no per-step dynamic row slice (and
its materialized full-grid copy — 2.45 of 5.52 ms/step at fp32 512^3,
PERF_NOTES r5) remains.  These tests pin (a) trajectory equality with
the dynamic-row path across step counts and time windows, (b) the
eligibility gates, and (c) the trace-parser's macro cadence handling."""

import numpy as np
import pytest

from devito_tpu import (Grid, Function, TimeFunction, Eq, Inc, Operator,
                        solve)


def _traj(shape=(20, 20), so=4, steps=8, tm=0, env=None, eqs=None,
          mixed=False):
    import os
    old = os.environ.get('DTPU_STATIC_PHASE')
    if env is not None:
        os.environ['DTPU_STATIC_PHASE'] = env
    try:
        grid = Grid(shape=shape, extent=tuple(float(s - 1) for s in shape))
        u = TimeFunction(name='usp', grid=grid, time_order=2,
                         space_order=so)
        u.data[0][tuple(s // 2 for s in shape)] = 1.0
        extra = []
        outs = [u]
        if mixed:
            # a second stepping function with a DIFFERENT slot count
            # (time_order=1 -> m=2): unroll must be lcm(3, 2) = 6
            v = TimeFunction(name='vsp', grid=grid, time_order=1,
                             space_order=so)
            extra = [Eq(v.forward, v + 0.25 * u)]
            outs.append(v)
        op = Operator([Eq(u.forward,
                          solve(u.dt2 - u.laplace, u.forward))] + extra,
                      subs=grid.spacing_map)
        op.apply(time_m=tm, time_M=tm + steps - 1, dt=0.1)
        return [np.array(f.data) for f in outs]
    finally:
        if env is not None:
            if old is None:
                os.environ.pop('DTPU_STATIC_PHASE', None)
            else:
                os.environ['DTPU_STATIC_PHASE'] = old


@pytest.mark.parametrize('steps', [1, 2, 3, 4, 5, 6, 7, 9])
def test_matches_dynamic_path_all_remainders(steps):
    """Macro + remainder: every n mod 3 case reproduces the dynamic
    path bit-for-bit."""
    a = _traj(steps=steps, env='1')
    b = _traj(steps=steps, env='0')
    for x, y in zip(a, b):
        assert np.array_equal(x, y)
        assert np.isfinite(x).all()


@pytest.mark.parametrize('tm', [1, 2, 3])
def test_nonzero_time_m(tm):
    """Slot labels anchor at time_m: a window starting off-phase still
    matches the dynamic path."""
    a = _traj(steps=7, tm=tm, env='1')
    b = _traj(steps=7, tm=tm, env='0')
    assert np.array_equal(a[0], b[0])


def test_mixed_slot_counts_lcm():
    """time_order 2 (m=3) and 1 (m=2) in one operator: unroll = 6."""
    a = _traj(steps=11, env='1', mixed=True)
    b = _traj(steps=11, env='0', mixed=True)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)
        assert np.abs(x).max() > 0


def test_abs_time_access_falls_back():
    """An absolute index into a stepping buffer (u[0, x, y]) needs a
    dynamic slot lookup — the schedule must stay on the stacked path
    and stay correct."""
    grid = Grid(shape=(12, 12), extent=(11., 11.))
    u = TimeFunction(name='uab', grid=grid, time_order=2, space_order=2)
    w = Function(name='wab', grid=grid)
    x, y = grid.dimensions
    u.data[0, 6, 6] = 2.0
    op = Operator([Eq(u.forward, u + 0.1 * u.laplace),
                   Eq(w, u[0, x, y])], subs=grid.spacing_map)
    from devito_tpu.compiler.executor import build_runner  # noqa: F401
    op.apply(time_M=4, dt=0.1)
    assert np.isfinite(np.asarray(w.data)).all()


def test_backward_direction_matches():
    """Backward (adjoint-direction) loops phase-unroll too, anchored at
    time_M."""
    import os

    def run(env):
        old = os.environ.get('DTPU_STATIC_PHASE')
        os.environ['DTPU_STATIC_PHASE'] = env
        try:
            grid = Grid(shape=(16, 16), extent=(15., 15.))
            v = TimeFunction(name='vbk', grid=grid, time_order=2,
                             space_order=4)
            # seed rows 1 and 2 (times 7 and 8 for the t=7 first
            # backward step) so the wave is actually read
            v.data[1][8, 8] = 1.0
            v.data[2][8, 8] = 0.5
            eq = Eq(v.backward, solve(v.dt2 - v.laplace, v.backward))
            op = Operator(eq, subs=grid.spacing_map)
            op.apply(time_m=0, time_M=7, dt=0.1)
            return np.array(v.data)
        finally:
            if old is None:
                os.environ.pop('DTPU_STATIC_PHASE', None)
            else:
                os.environ['DTPU_STATIC_PHASE'] = old

    a, b = run('1'), run('0')
    assert np.array_equal(a, b)
    assert np.abs(a).max() > 0


def test_sparse_inject_interp_in_phase_mode():
    """Source injection + receiver interpolation write/read the right
    slots under phase unrolling (vs the dynamic path)."""
    import os
    from devito_tpu.types.sparse import SparseTimeFunction

    def run(env):
        old = os.environ.get('DTPU_STATIC_PHASE')
        os.environ['DTPU_STATIC_PHASE'] = env
        try:
            grid = Grid(shape=(24, 24), extent=(23., 23.))
            u = TimeFunction(name='usr', grid=grid, time_order=2,
                             space_order=4)
            nt = 11
            src = SparseTimeFunction(name='srcp', grid=grid, npoint=1,
                                     nt=nt, coordinates=[[11.5, 11.5]])
            src.data[:, 0] = np.linspace(0., 1., nt)
            rec = SparseTimeFunction(name='recp', grid=grid, npoint=2,
                                     nt=nt,
                                     coordinates=[[6., 6.], [17., 17.]])
            eq = Eq(u.forward, solve(u.dt2 - 4.0 * u.laplace, u.forward))
            op = Operator([eq] + src.inject(field=u.forward, expr=src)
                          + rec.interpolate(expr=u),
                          subs=grid.spacing_map)
            op.apply(time_M=nt - 2, dt=0.05)
            return np.array(u.data), np.array(rec.data)
        finally:
            if old is None:
                os.environ.pop('DTPU_STATIC_PHASE', None)
            else:
                os.environ['DTPU_STATIC_PHASE'] = old

    (u1, r1), (u0, r0) = run('1'), run('0')
    assert np.abs(r0).max() > 0
    assert np.array_equal(u1, u0)
    assert np.array_equal(r1, r0)


def test_narrow_storage_stays_on_dynamic_path():
    """bf16-storage stepping buffers are ineligible (XLA materializes
    per-tap upcasts of shared slots — measured 5x at 512^3): the
    operator still runs green and matches its own dynamic result."""
    grid = Grid(shape=(20, 20), extent=(19., 19.))
    u = TimeFunction(name='unb', grid=grid, time_order=2, space_order=4)
    u.data[0][10, 10] = 1.0
    op = Operator(Eq(u.forward, solve(u.dt2 - u.laplace, u.forward)),
                  subs=grid.spacing_map,
                  opt=('advanced', {'storage-dtype': 'bfloat16'}))
    # the runner's eligibility hook reports 0 for this schedule
    from devito_tpu.ir.lowering import LoweredEq
    stepping = {it.target.name: it.target._time_size
                for it in op._schedule.body
                if isinstance(it, LoweredEq)
                and it.time_kind == 'stepping'}
    assert stepping  # the wavefield is a stepping buffer
    op.apply(time_M=5, dt=0.1)
    assert np.isfinite(np.asarray(u.data)).all()


def test_reductions_and_subsampled_saves_in_phase_mode():
    """ConditionalDimension snapshot saves and Inc reductions compose
    with phase unrolling (save/cond buffers stay dynamically indexed)."""
    import os
    from devito_tpu import ConditionalDimension, Dimension

    def run(env):
        old = os.environ.get('DTPU_STATIC_PHASE')
        os.environ['DTPU_STATIC_PHASE'] = env
        try:
            grid = Grid(shape=(14, 14), extent=(13., 13.))
            time = grid.time_dim
            tsub = ConditionalDimension('tsb9', parent=time, factor=3)
            u = TimeFunction(name='urd', grid=grid, time_order=2,
                             space_order=2)
            usave = TimeFunction(name='usv9', grid=grid, time_dim=tsub,
                                 save=4)
            s = Function(name='ssum9', shape=(1,),
                         dimensions=(Dimension('i9'),), dtype=np.float64)
            u.data[0, 7, 7] = 1.0
            eq = Eq(u.forward, solve(u.dt2 - u.laplace, u.forward))
            op = Operator([eq, Eq(usave, u), Inc(s, u * u)],
                          subs=grid.spacing_map)
            op.apply(time_M=9, dt=0.1)
            return (np.array(u.data), np.array(usave.data),
                    float(np.asarray(s.data)[0]))
        finally:
            if old is None:
                os.environ.pop('DTPU_STATIC_PHASE', None)
            else:
                os.environ['DTPU_STATIC_PHASE'] = old

    (u1, s1, n1), (u0, s0, n0) = run('1'), run('0')
    assert np.array_equal(u1, u0)
    assert np.array_equal(s1, s0)
    assert n0 > 0 and abs(n1 - n0) / n0 < 1e-12


def test_trace_parser_macro_cadence():
    """parse_trace_period scales macro-body firings (nsteps/L) back to a
    per-step period."""
    import json
    import gzip
    import os
    import sys
    import tempfile
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import parse_trace_period

    nsteps, L, period_us = 63, 3, 900.0
    evs = [{'ph': 'M', 'name': 'process_name', 'pid': 7,
            'args': {'name': '/device:TPU:0'}},
           {'ph': 'M', 'name': 'thread_name', 'pid': 7, 'tid': 3,
            'args': {'name': 'XLA Ops'}}]
    # one macro-body op firing nsteps/L times at L*period gaps
    for j in range(nsteps // L):
        evs.append({'ph': 'X', 'pid': 7, 'tid': 3, 'name': 'fusion.9',
                    'ts': 1000.0 + j * L * period_us, 'dur': 10.0})
    with tempfile.TemporaryDirectory() as td:
        d = os.path.join(td, 'plugins', 'profile', 'run1')
        os.makedirs(d)
        with gzip.open(os.path.join(d, 'x.trace.json.gz'), 'wt') as f:
            json.dump({'traceEvents': evs}, f)
        p = parse_trace_period(td, nsteps)
    assert p is not None
    assert abs(p * 1e6 - period_us) / period_us < 1e-6
