"""Measured per-section profiling (configuration['profiling'] =
'measured'): device-op-timeline parsing and category attribution
(reference analog: per-Section C timers, passes/iet/instrument.py:16).
"""

import gzip
import json
import os

import numpy as np
import pytest

from devito_tpu import (Grid, TimeFunction, Eq, Operator, solve,
                        configuration, switchconfig)
from devito_tpu.operator.trace_profile import (device_op_durations,
                                               categorize_ops)


def _write_trace(tmp_path, events):
    d = tmp_path / 'plugins' / 'profile' / '2026_01_01'
    d.mkdir(parents=True)
    payload = {'traceEvents': events}
    with gzip.open(d / 'host.trace.json.gz', 'wt') as f:
        json.dump(payload, f)
    return str(tmp_path)


class TestParser:

    def test_device_ops_categorized(self, tmp_path):
        evs = [
            {'ph': 'M', 'name': 'process_name', 'pid': 3,
             'args': {'name': '/device:TPU:0'}},
            {'ph': 'M', 'name': 'thread_name', 'pid': 3, 'tid': 7,
             'args': {'name': 'XLA Ops'}},
            {'ph': 'M', 'name': 'process_name', 'pid': 9,
             'args': {'name': '/host:CPU'}},
            # device ops (us)
            {'ph': 'X', 'pid': 3, 'tid': 7, 'name': 'fusion.12',
             'ts': 0, 'dur': 100.0},
            {'ph': 'X', 'pid': 3, 'tid': 7, 'name': 'fusion.12',
             'ts': 200, 'dur': 100.0},
            {'ph': 'X', 'pid': 3, 'tid': 7, 'name': 'gather.3',
             'ts': 300, 'dur': 50.0},
            {'ph': 'X', 'pid': 3, 'tid': 7, 'name': 'scatter.1',
             'ts': 400, 'dur': 25.0},
            {'ph': 'X', 'pid': 3, 'tid': 7,
             'name': 'dynamic-update-slice.4', 'ts': 500, 'dur': 10.0},
            {'ph': 'X', 'pid': 3, 'tid': 7,
             'name': 'collective-permute.2', 'ts': 600, 'dur': 5.0},
            # host event: must be ignored
            {'ph': 'X', 'pid': 9, 'tid': 1, 'name': 'PjitFunction(f)',
             'ts': 0, 'dur': 9999.0},
        ]
        durs = device_op_durations(_write_trace(tmp_path, evs))
        assert durs['fusion.12'] == pytest.approx(200e-6)
        assert 'PjitFunction(f)' not in durs
        cats = categorize_ops(durs)
        assert cats['fusion'] == pytest.approx(200e-6)
        assert cats['gather'] == pytest.approx(50e-6)
        assert cats['scatter'] == pytest.approx(25e-6)
        assert cats['update-slice'] == pytest.approx(10e-6)
        assert cats['collective'] == pytest.approx(5e-6)

    def test_no_trace_returns_none(self, tmp_path):
        assert device_op_durations(str(tmp_path)) is None

    def test_no_device_events_returns_none(self, tmp_path):
        evs = [{'ph': 'M', 'name': 'process_name', 'pid': 9,
                'args': {'name': '/host:CPU'}},
               {'ph': 'X', 'pid': 9, 'tid': 1, 'name': 'x',
                'ts': 0, 'dur': 1.0}]
        assert device_op_durations(_write_trace(tmp_path, evs)) is None


class TestMeasuredMode:

    def test_cpu_falls_back_to_modeled(self):
        # the CPU backend records no device op timeline: measured mode
        # must degrade gracefully to the cost-model apportioning
        grid = Grid(shape=(32, 32), extent=(1., 1.))
        u = TimeFunction(name='u', grid=grid, space_order=2)
        u.data[0] = 1.0
        eq = Eq(u.forward, solve(Eq(u.dt, 0.1 * u.laplace), u.forward))
        op = Operator([eq])
        with switchconfig(profiling='measured'):
            summary = op.apply(time_M=4, dt=1e-5)
        assert 'section0' in summary
        assert summary['section0'].time > 0

    def test_measured_attribution_from_synthetic_sections(self):
        # attribution: each section gets its dtpu_secN scope's measured
        # busy time; out-of-section time spreads by cost-model share
        from devito_tpu.types.sparse import SparseTimeFunction
        grid = Grid(shape=(32, 32), extent=(310., 310.))
        u = TimeFunction(name='u', grid=grid, time_order=2,
                         space_order=2)
        rec = SparseTimeFunction(name='rec', grid=grid, npoint=4, nt=6)
        rec.coordinates.data[:] = [[50., 50.], [100., 100.],
                                   [150., 150.], [200., 200.]]
        eq = Eq(u.forward, solve(Eq(u.dt2, 4.0 * u.laplace), u.forward))
        op = Operator([eq, rec.interpolate(expr=u)])
        op.apply(time_m=1, time_M=4, dt=0.5)
        from devito_tpu.operator.profiling import PerformanceSummary
        op._measured_secs = {'dtpu_sec0': 0.3, 'dtpu_sec1': 0.6}
        op._measured_other = 0.1
        summary = PerformanceSummary()
        op._add_sections(summary, elapsed=1.1, nsteps=4)
        by_label = {summary.labels[k]: v.time for k, v in summary.items()}
        assert by_label['interp:rec'] > 0.6  # its scope + other share
        assert by_label['u'] > 0.3
        assert sum(v.time for v in summary.values()) == pytest.approx(1.0)

    def test_named_scopes_reach_the_jaxpr(self):
        # the executor must tag each schedule item with its dtpu_secN
        # scope so measured attribution works (scopes flow to HLO
        # metadata; on the CPU backend we check the lowered text)
        grid = Grid(shape=(16, 16), extent=(1., 1.))
        u = TimeFunction(name='u', grid=grid, space_order=2)
        eq = Eq(u.forward, solve(Eq(u.dt, 0.1 * u.laplace), u.forward))
        op = Operator([eq])
        wbufs, rbufs, params, tm, tM, _ = op._prepare(
            {'dt': 1e-5, 'time_M': 2})
        compiled, _ = op._compiled(wbufs, rbufs, params,
                                   np.int32(0), np.int32(2))
        assert 'dtpu_sec0' in compiled.as_text()
