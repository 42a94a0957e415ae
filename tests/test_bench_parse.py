"""bench.py device-trace parsing (the driver's measurement path must
understand both per-step ops and ops inside the rolled chunk loop,
which fire k times per step)."""

import gzip
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from bench import parse_trace_period  # noqa: E402


def _write_trace(tmp_path, events):
    d = tmp_path / 'plugins' / 'profile' / 'run1'
    d.mkdir(parents=True)
    data = {'traceEvents': events}
    with gzip.open(d / 'x.trace.json.gz', 'wt') as f:
        json.dump(data, f)
    return str(tmp_path)


def _meta(pid, tid):
    return [
        {'ph': 'M', 'name': 'process_name', 'pid': pid,
         'args': {'name': '/device:TPU:0'}},
        {'ph': 'M', 'name': 'thread_name', 'pid': pid, 'tid': tid,
         'args': {'name': 'XLA Ops'}},
    ]


def test_parse_per_step_ops(tmp_path):
    """Ops firing once per step: median gap is the step period."""
    nsteps = 32
    period_us = 500.0
    evs = _meta(1, 2)
    for i in range(nsteps):
        evs.append({'ph': 'X', 'pid': 1, 'tid': 2, 'name': 'fusion.1',
                    'ts': 1000.0 + i * period_us, 'dur': 100.0})
    p = parse_trace_period(_write_trace(tmp_path, evs), nsteps)
    assert p == pytest.approx(period_us * 1e-6, rel=1e-6)


def test_parse_rolled_chunk_ops(tmp_path):
    """Ops firing k times per step (the rolled chunk loop): the span
    estimate scales back to a step period."""
    nsteps = 32
    k = 16
    period_us = 800.0
    evs = _meta(1, 2)
    for i in range(nsteps):
        for j in range(k):
            # chunks unevenly spaced inside the step
            evs.append({'ph': 'X', 'pid': 1, 'tid': 2,
                        'name': 'fusion.chunk',
                        'ts': 1000.0 + i * period_us
                        + j * (period_us * 0.8 / k),
                        'dur': 10.0})
    p = parse_trace_period(_write_trace(tmp_path, evs), nsteps)
    # span-based estimate: within a few % of the true period
    assert p == pytest.approx(period_us * 1e-6, rel=0.05)


def test_parse_mixed_tracks_ignores_host(tmp_path):
    """Host-side events (non-device pids) are excluded."""
    nsteps = 20
    evs = _meta(1, 2)
    for i in range(nsteps):
        evs.append({'ph': 'X', 'pid': 1, 'tid': 2, 'name': 'fusion.9',
                    'ts': 50.0 + i * 300.0, 'dur': 10.0})
        # a host pid with misleading cadence
        evs.append({'ph': 'X', 'pid': 7, 'tid': 3, 'name': 'python',
                    'ts': 50.0 + i * 40.0, 'dur': 5.0})
    p = parse_trace_period(_write_trace(tmp_path, evs), nsteps)
    assert p == pytest.approx(300e-6, rel=1e-6)


def test_parse_no_match_returns_none(tmp_path):
    evs = _meta(1, 2)
    evs.append({'ph': 'X', 'pid': 1, 'tid': 2, 'name': 'once',
                'ts': 1.0, 'dur': 1.0})
    assert parse_trace_period(_write_trace(tmp_path, evs), 64) is None


def test_parse_skips_wrong_count_names(tmp_path):
    """Op names whose firing count matches no integer multiple of
    nsteps are excluded from the estimate."""
    nsteps = 32
    evs = _meta(1, 2)
    for i in range(nsteps):
        evs.append({'ph': 'X', 'pid': 1, 'tid': 2, 'name': 'fusion.a',
                    'ts': 10.0 + i * 200.0, 'dur': 5.0})
    # 1.5x nsteps firings: no clean k
    for i in range(nsteps + nsteps // 2):
        evs.append({'ph': 'X', 'pid': 1, 'tid': 2, 'name': 'noise',
                    'ts': 10.0 + i * 777.0, 'dur': 5.0})
    p = parse_trace_period(_write_trace(tmp_path, evs), nsteps)
    assert p == pytest.approx(200e-6, rel=1e-6)


# ----------------------------------------------------------- size ladder

def _fake_ladder(monkeypatch, results):
    """Install a ChildRun stub returning canned rates; returns the list
    of attempted sizes."""
    import bench
    calls = []

    class FakeRun:
        def __init__(self, n, so, autotune=None):
            self.n = n
            self.kind = 'TPU v5 lite'
            self.autotune = autotune
            calls.append(n)

        def run(self, **kw):
            pass

        def rate(self):
            r = results.get(self.n)
            return (None, 'no chunks completed') if r is None else r

        def _wall_naive_or_none(self, rate, note, roof):
            return None, note

    monkeypatch.setattr(bench, 'ChildRun', FakeRun)
    monkeypatch.delenv('BENCH_SIZE', raising=False)
    monkeypatch.setenv('BENCH_TIMEOUT', '460')
    return calls


def test_ladder_headline_first(monkeypatch, capsys):
    """The canonical 512^3 is attempted FIRST (round-4 failure mode:
    the ascending ladder burned its budget on small grids through a
    degraded tunnel and the artifact never reached the headline size);
    the lane-unaligned 200^3 guard runs as a bonus row after."""
    import bench
    calls = _fake_ladder(monkeypatch, {512: (32.4, 'trace'),
                                       200: (29.0, 'trace')})
    bench.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert calls[0] == 512
    assert calls == [512, 200]          # no other size wasted budget
    assert '512^3' in out['note']
    assert out['value'] == 32.4
    assert 'guard 200^3: 29.00' in out['note']


def test_ladder_falls_back_downward(monkeypatch, capsys):
    """If the headline size fails (wedged child), the ladder descends
    and reports the largest size that completed."""
    import bench
    calls = _fake_ladder(monkeypatch, {512: None, 384: None,
                                       256: (31.0, 'trace'),
                                       200: (29.0, 'trace')})
    bench.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert calls[:3] == [512, 384, 256]
    assert '256^3' in out['note']
    assert out['value'] == 31.0


def test_ladder_all_fail(monkeypatch, capsys):
    import bench
    calls = _fake_ladder(monkeypatch, {})
    bench.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out['value'] == 0.0 and out['vs_baseline'] == 0.0
    assert calls == [512, 384, 256, 128]
