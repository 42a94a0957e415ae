"""Benchmark CLI smoke tests (reference: tests/test_benchmark.py runs
the benchmark driver's modes over tiny problems)."""

import json

import numpy as np
import pytest


def _main(argv):
    import importlib.util
    import os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'benchmarks', 'benchmark.py')
    spec = importlib.util.spec_from_file_location('benchmark_cli', path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.main(argv)


def test_run_mode(capsys):
    res = _main(['run', '-P', 'acoustic', '-d', '24', '24', '-so', '4',
                 '-t', '60', '--reps', '2', '--dump-norms'])
    assert res['gpointss'] > 0 and res['time'] > 0
    assert res['rec_norm'] > 0
    assert res['sections']
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line)['problem'] == 'acoustic'


def test_run_dump_summary(tmp_path):
    out = tmp_path / 's.json'
    _main(['run', '-P', 'elastic', '-d', '20', '20', '-so', '4',
           '-t', '40', '--dump-summary', str(out)])
    data = json.loads(out.read_text())
    assert data['problem'] == 'elastic' and data['gflopss'] > 0


def test_test_mode_adjoint_gate(capsys):
    _main(['test', '-P', 'acoustic', '-d', '24', '24', '-so', '4',
           '-t', '60', '--dtype', 'float64'])
    msg = capsys.readouterr().out
    assert 'OK acoustic' in msg
    assert 'adjoint dot-product residual' in msg


def test_test_mode_tti(capsys):
    _main(['test', '-P', 'tti', '-d', '20', '20', '-so', '4', '-t', '40'])
    assert 'OK tti' in capsys.readouterr().out


def test_storage_dtype_knob():
    res = _main(['run', '-P', 'acoustic', '-d', '24', '24', '-so', '4',
                 '-t', '40', '--storage-dtype', 'bfloat16'])
    assert res['gpointss'] > 0


def test_bench_mode_cpu():
    # on the CPU backend the trace has no device timeline: the mode must
    # degrade gracefully (None rate), not crash
    res = _main(['bench', '-P', 'acoustic', '-d', '20', '20', '-so', '4',
                 '-t', '60', '--nsteps', '16'])
    assert res['nsteps'] == 16
    assert res['ms_per_step'] is None or res['ms_per_step'] > 0
