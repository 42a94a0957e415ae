#!/usr/bin/env python
"""Benchmark CLI.

Reference parity: benchmarks/user/benchmark.py:105-389 — the
`run` / `test` / `bench` command surface over the seismic problem suite:

    python benchmarks/benchmark.py run -P acoustic -d 512 512 512 -so 12 \
        -t 100 -a basic [--reps 3] [--dump-norms] [--dump-summary out.json]
    python benchmarks/benchmark.py test -P tti -d 64 64 64 -so 8
    python benchmarks/benchmark.py bench -P acoustic -d 512 512 512 -so 8 \
        --nsteps 64

- ``run``: wall-clock timed forward solves (post-jit, best of ``--reps``)
  with the profiler summary (GPts/s, GFlops/s, OI per section + global).
- ``test``: correctness gate — finite outputs, plus the forward/adjoint
  dot-product residual for the self-adjoint-capable problems (reference:
  benchmark.py `test` runs forward+adjoint and asserts norms).
- ``bench``: device-side steady-state step time from the profiler trace
  (the reference's `run-jit-backdoor` analog: measure the kernel, not
  the Python driver — through the remote-TPU tunnel wall clocks include
  RPC noise, bench.py module docstring).

Problems: acoustic | tti | elastic | viscoacoustic. Knobs mirror the
reference CLI where meaningful on TPU: ``-a/--autotune``
(off|basic|aggressive — reference `-a aggressive`), ``--opt``
(advanced|noop — the `-dse/-dle` analog collapsed to one switch),
``--storage-dtype`` (bfloat16|float16 narrow wavefield storage),
``--dtype`` (float32|float64), ``--nbl`` (absorbing-layer width).
"""

import argparse
import json
import sys
import time

import numpy as np


def get_solver(args):
    from devito_tpu.models.seismic import (acoustic_setup, tti_setup,
                                           elastic_setup,
                                           viscoacoustic_setup)
    shape = tuple(args.shape)
    spacing = tuple(10. for _ in shape)
    setups = {'acoustic': acoustic_setup, 'tti': tti_setup,
              'elastic': elastic_setup, 'viscoacoustic': viscoacoustic_setup}
    setup = setups[args.problem]
    opt = args.opt
    if args.storage_dtype:
        opt = (opt, {'storage-dtype': args.storage_dtype})
    dtype = {'float32': np.float32, 'float64': np.float64}[args.dtype]
    return setup(shape=shape, spacing=spacing, tn=args.tn,
                 space_order=args.space_order, nbl=args.nbl, opt=opt,
                 dtype=dtype)


def _forward(solver, autotune=None):
    kw = {}
    if autotune and autotune != 'off':
        kw['autotune'] = autotune
    return solver.forward(**kw)


def run(args):
    solver = get_solver(args)
    out = _forward(solver, args.autotune)  # warmup: jit (+ autotune)
    best, summary = None, out[-1]
    for _ in range(max(1, args.reps)):
        t0 = time.perf_counter()
        out = solver.forward()
        elapsed = time.perf_counter() - t0
        if best is None or elapsed < best:
            best, summary = elapsed, out[-1]
    entry = summary.globals['fdlike']
    result = {
        'problem': args.problem,
        'shape': list(args.shape),
        'space_order': args.space_order,
        'tn': args.tn,
        'autotune': args.autotune,
        'time': round(best, 4),
        'gpointss': round(entry.gpointss, 3),
        'gflopss': round(entry.gflopss, 3),
        'oi': round(entry.oi, 3),
        'sections': {k: {'time': round(v.time, 4),
                         'gpointss': round(v.gpointss, 3)}
                     for k, v in summary.items()},
    }
    if args.dump_norms:
        rec = out[0]
        result['rec_norm'] = float(np.linalg.norm(np.asarray(rec.data)))
    if args.dump_summary:
        with open(args.dump_summary, 'w') as f:
            json.dump(result, f, indent=2)
    print(json.dumps(result))
    return result


def test(args):
    from devito_tpu.builtins import inner, norm
    solver = get_solver(args)
    out = _forward(solver)
    rec = out[0]
    assert np.isfinite(np.asarray(rec.data)).all(), "nonfinite output"
    msg = (f"OK {args.problem} {args.shape} so={args.space_order}: "
           f"rec norm {np.linalg.norm(np.asarray(rec.data)):.4f}")
    if args.problem in ('acoustic', 'tti') and args.dtype == 'float64':
        # forward/adjoint dot-product gate at the reference tolerance
        # class (tests/test_adjoint.py; benchmark.py `test` asserts
        # forward+adjoint norms)
        srca = solver.geometry.new_src(name='srca_cli', src_type=None)
        if args.problem == 'acoustic':
            solver.adjoint(rec=rec, srca=srca)
        else:
            solver.adjoint(rec=rec, srca=srca)
        term1 = inner(srca, solver.geometry.src)
        term2 = norm(rec) ** 2
        resid = abs((term1 - term2) / term1)
        assert resid < 1e-10, (term1, term2, resid)
        msg += f", adjoint dot-product residual {resid:.2e}"
    print(msg)
    return 0


def bench(args):
    import shutil
    import tempfile
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    import jax.profiler
    from bench import parse_trace_period

    solver = get_solver(args)
    _forward(solver, args.autotune)  # warmup
    n = args.nsteps
    tdir = tempfile.mkdtemp(prefix='cli_bench_')
    try:
        with jax.profiler.trace(tdir):
            out = solver.forward(time_M=n - 1)
            u = out[1]
            np.asarray(u.data[1]).ravel()[0]  # completion fence
        period = parse_trace_period(tdir, n)
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
    pts = int(np.prod(args.shape))
    result = {'problem': args.problem, 'shape': list(args.shape),
              'space_order': args.space_order, 'nsteps': n,
              'ms_per_step': None if not period else round(period * 1e3, 4),
              'gpointss': None if not period else round(pts / period / 1e9,
                                                        3)}
    print(json.dumps(result))
    return result


def main(argv=None):
    parser = argparse.ArgumentParser(prog='benchmark.py')
    sub = parser.add_subparsers(dest='cmd', required=True)
    for name, fn in (('run', run), ('test', test), ('bench', bench)):
        p = sub.add_parser(name)
        p.add_argument('-P', '--problem', required=True,
                       choices=['acoustic', 'tti', 'elastic',
                                'viscoacoustic'])
        p.add_argument('-d', '--shape', type=int, nargs='+',
                       default=[50, 50, 50])
        p.add_argument('-so', '--space-order', type=int, default=4)
        p.add_argument('-t', '--tn', type=float, default=250.)
        p.add_argument('-a', '--autotune', default='off',
                       choices=['off', 'basic', 'aggressive'])
        p.add_argument('--opt', default='advanced',
                       choices=['advanced', 'noop'])
        p.add_argument('--storage-dtype', default=None,
                       choices=[None, 'bfloat16', 'float16'])
        p.add_argument('--dtype', default='float32',
                       choices=['float32', 'float64'])
        p.add_argument('--nbl', type=int, default=10)
        p.add_argument('--reps', type=int, default=1)
        p.add_argument('--nsteps', type=int, default=32)
        p.add_argument('--dump-norms', action='store_true')
        p.add_argument('--dump-summary', default=None)
        p.set_defaults(func=fn)
    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == '__main__':
    main()
