#!/usr/bin/env python
"""Benchmark CLI.

Reference parity: benchmarks/user/benchmark.py — `run`/`test` commands over
the seismic problem suite:

    python benchmarks/benchmark.py run -P acoustic -d 512 512 512 -so 12 \
        -t 100 [--dump-norms]
    python benchmarks/benchmark.py test -P tti -d 64 64 64 -so 8

Problems: acoustic | tti | elastic | viscoacoustic. Prints per-run wall
time, GPts/s and GFlops/s (summary from the operator profiler).
"""

import argparse
import json
import sys
import time

import numpy as np


def get_solver(problem, shape, space_order, tn, **kwargs):
    from devito_tpu.models.seismic import (acoustic_setup, tti_setup,
                                           elastic_setup,
                                           viscoacoustic_setup)
    spacing = tuple(10. for _ in shape)
    setups = {'acoustic': acoustic_setup, 'tti': tti_setup,
              'elastic': elastic_setup, 'viscoacoustic': viscoacoustic_setup}
    setup = setups[problem]
    return setup(shape=tuple(shape), spacing=spacing, tn=tn,
                 space_order=space_order, nbl=10, **kwargs)


def run(args):
    solver = get_solver(args.problem, args.shape, args.space_order, args.tn)
    # warmup (jit)
    out = solver.forward()
    summary = out[-1]
    t0 = time.perf_counter()
    out = solver.forward()
    elapsed = time.perf_counter() - t0
    summary = out[-1]
    entry = summary.globals['fdlike']
    result = {
        'problem': args.problem,
        'shape': list(args.shape),
        'space_order': args.space_order,
        'tn': args.tn,
        'time': round(elapsed, 4),
        'gpointss': round(entry.gpointss, 3),
        'gflopss': round(entry.gflopss, 3),
        'oi': round(entry.oi, 3),
    }
    if args.dump_norms:
        rec = out[0]
        result['rec_norm'] = float(np.linalg.norm(np.asarray(rec.data)))
    print(json.dumps(result))
    return result


def test(args):
    solver = get_solver(args.problem, args.shape, args.space_order, args.tn)
    out = solver.forward()
    rec = out[0]
    assert np.isfinite(np.asarray(rec.data)).all(), "nonfinite output"
    print(f"OK {args.problem} {args.shape} so={args.space_order}: "
          f"rec norm {np.linalg.norm(np.asarray(rec.data)):.4f}")


def main(argv=None):
    parser = argparse.ArgumentParser(prog='benchmark.py')
    sub = parser.add_subparsers(dest='cmd', required=True)
    for name, fn in (('run', run), ('test', test)):
        p = sub.add_parser(name)
        p.add_argument('-P', '--problem', required=True,
                       choices=['acoustic', 'tti', 'elastic',
                                'viscoacoustic'])
        p.add_argument('-d', '--shape', type=int, nargs='+',
                       default=[50, 50, 50])
        p.add_argument('-so', '--space-order', type=int, default=4)
        p.add_argument('-t', '--tn', type=float, default=250.)
        p.add_argument('--dump-norms', action='store_true')
        p.set_defaults(func=fn)
    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == '__main__':
    main()
