"""Device-timeline coverage analysis for a solver run.

Per-category UNION coverage (async ops overlap sync ones on the single
'XLA Ops' track, so plain duration sums double-count — union coverage
per category shows what actually occupies the device).

Usage: python experiments/trace_coverage.py [problem] [n] [so] [steps] [bf16]
"""

import glob
import gzip
import json
import sys
import tempfile
from collections import defaultdict


def main():
    problem = sys.argv[1] if len(sys.argv) > 1 else 'elastic'
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 160
    so = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    nsteps = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    from devito_tpu import configuration
    configuration['profile-dir'] = tempfile.mkdtemp(prefix='cov_')
    opt = 'advanced'
    if len(sys.argv) > 5 and sys.argv[5] == 'bf16':
        opt = ('advanced', {'storage-dtype': 'bfloat16'})

    from devito_tpu.models.seismic import (acoustic_setup, tti_setup,
                                           elastic_setup,
                                           viscoacoustic_setup)
    setups = {'acoustic': acoustic_setup, 'tti': tti_setup,
              'elastic': elastic_setup,
              'viscoacoustic': viscoacoustic_setup}
    kw = dict(shape=(n,) * 3, spacing=(10.,) * 3, tn=500., space_order=so,
              nbl=8, opt=opt)
    if problem != 'acoustic':
        kw['nlayers'] = 2
    solver = setups[problem](**kw)
    solver.forward(time_M=1)
    solver.forward(time_M=nsteps)

    paths = sorted(glob.glob(configuration['profile-dir'] +
                             '/plugins/profile/*/*.trace.json.gz'))
    with gzip.open(paths[-1], 'rt') as f:
        data = json.load(f)
    evs = data['traceEvents']
    dev_pids = {e['pid'] for e in evs
                if e.get('ph') == 'M' and e.get('name') == 'process_name'
                and '/device:' in str(e.get('args', {}).get('name', ''))}
    ops_tids = {e['pid']: e['tid'] for e in evs
                if e.get('ph') == 'M' and e.get('name') == 'thread_name'
                and e.get('args', {}).get('name') == 'XLA Ops'}

    def cat(name, args):
        b = name.split('.')[0]
        if b.endswith('-start') or b.endswith('-done'):
            return 'async-' + b.rsplit('-', 1)[0]
        if b == 'while':
            return None
        tf = str(args.get('tf_op', ''))
        sec = ''
        i = tf.find('dtpu_sec')
        if i >= 0:
            sec = ':' + tf[i:i + 10].split('/')[0]
        return b + sec

    ivs = defaultdict(list)
    for e in evs:
        if e.get('ph') != 'X' or e.get('pid') not in dev_pids or \
                e.get('tid') != ops_tids.get(e.get('pid')) or \
                e.get('dur') is None:
            continue
        c = cat(e['name'], e.get('args') or {})
        if c:
            ivs[c].append((e['ts'], e['ts'] + e['dur']))

    def union(iv):
        iv = sorted(iv)
        tot = 0.0
        cs, ce = None, -1e30
        for s_, e_ in iv:
            if s_ > ce:
                if cs is not None:
                    tot += ce - cs
                cs, ce = s_, e_
            else:
                ce = max(ce, e_)
        if cs is not None:
            tot += ce - cs
        return tot

    allt = [p for v in ivs.values() for p in v]
    print(f"span union {union(allt) / 1e3:.1f} ms over {nsteps + 1} steps "
          f"= {union(allt) / 1e3 / (nsteps + 1):.2f} ms/step")
    for k in sorted(ivs, key=lambda k: -union(ivs[k]))[:24]:
        u = union(ivs[k])
        if u < 500:
            break
        print(f"  {k:44s} {u / 1e3:8.1f} ms "
              f"({u / 1e3 / (nsteps + 1):6.3f} ms/step) n={len(ivs[k])}")


if __name__ == '__main__':
    main()
