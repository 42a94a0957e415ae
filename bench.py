#!/usr/bin/env python
"""Headline benchmark: 3-D acoustic SO=8 forward modeling, GPts/s per chip
(flagship config: fp32, phase-unrolled static-slot runner).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology mirrors the reference (FAQ.md:826): GPts/s = grid points x
timesteps / wall seconds, steady-state (post-jit) timing. ``vs_baseline``
is the achieved fraction of the BASELINE.md target (80% of the per-chip
HBM-bandwidth roofline for this stencil).

Resilience architecture (the remote-TPU tunnel can degrade to hundreds of
seconds per RPC, which zeroed round 1's number): the measurement runs in a
child process that emits one JSON line per timed event; the parent
enforces per-line deadlines (each event can extend the next deadline),
kills a wedged child, and falls back to smaller grids.

Two measurement modes, tried in order:
1. *Device-side trace*: run K steps under ``jax.profiler.trace`` and read
   the per-step period straight from the device timeline (median gap
   between successive firings of the per-step XLA ops). This matches the
   reference's section-time methodology (FAQ.md:826 — kernel time, not
   Python setup) and is immune to tunnel latency: probes show the
   degraded tunnel acks dispatch instantly but takes 100-200 s per
   device->host fetch, while ``block_until_ready``/``is_ready`` do NOT
   wait through the tunnel, so wall-clock timing needs one fetch per
   sample and drowns in fetch-latency noise.
2. *Wall-clock pairs* (healthy tunnel only, fetch < 5 s): chunks in
   (small, large) step-count pairs; steady-state rate from the difference
   (K2-K1)*N^3/(t2-t1), cancelling fixed per-RPC overhead. End-to-end
   corroboration of the trace number.
"""

import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

METRIC = "acoustic3d_so8_forward_gpts_per_chip"


def roofline_gpts(device_kind, bytes_per_point):
    """HBM-bandwidth roofline in GPts/s for a memory-bound stencil
    (delegates to the platform registry, devito_tpu/arch.py)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from devito_tpu.arch import roofline_gpts as _r
    return _r(device_kind, bytes_per_point)


# ---------------------------------------------------------------- child

def parse_trace_period(trace_dir, nsteps):
    """Per-step device time (seconds) from a jax.profiler trace dir.

    Finds the device-side 'XLA Ops' track, groups complete events by op
    name, and for the names that fired ~nsteps times takes the median gap
    between successive firings — the steady-state step period, measured
    with device timestamps."""
    import glob
    import gzip

    paths = sorted(glob.glob(os.path.join(
        trace_dir, 'plugins', 'profile', '*', '*.trace.json.gz')))
    if not paths:
        return None
    with gzip.open(paths[-1], 'rt') as f:
        data = json.load(f)
    evs = data.get('traceEvents', [])
    dev_pids = set()
    ops_tids = {}
    for e in evs:
        if e.get('ph') == 'M' and e.get('name') == 'process_name' and \
                '/device:' in str(e.get('args', {}).get('name', '')):
            dev_pids.add(e.get('pid'))
        if e.get('ph') == 'M' and e.get('name') == 'thread_name' and \
                e.get('args', {}).get('name') == 'XLA Ops':
            ops_tids[e.get('pid')] = e.get('tid')
    by_name = {}
    for e in evs:
        if e.get('ph') != 'X' or e.get('pid') not in dev_pids:
            continue
        if ops_tids.get(e.get('pid')) not in (None, e.get('tid')):
            continue
        by_name.setdefault(e.get('name'), []).append(float(e['ts']))
    periods = []
    for name, ts in by_name.items():
        m = len(ts)
        if m < 9:
            continue
        ts = sorted(ts)
        # per-step ops fire once per loop iteration; ops inside a rolled
        # chunk loop (executor._exec_chunks_rolled) fire k times per step
        # — infer k and scale the average firing gap back to a step
        # period (span-based: robust to uneven intra-step spacing).
        # Under phase-unrolled execution (executor build_runner) the
        # macro body fires once per L sub-steps: firings at nsteps/L
        # are scaled the other way (gap / L).
        k = max(1, round(m / nsteps))
        # k=1 keeps a wide band (truncated traces); k>=2 must sit within
        # 10% of an exact multiple or the bands overlap (48 firings at
        # nsteps=32 is 1.5x — neither k=1 nor k=2, excluded)
        lo, hi = (0.7, 1.3) if k == 1 else (0.9, 1.1)
        if lo * k * nsteps <= m <= hi * k * nsteps + 2:
            if k == 1:
                periods.append(float(np.median(np.diff(ts))))
            else:
                periods.append(float(ts[-1] - ts[0]) / (m - 1) * k)
            continue
        L = round(nsteps / m)
        if L >= 2 and abs(m * L - nsteps) <= L + 2:
            periods.append(float(np.median(np.diff(ts))) / L)
    if not periods:
        return None
    # several per-step ops all measure the same period; use their median
    return float(np.median(periods)) * 1e-6


def child_main(n, so, autotune=None):
    """Run the measurement, one JSON line per event on stdout."""
    def emit(**kw):
        print(json.dumps(kw), flush=True)

    import jax
    from devito_tpu import configuration
    configuration['backend'] = os.environ.get('BENCH_BACKEND', 'xla')
    from devito_tpu import Grid, TimeFunction, Function, Eq, Operator, solve

    dev = jax.devices()[0]
    kind = getattr(dev, 'device_kind', str(dev))
    emit(event='devices', kind=kind)

    shape = (n, n, n)
    grid = Grid(shape=shape, extent=tuple(float(s - 1) * 10 for s in shape),
                dtype=np.float32)
    u = TimeFunction(name='u', grid=grid, time_order=2, space_order=so)
    vp = Function(name='vp', grid=grid, space_order=so)
    damp = Function(name='damp', grid=grid, space_order=so)
    vp.data[:] = 1.5
    damp.data[:] = 0.0
    m = 1 / (vp * vp)
    stencil = solve(m * u.dt2 - u.laplace + damp * u.dt, u.forward)

    # two configurations. The flagship is plain fp32: the phase-unrolled
    # static-slot runner (executor build_runner) runs it faster than the
    # bf16-storage mode, whose narrow slots XLA refuses to tap-fuse
    # (round-5 measurement: fp32 34.0 vs bf16 32.5 GPts/s at 512^3).
    # bf16 storage (fp32 compute, half HBM residency) stays as the
    # secondary row. BENCH_STORAGE=off measures fp32 only.
    sdt = os.environ.get('BENCH_STORAGE', 'bfloat16')
    cfgs = [('fp32', 'advanced')]
    if sdt and sdt != 'off':
        cfgs.append(('bf16_storage', ('advanced', {
            'storage-dtype': sdt,
            'storage-dtype-scope': os.environ.get('BENCH_STORAGE_SCOPE',
                                                  'fields')})))
    ops = [(cname, Operator(Eq(u.forward, stencil), subs=grid.spacing_map,
                            name='BenchForward', opt=copt))
           for cname, copt in cfgs]
    dt = 0.6 * 10.0 / 1.5 / (3 ** 0.5) / 4  # safely below CFL

    def sync():
        # force a real device->host fetch: through the remote tunnel,
        # block_until_ready alone does not guarantee execution completed
        return float(np.asarray(u._device_array()[0, n // 2, n // 2, n // 2]))

    tiles = os.environ.get('BENCH_TILES')
    if tiles:
        from devito_tpu.compiler.executor import _load_pallas
        _load_pallas().set_tile_override(
            tuple(int(v) for v in tiles.split(',')))

    # heartbeat: the tunnel sporadically stalls a single fetch for
    # 100-200 s while the child is otherwise healthy; emit liveness
    # lines so the parent keeps waiting (its per-size budget still
    # bounds a genuinely wedged child)
    def heartbeat():
        while True:
            time.sleep(20)
            emit(event='hb', ndl=60)
    threading.Thread(target=heartbeat, daemon=True).start()

    # warmup: jit compile + 2 steps, dispatch only (no sync: through a
    # degraded tunnel a single fetch costs 100-200 s; the trace phase's
    # one fetch below syncs the warmup too)
    at = autotune or os.environ.get('BENCH_AUTOTUNE')
    t0 = time.perf_counter()
    ops[0][1].apply(time_m=0, time_M=1, dt=dt,
                    autotune=at if at else None)
    emit(event='ready', warmup_secs=round(time.perf_counter() - t0, 3),
         ndl=400)

    # phase 1: device-side trace measurement (one fetch per config).
    # Each config's fetch can cost 100-350 s through a degraded tunnel;
    # once the FIRST (flagship) config's fetch shows degradation, the
    # remaining configs are skipped — banking the headline number costs
    # exactly one fetch, so the canonical size survives a slow tunnel
    # (round-4 failure mode: the artifact never reached 512^3)
    import shutil
    import tempfile
    ktrace = int(os.environ.get('BENCH_KTRACE', 64))
    trace_rate = None
    fetch_secs = None
    if not os.environ.get('BENCH_NO_TRACE'):
        import jax.profiler
        for ci, (cname, cop) in enumerate(ops):
            if ci > 0 and fetch_secs is not None and fetch_secs > 5.0:
                emit(event='cfg_skipped', cfg=cname,
                     reason=f'tunnel degraded (fetch {fetch_secs:.0f}s)',
                     ndl=60)
                continue
            tdir = tempfile.mkdtemp(prefix='bench_trace_')
            try:
                if ci > 0:
                    cop.apply(time_m=0, time_M=1, dt=dt)  # compile
                with jax.profiler.trace(tdir):
                    cop.apply(time_m=0, time_M=ktrace - 1, dt=dt)
                    t0 = time.perf_counter()
                    sync()
                    fs = time.perf_counter() - t0
                period = parse_trace_period(tdir, ktrace)
                if period and period > 0:
                    rate = float(n) ** 3 / period / 1e9
                    emit(event='trace', cfg=cname, gpts=rate,
                         ms_per_step=period * 1e3,
                         fetch_secs=round(fs, 2), ndl=400)
                    if ci == 0:
                        trace_rate, fetch_secs = rate, fs
                else:
                    emit(event='trace_failed', cfg=cname,
                         fetch_secs=round(fs or 0, 2), ndl=400)
                    if ci == 0:
                        fetch_secs = fs
            except Exception as exc:  # pragma: no cover - tunnel flake
                emit(event='trace_failed', cfg=cname,
                     error=str(exc)[:200], ndl=400)
            finally:
                shutil.rmtree(tdir, ignore_errors=True)
    op = ops[0][1]  # wall-clock phase times the flagship config

    # phase 2: wall-clock pair chunks — end-to-end corroboration; only
    # worth the fetches when the tunnel is healthy (or the trace failed)
    degraded = fetch_secs is not None and fetch_secs > 5.0
    if degraded and trace_rate is not None:
        emit(event='done')
        return
    k1 = int(os.environ.get('BENCH_K1', 64))
    k2 = int(os.environ.get('BENCH_K2', 320))
    pairs = int(os.environ.get('BENCH_PAIRS', 10))
    if degraded:
        pairs = min(pairs, 2)  # each chunk costs a 100-200 s fetch
    for i in range(pairs):
        for k in (k1, k2):
            t0 = time.perf_counter()
            op.apply(time_m=0, time_M=k - 1, dt=dt)
            sync()
            emit(event='chunk', i=i, steps=k,
                 secs=time.perf_counter() - t0, ndl=400 if degraded else None)
    emit(event='done')


# --------------------------------------------------------------- parent

class ChildRun:
    """Launch the child for grid size `n`; collect chunk lines with
    per-line deadlines; estimate the steady-state rate."""

    def __init__(self, n, so, autotune=None):
        self.n = n
        self.so = so
        self.autotune = autotune
        self.kind = None
        self.chunks = []          # (steps, secs)
        self.trace_rate = None    # device-side GPts/s from the profiler
        self.trace_ms = None
        self.trace_cfg = None
        self.alt = {}             # other configs: cfg -> (gpts, ms)
        self.fetch_secs = None
        self.done = False

    def run(self, ready_deadline, line_deadline, global_deadline,
            size_deadline=None):
        import queue
        if size_deadline is None:
            size_deadline = global_deadline
        q = queue.Queue()
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             '--child', str(self.n), str(self.so)]
            + ([self.autotune] if self.autotune else []),
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)

        def reader():
            for line in proc.stdout:
                q.put(line)
            q.put(None)

        threading.Thread(target=reader, daemon=True).start()
        deadline = min(time.monotonic() + ready_deadline, size_deadline,
                       global_deadline)
        try:
            while True:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    return
                try:
                    line = q.get(timeout=min(timeout, 5.0))
                except queue.Empty:
                    continue
                if line is None:
                    return
                try:
                    msg = json.loads(line)
                except ValueError:
                    continue
                ev = msg.get('event')
                if ev == 'devices':
                    self.kind = msg.get('kind')
                elif ev == 'ready':
                    print(f"[bench] n={self.n} ready "
                          f"(warmup {msg.get('warmup_secs')}s)",
                          file=sys.stderr, flush=True)
                elif ev == 'trace':
                    cfg = msg.get('cfg')
                    if self.trace_rate is None:
                        self.trace_rate = msg.get('gpts')
                        self.trace_ms = msg.get('ms_per_step')
                        self.trace_cfg = cfg
                        self.fetch_secs = msg.get('fetch_secs')
                    else:
                        self.alt[cfg] = (msg.get('gpts'),
                                         msg.get('ms_per_step'))
                    print(f"[bench] n={self.n} trace[{cfg}]: "
                          f"{msg.get('ms_per_step'):.3f} ms/step "
                          f"({msg.get('gpts'):.2f} GPts/s), "
                          f"fetch {msg.get('fetch_secs')}s",
                          file=sys.stderr, flush=True)
                elif ev == 'trace_failed':
                    self.fetch_secs = msg.get('fetch_secs')
                    print(f"[bench] n={self.n} trace failed: "
                          f"{msg.get('error', '')}",
                          file=sys.stderr, flush=True)
                elif ev == 'chunk':
                    self.chunks.append((msg['steps'], msg['secs']))
                elif ev == 'done':
                    self.done = True
                    return
                # events can extend the next deadline (e.g. before a
                # phase whose one fetch may take 100-200 s degraded);
                # heartbeats keep a healthy-but-stalled child alive, but
                # never past the per-size budget
                ndl = msg.get('ndl') or line_deadline
                deadline = min(time.monotonic() + float(ndl),
                               size_deadline, global_deadline)
        finally:
            try:
                proc.kill()
                proc.wait(timeout=5)
            except Exception:
                pass

    def rate(self):
        """Preferred estimate: the device-side trace rate (the analog of
        the reference's per-section kernel time, FAQ.md:826), corroborated
        by the wall-clock pair estimate when the tunnel allowed one.
        Falls back to wall-clock pairs, then the naive cumulative rate."""
        if self.trace_rate is not None:
            note = (f'device-side {self.trace_ms:.3f} ms/step via '
                    f'profiler trace')
            if self.trace_cfg:
                note = f'{self.trace_cfg} (fp32 compute), ' + note
            for cfg, (g, ms) in self.alt.items():
                note += f'; {cfg}: {g:.2f} GPts/s ({ms:.3f} ms/step)'
            wall, _ = self._wall_rate()
            if wall is not None:
                note += f'; wall-clock pair estimate {wall:.2f} GPts/s'
            elif self.fetch_secs and self.fetch_secs > 5:
                note += (f'; tunnel degraded (fetch {self.fetch_secs}s), '
                         f'no wall-clock corroboration')
            return float(self.trace_rate), note
        return self._wall_rate()

    def _wall_naive_or_none(self, rate, note, roof):
        """Demote an implausible (> roofline) estimate to the naive
        cumulative rate, or drop it."""
        if not self.chunks:
            return None, note
        vol = float(self.n) ** 3
        tot_steps = sum(s for s, _ in self.chunks)
        tot_secs = sum(t for _, t in self.chunks)
        naive = tot_steps * vol / tot_secs / 1e9
        return naive, (f'estimate {rate:.1f} GPts/s exceeded roofline '
                       f'{roof:.1f} (tunnel noise); naive rate over '
                       f'{len(self.chunks)} chunks incl. RPC overhead')

    def _wall_rate(self):
        """Median pair-differenced GPts/s, or the naive cumulative rate
        if fewer than 2 valid pairs completed. None if no chunks."""
        if not self.chunks:
            return None, 'no chunks completed'
        vol = float(self.n) ** 3
        ests = []
        by_small = None
        for steps, secs in self.chunks:
            if by_small is None:
                by_small = (steps, secs)
                continue
            s1, t1 = by_small
            by_small = None
            if steps == s1 or secs <= t1:
                continue
            ests.append((steps - s1) * vol / (secs - t1) / 1e9)
        ests = [e for e in ests if np.isfinite(e) and e > 0]
        if len(ests) >= 2:
            return float(np.median(ests)), f'{len(ests)} pair estimates'
        tot_steps = sum(s for s, _ in self.chunks)
        tot_secs = sum(t for _, t in self.chunks)
        return (tot_steps * vol / tot_secs / 1e9,
                f'naive rate over {len(self.chunks)} chunks '
                f'(incl. per-RPC overhead)')


def main():
    budget = float(os.environ.get('BENCH_TIMEOUT', 460))
    global_deadline = time.monotonic() + budget
    so = int(os.environ.get('BENCH_SO', 8))
    forced = os.environ.get('BENCH_SIZE')
    # HEADLINE-FIRST descent (round-5 redesign): try the canonical
    # 512^3 (reference benchmarks/user/README.md:169) immediately —
    # banking it costs exactly one device->host fetch since the child
    # skips the secondary config + wall-clock phases when the tunnel is
    # degraded — then fall back to smaller grids only if it failed.
    # Round 4's ascending ladder burned its whole budget on 128/200^3
    # fetches through a 354 s/fetch tunnel and the official artifact
    # recorded 28.35 GPts/s for a repo that measures 32.45 at 512^3.
    # 200 is deliberately lane-UNALIGNED (200 % 128 != 0): it guards the
    # arbitrary-extent z-compact path (dead zero tail, _zdev_pad) — a
    # regression of the lane-cliff fix shows up as 200^3 falling far
    # below its aligned neighbours' rate. It runs as a bonus row after
    # the headline is banked, budget permitting.
    sizes = [int(forced)] if forced else [512, 384, 256, 128]

    best = None      # (n, rate, note, kind)
    guard = None     # the 200^3 lane-unaligned bonus row
    guard_tried = False
    kind = None
    todo = list(sizes)
    while todo or (best is not None and not guard_tried and not forced):
        remaining = global_deadline - time.monotonic()
        if remaining < 45:
            break
        if best is not None:
            if not forced and not guard_tried and remaining >= 150:
                n = 200  # bonus lane-unaligned guard row
                guard_tried = True
            else:
                break
        else:
            n = todo.pop(0)
        # per-size cap: the headline attempt may not eat the whole
        # budget — keep enough for at least one fallback size
        if best is None and todo:
            size_budget = max(60.0, remaining - 110)
        else:
            size_budget = remaining - 10
        # the lane-unaligned bonus guard autotunes (basic): the
        # phase/dynamic runner choice is shape-dependent and 200^3 is a
        # dynamic-path shape (the tuner recovers it; cheap at this size)
        run = ChildRun(n, so, autotune='basic' if guard_tried and
                       best is not None else None)
        print(f"[bench] trying n={n} (size budget {size_budget:.0f}s, "
              f"{remaining:.0f}s left)", file=sys.stderr, flush=True)
        run.run(ready_deadline=min(280.0, size_budget),
                line_deadline=120.0,
                global_deadline=global_deadline - 5,
                size_deadline=time.monotonic() + size_budget)
        kind = kind or run.kind
        rate, note = run.rate()
        if rate is not None:
            # pair-differencing on a noisy tunnel can produce implausible
            # estimates; anything past the hardware roofline is noise
            roof = roofline_gpts(run.kind or kind or 'unknown', 5 * 4)
            if rate > 1.2 * roof:
                rate, note = run._wall_naive_or_none(rate, note, roof)
        if rate is None:
            continue
        if best is None:
            best = (n, rate, note, run.kind or kind)
        else:
            guard = (n, rate)

    target = 0.8 * roofline_gpts(kind or 'unknown', bytes_per_point=5 * 4)
    if best is None:
        print(json.dumps({
            "metric": METRIC, "value": 0.0, "unit": "GPts/s",
            "vs_baseline": 0.0,
            "note": f"no config completed a chunk within {budget:.0f}s "
                    f"budget (tried {sizes})"}), flush=True)
        return
    n, rate, note, kind = best
    out = {
        "metric": METRIC,
        "value": round(float(rate), 3),
        "unit": "GPts/s",
        "vs_baseline": round(float(rate / target), 3),
    }
    out["note"] = f"grid {n}^3 (largest completed size), {note}"
    if guard is not None:
        out["note"] += (f"; lane-unaligned guard {guard[0]}^3: "
                        f"{guard[1]:.2f} GPts/s")
    print(json.dumps(out), flush=True)


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == '--child':
        child_main(int(sys.argv[2]), int(sys.argv[3]),
                   sys.argv[4] if len(sys.argv) > 4 else None)
    else:
        main()
