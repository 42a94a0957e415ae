"""Probe: x-chunked 27-tap star stencil with per-chunk VMEM-materialized
f32 windows vs the monolithic fusion, at sizes past the MSA pin cliff.

Model of the bench acoustic so8 step: u (3, nx+2h, ny+2h, zlanes) bf16
storage, vp/damp f32, 25-tap laplacian + dt2/dt terms. The monolithic
fusion's staged f32 row stops fitting VMEM at ~320^3 and XLA re-reads
HBM per tap (~27x traffic). Chunking x with an optimization_barrier'd
window restores the VMEM-resident taps.

Usage: xchunk_probe.py [n] [chunk|0=mono] [K]
"""
import sys, time, functools
import numpy as np
import jax
import jax.numpy as jnp

n = int(sys.argv[1]) if len(sys.argv) > 1 else 320
chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 64
K = int(sys.argv[3]) if len(sys.argv) > 3 else 16

so = 8
h = so  # halo
zl = -(-n // 128) * 128  # z lanes (compact, dead tail)
nx = n + 2 * h

key = jax.random.PRNGKey(0)
u = jnp.zeros((3, nx, nx, zl), jnp.bfloat16)
u = u.at[:, nx//2, nx//2, n//2].set(1.0)
vp = jnp.full((n, n, zl), 1.5, jnp.float32)
damp = jnp.zeros((n, n, zl), jnp.float32)

# so=8 central second-derivative weights
w = np.array([-1/560, 8/315, -1/5, 8/5, -205/72*0.5])  # half c0 per axis pair usage
c = np.zeros(9)
c[0] = -205/72
for i, wi in enumerate([8/5, -1/5, 8/315, -1/560], start=1):
    c[i] = wi
dt = np.float32(0.001)

def lap(uf, x0, xl):
    """25-tap laplacian over window rows [x0, x0+xl) (domain coords)."""
    acc = 0.
    # x taps read rows [x0 - i, x0 + xl + i) via static slices of uf
    for i in range(1, 5):
        acc = acc + c[i] * (uf[h + x0 + i: h + x0 + i + xl, h:h+n, :]
                            + uf[h + x0 - i: h + x0 - i + xl, h:h+n, :])
    for i in range(1, 5):
        acc = acc + c[i] * (uf[h + x0: h + x0 + xl, h+i:h+i+n, :]
                            + uf[h + x0: h + x0 + xl, h-i:h-i+n, :])
    zp = jnp.pad(uf[h + x0: h + x0 + xl, h:h+n, :], ((0,0),(0,0),(h,h)))
    for i in range(1, 5):
        acc = acc + c[i] * (zp[:, :, h+i:h+i+zl] + zp[:, :, h-i:h-i+zl])
    acc = acc + 3 * c[0] * uf[h + x0: h + x0 + xl, h:h+n, :]
    return acc

def step(bufs, t):
    u, vp, damp = bufs
    tm1 = (t + 2) % 3; t0 = t % 3; tp1 = (t + 1) % 3
    row0 = jax.lax.dynamic_index_in_dim(u, t0, 0, keepdims=False)
    rowm = jax.lax.dynamic_index_in_dim(u, tm1, 0, keepdims=False)
    m = 1.0 / (vp * vp)
    out = u
    if chunk <= 0:
        f0 = row0.astype(jnp.float32)
        fm = rowm.astype(jnp.float32)
        l = lap(f0, 0, n)
        newv = (2 * f0[h:h+n, h:h+n, :] - fm[h:h+n, h:h+n, :]
                + dt * dt / m * l) / (1 + dt * damp / m * 0)
        out = jax.lax.dynamic_update_slice(
            out, newv.astype(u.dtype)[None], (tp1, h, h, 0))
    else:
        for a in range(0, n, chunk):
            xl = min(chunk, n - a)
            # window: rows [a - h, a + xl + h) domain = [a, a+xl+2h) buffer
            win = jax.lax.dynamic_slice(
                row0, (a, 0, 0), (xl + 2 * h, nx, zl)).astype(jnp.float32)
            if not int(os.environ.get('PROBE_NOBAR', 0)):
                (win,) = jax.lax.optimization_barrier((win,))
            l = lap(win, 0, xl)  # x0=0 in window coords (window starts at domain a - h -> buffer a = 'h + x0 - h')
            f0c = win[h:h+xl, h:h+n, :]
            fmc = jax.lax.dynamic_slice(
                rowm, (a + h, h, 0), (xl, n, zl)).astype(jnp.float32)
            mc = jax.lax.dynamic_slice(m, (a, 0, 0), (xl, n, zl))
            newv = 2 * f0c - fmc + dt * dt / mc * l
            out = jax.lax.dynamic_update_slice(
                out, newv.astype(u.dtype)[None], (tp1, a + h, h, 0))
    return (out, vp, damp)

def run(bufs, t0, k):
    def body(i, st):
        return step(st, t0 + i)
    return jax.lax.fori_loop(0, k, body, bufs)

import os
_vmem = os.environ.get('PROBE_VMEM_KIB')
if _vmem:
    _co = {'xla_tpu_scoped_vmem_limit_kib': _vmem}
    runj = jax.jit(run, static_argnums=(2,), donate_argnums=(0,)).lower(
        (u, vp, damp), jnp.int32(0), 2).compile(compiler_options=_co)
    # recompile path: wrap so call signatures match below
    _runj2 = jax.jit(run, static_argnums=(2,), donate_argnums=(0,)).lower(
        (u, vp, damp), jnp.int32(2), K).compile(compiler_options=_co)
    _first = [True]
    def runj(bufs, t0, k):
        if _first[0]:
            _first[0] = False
            return _runj2(bufs, t0) if k == K else globals()['_w'](bufs, t0)
        return _runj2(bufs, t0)
    # simpler: dispatch by k
    def runj(bufs, t0, k, _a=_runj2):
        if k == K:
            return _a(bufs, t0)
        return jax.jit(run, static_argnums=(2,), donate_argnums=(0,)).lower(
            bufs, t0, k).compile(compiler_options=_co)(bufs, t0)
else:
    runj = jax.jit(run, static_argnums=(2,), donate_argnums=(0,))
bufs = (u, vp, damp)
t0c = time.perf_counter()
bufs = runj(bufs, jnp.int32(0), 2)
jax.block_until_ready(bufs)
print(f"warmup {time.perf_counter()-t0c:.1f}s", flush=True)

import tempfile, jax.profiler
tdir = tempfile.mkdtemp(prefix='xchunk_')
with jax.profiler.trace(tdir):
    bufs = runj(bufs, jnp.int32(2), K)
    jax.block_until_ready(bufs)
    # force a device fetch so the trace flushes
    _ = float(np.asarray(bufs[0][0, nx//2, nx//2, n//2].astype(jnp.float32)))

sys.path.insert(0, '/root/repo')
from devito_tpu.operator.trace_profile import device_events
evs = device_events(tdir)
tot, cnt = {}, {}
for name, secs, args in evs:
    tot[name] = tot.get(name, 0.0) + secs
    cnt[name] = cnt.get(name, 0) + 1
tsum = sum(tot.values())
best = tsum / K
gpts = n**3 / best / 1e9
print(f"n={n} chunk={chunk}: {best*1e3:.3f} ms/step (device), {gpts:.2f} GPts/s")
for name, s in sorted(tot.items(), key=lambda kv: -kv[1])[:8]:
    print(f"  {s/K*1e3:9.4f} ms/step x{cnt[name]/K:>5.1f}  {name[:100]}")
