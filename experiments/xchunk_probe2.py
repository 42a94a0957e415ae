"""Probe variant: x-chunked stencil where each chunk reads its windows from
the ACCUMULATING buffer (post-previous-DUS value) instead of the
original carry.

xchunk_probe.py measured 5x 0.56 ms/step bitcast_dynamic-update-slice
fusions at 384^3 chunk=64 — XLA copies the whole u buffer per chunk DUS
because later chunks still read the ORIGINAL buffer (its value stays
live past each write, so no in-place). Reading rows t0/tm1 from the
accumulated value is semantically identical (the DUS only touches row
tp1) and kills the liveness: each DUS's input dies at the DUS, XLA
updates in place, and the acc->read->DUS chain serializes the chunks
without optimization_barrier.

Usage: xchunk_probe2.py [n] [chunk|0=mono] [K]
"""
import os
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

n = int(sys.argv[1]) if len(sys.argv) > 1 else 384
chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 64
K = int(sys.argv[3]) if len(sys.argv) > 3 else 8

so = 8
h = so
zl = -(-n // 128) * 128
nx = n + 2 * h

u = jnp.zeros((3, nx, nx, zl), jnp.bfloat16)
u = u.at[:, nx//2, nx//2, n//2].set(1.0)
vp = jnp.full((n, n, zl), 1.5, jnp.float32)
damp = jnp.zeros((n, n, zl), jnp.float32)

c = np.zeros(9)
c[0] = -205/72
for i, wi in enumerate([8/5, -1/5, 8/315, -1/560], start=1):
    c[i] = wi
dt = np.float32(0.001)


def lap(uf, xl):
    """25-tap laplacian; uf is an f32 window of rows [a-h, a+xl+h) x
    full (y+2h, zl)."""
    acc = 0.
    for i in range(1, 5):
        acc = acc + c[i] * (uf[h + i: h + i + xl, h:h+n, :]
                            + uf[h - i: h - i + xl, h:h+n, :])
    for i in range(1, 5):
        acc = acc + c[i] * (uf[h:h+xl, h+i:h+i+n, :]
                            + uf[h:h+xl, h-i:h-i+n, :])
    zp = jnp.pad(uf[h:h+xl, h:h+n, :], ((0, 0), (0, 0), (h, h)))
    for i in range(1, 5):
        acc = acc + c[i] * (zp[:, :, h+i:h+i+zl] + zp[:, :, h-i:h-i+zl])
    acc = acc + 3 * c[0] * uf[h:h+xl, h:h+n, :]
    return acc


def step(bufs, t):
    u, vp, damp = bufs
    tm1 = (t + 2) % 3
    t0 = t % 3
    tp1 = (t + 1) % 3
    m = 1.0 / (vp * vp)
    out = u
    if chunk <= 0:
        row0 = jax.lax.dynamic_index_in_dim(u, t0, 0, keepdims=False)
        rowm = jax.lax.dynamic_index_in_dim(u, tm1, 0, keepdims=False)
        f0 = row0.astype(jnp.float32)
        fm = rowm.astype(jnp.float32)
        win = jnp.pad(f0, ((0, 0), (0, 0), (0, 0)))
        l = lap(f0, n)
        newv = 2 * f0[h:h+n, h:h+n, :] - fm[h:h+n, h:h+n, :] + dt * dt / m * l
        out = jax.lax.dynamic_update_slice(
            out, newv.astype(u.dtype)[None], (tp1, h, h, 0))
    else:
        for a in range(0, n, chunk):
            xl = min(chunk, n - a)
            # window rows [a, a+xl+2h) of buffer axis (= domain rows
            # [a-h, a+xl+h)), read from OUT: post-previous-DUS value
            win = jax.lax.dynamic_slice(
                out, (t0, a, 0, 0), (1, xl + 2 * h, nx, zl)
            )[0].astype(jnp.float32)
            if int(os.environ.get('PROBE_BAR', 0)):
                (win,) = jax.lax.optimization_barrier((win,))
            l = lap(win, xl)
            f0c = win[h:h+xl, h:h+n, :]
            fmc = jax.lax.dynamic_slice(
                out, (tm1, a + h, h, 0), (1, xl, n, zl)
            )[0].astype(jnp.float32)
            mc = jax.lax.dynamic_slice(m, (a, 0, 0), (xl, n, zl))
            newv = 2 * f0c - fmc + dt * dt / mc * l
            out = jax.lax.dynamic_update_slice(
                out, newv.astype(u.dtype)[None], (tp1, a + h, h, 0))
    return (out, vp, damp)


def run(bufs, t0, k):
    def body(i, st):
        return step(st, t0 + i)
    return jax.lax.fori_loop(0, k, body, bufs)


runj = jax.jit(run, static_argnums=(2,), donate_argnums=(0,))
bufs = (u, vp, damp)
t0c = time.perf_counter()
bufs = runj(bufs, jnp.int32(0), 2)
jax.block_until_ready(bufs)
print(f"warmup {time.perf_counter()-t0c:.1f}s", flush=True)

import tempfile
import jax.profiler
tdir = tempfile.mkdtemp(prefix='xchunk2_')
with jax.profiler.trace(tdir):
    bufs = runj(bufs, jnp.int32(2), K)
    jax.block_until_ready(bufs)
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
print(f"n={n} chunk={chunk}: {best*1e3:.3f} ms/step (device), "
      f"{gpts:.2f} GPts/s")
for name, s in sorted(tot.items(), key=lambda kv: -kv[1])[:10]:
    print(f"  {s/K*1e3:9.4f} ms/step x{cnt[name]/K:>5.1f}  {name[:100]}")
