"""Probe 7: decompose the per-step cost of the probe-6 kernel.

A. pure DMA HBM->VMEM (+ VMEM->HBM writeback) throughput, double-buffered
B. pure VPU compute: the acoustic RHS on VMEM-resident windows, no DMA
C. empty pallas kernel: per-grid-step dispatch overhead

Run: python experiments/stencil_probe7.py A|B|C
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, H, R, ZA, NY = 256, 8, 4, 384, 272
W = [-205.0 / 72, 8.0 / 5, -1.0 / 5, 8.0 / 315, -1.0 / 560]


def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf[tuple(0 for _ in leaf.shape)])


def timeit(fn, *args, iters=3):
    r = fn(*args)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0) / iters


def probe_A(t0=16, nwin=4, writeback=True, nsplit=1):
    """nwin input windows of (t0, NY, ZA) rows + optional out DMA,
    each window DMA split into nsplit concurrent x-chunk DMAs."""
    nxt = N // t0
    tc = t0 // nsplit

    def kernel(src, out, win, owin, sems, osem):
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)
        nslot = jax.lax.rem(i + 1, 2)

        def dmas(ti, s):
            for k in range(nwin):
                for j in range(nsplit):
                    yield pltpu.make_async_copy(
                        src.at[pl.ds(H + ti * t0 + j * tc, tc)],
                        win.at[s, k, pl.ds(j * tc, tc)],
                        sems.at[s, k * nsplit + j])

        @pl.when(i == 0)
        def _():
            for d in dmas(0, 0):
                d.start()

        @pl.when(i + 1 < nxt)
        def _():
            for d in dmas(i + 1, nslot):
                d.start()

        for d in dmas(i, slot):
            d.wait()

        if writeback:
            @pl.when(i >= 2)
            def _():
                pltpu.make_async_copy(
                    owin.at[slot], out.at[pl.ds(H + (i - 2) * t0, t0)],
                    osem.at[slot]).wait()
            owin[slot] = win[slot, 0] + 1.0
            od = pltpu.make_async_copy(
                owin.at[slot], out.at[pl.ds(H + i * t0, t0)], osem.at[slot])
            od.start()

            @pl.when(i == nxt - 1)
            def _():
                pltpu.make_async_copy(
                    owin.at[nslot], out.at[pl.ds(H + (i - 1) * t0, t0)],
                    osem.at[nslot]).wait()
                pltpu.make_async_copy(
                    owin.at[slot], out.at[pl.ds(H + i * t0, t0)],
                    osem.at[slot]).wait()
        else:
            @pl.when(i == 0)
            def _():
                owin[0, 0] = win[slot, 0, 0]

    call = pl.pallas_call(
        kernel,
        grid=(nxt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((NY, NY, ZA), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, nwin, t0, NY, ZA), jnp.float32),
            pltpu.VMEM((2, t0, NY, ZA), jnp.float32),
            pltpu.SemaphoreType.DMA((2, nwin * nsplit)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )

    x = jnp.ones((NY, NY, ZA), jnp.float32)

    @jax.jit
    def rep(a):
        def body(i, c):
            return call(c)
        return jax.lax.fori_loop(0, 8, body, a)

    dt = timeit(rep, x, iters=3) / 8
    nbytes = (nwin + (2 if writeback else 0)) * N * NY * ZA * 4
    print(f"A t0={t0} nwin={nwin} wb={writeback} nsplit={nsplit}: {dt*1e3:.2f} ms/step "
          f"-> {nbytes/dt/1e9:.0f} GB/s agg DMA", flush=True)


def probe_B(t0=16, reps=16, taps='full'):
    """Acoustic RHS on resident VMEM windows; reps iterations == one
    virtual time step (same block count as the probe-6 kernel)."""

    def kernel(seed, out, utw, u1w, vpw, dpw, ow):
        @pl.when(pl.program_id(0) == 0)
        def _():
            utw[...] = jnp.full(utw.shape, 0.01, jnp.float32)
            u1w[...] = jnp.full(u1w.shape, 0.01, jnp.float32)
            vpw[...] = jnp.full(vpw.shape, 1.5, jnp.float32)
            dpw[...] = jnp.zeros(dpw.shape, jnp.float32)

        def at3(dx, dy, dz):
            return utw[pl.ds(R + dx, t0), pl.ds(H + dy, N),
                       pl.ds(H + dz, N)]

        ut0 = at3(0, 0, 0)
        lap = (3.0 * W[0]) * ut0
        if taps != 'none':
            for k in range(1, R + 1):
                terms = at3(0, 0, k) + at3(0, 0, -k)
                if taps == 'full':
                    terms = (terms + at3(k, 0, 0) + at3(-k, 0, 0)
                             + at3(0, k, 0) + at3(0, -k, 0))
                lap += W[k] * terms
        lap = lap * (1.0 / 100.0)
        u1 = u1w[:, H:H + N, H:H + N]
        vp = vpw[:, H:H + N, H:H + N]
        dp = dpw[:, H:H + N, H:H + N]
        m = 1.0 / (vp * vp)
        a = m * 100.0
        b = dp * 5.0
        val = ((2.0 * a) * ut0 - (a - b) * u1 + lap) / (a + b)
        ow[:, H:H + N, H:H + N] = val
        out[...] = ow[0, 0:8, 0:128]

    call = pl.pallas_call(
        kernel,
        grid=(reps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t0 + 2 * R, NY, ZA), jnp.float32),
            pltpu.VMEM((t0, NY, ZA), jnp.float32),
            pltpu.VMEM((t0, NY, ZA), jnp.float32),
            pltpu.VMEM((t0, NY, ZA), jnp.float32),
            pltpu.VMEM((t0, NY, ZA), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )
    seed = jnp.zeros((1,), jnp.int32)

    @jax.jit
    def rep(s):
        def body(i, c):
            return call(s) + c
        return jax.lax.fori_loop(0, 8, body, jnp.zeros((8, 128), jnp.float32))

    dt = timeit(rep, seed, iters=3) / 8
    pts = t0 * N * N * reps
    print(f"B t0={t0} taps={taps}: {dt*1e3:.2f} ms/virtual-step "
          f"-> {pts/dt/1e9:.1f} GPts/s compute-only", flush=True)


def probe_C(reps=16):
    def kernel(out):
        out[...] = jnp.full((8, 128), pl.program_id(0), jnp.float32)

    call = pl.pallas_call(
        kernel,
        grid=(reps,),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )

    @jax.jit
    def rep():
        def body(i, c):
            return call() + c
        return jax.lax.fori_loop(0, 64, body,
                                 jnp.zeros((8, 128), jnp.float32))

    dt = timeit(rep, iters=3) / 64
    print(f"C: {dt*1e6:.1f} us per {reps}-step pallas_call", flush=True)


def probe_D(t0=16, nwin=4):
    """Like A(nowb) but the whole pipeline lives in ONE kernel invocation
    (fori_loop over x-chunks) instead of grid steps."""
    nxt = N // t0

    def kernel(src, out, win, sems):
        def dma(ti, s, k):
            return pltpu.make_async_copy(
                src.at[pl.ds(H + ti * t0, t0)], win.at[s, k],
                sems.at[s, k])

        for k in range(nwin):
            dma(0, 0, k).start()

        def body(i, acc):
            slot = jax.lax.rem(i, 2)
            nslot = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < nxt)
            def _():
                for k in range(nwin):
                    dma(i + 1, nslot, k).start()

            for k in range(nwin):
                dma(i, slot, k).wait()
            return acc + win[slot, 0, 0, 0:8, 0:128]

        acc = jax.lax.fori_loop(
            0, nxt, body, jnp.zeros((8, 128), jnp.float32))
        out[...] = acc

    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, nwin, t0, NY, ZA), jnp.float32),
            pltpu.SemaphoreType.DMA((2, nwin)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )

    x = jnp.ones((NY, NY, ZA), jnp.float32)

    @jax.jit
    def rep(a):
        def body(i, c):
            return call(a) + c
        return jax.lax.fori_loop(0, 8, body,
                                 jnp.zeros((8, 128), jnp.float32))

    dt = timeit(rep, x, iters=3) / 8
    nbytes = nwin * N * NY * ZA * 4
    print(f"D t0={t0} nwin={nwin}: {dt*1e3:.2f} ms/step "
          f"-> {nbytes/dt/1e9:.0f} GB/s agg DMA", flush=True)



def probe_E(t0=16, nwin=4, depth=3):
    """D with configurable pipeline depth (DMAs for i+1..i+depth-1 in
    flight)."""
    nxt = N // t0

    def kernel(src, out, win, sems):
        def dma(ti, s, k):
            return pltpu.make_async_copy(
                src.at[pl.ds(H + ti * t0, t0)], win.at[s, k],
                sems.at[s, k])

        for p in range(depth - 1):
            if p < nxt:
                for k in range(nwin):
                    dma(p, p, k).start()

        def body(i, acc):
            slot = jax.lax.rem(i, depth)
            fslot = jax.lax.rem(i + depth - 1, depth)

            @pl.when(i + depth - 1 < nxt)
            def _():
                for k in range(nwin):
                    dma(i + depth - 1, fslot, k).start()

            for k in range(nwin):
                dma(i, slot, k).wait()
            return acc + win[slot, 0, 0, 0:8, 0:128]

        acc = jax.lax.fori_loop(
            0, nxt, body, jnp.zeros((8, 128), jnp.float32))
        out[...] = acc

    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((depth, nwin, t0, NY, ZA), jnp.float32),
            pltpu.SemaphoreType.DMA((depth, nwin)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )

    x = jnp.ones((NY, NY, ZA), jnp.float32)

    @jax.jit
    def rep(a):
        def body(i, c):
            return call(a) + c
        return jax.lax.fori_loop(0, 8, body,
                                 jnp.zeros((8, 128), jnp.float32))

    dt = timeit(rep, x, iters=3) / 8
    nbytes = nwin * N * NY * ZA * 4
    print(f"E t0={t0} nwin={nwin} depth={depth}: {dt*1e3:.2f} ms/step "
          f"-> {nbytes/dt/1e9:.0f} GB/s agg DMA", flush=True)




if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'C'
    arg = sys.argv[2] if len(sys.argv) > 2 else None
    if which == 'A':
        t0 = int(sys.argv[2]); nwin = int(sys.argv[3]); wb = sys.argv[4] == 'wb'
        ns = int(sys.argv[5]) if len(sys.argv) > 5 else 1
        probe_A(t0=t0, nwin=nwin, writeback=wb, nsplit=ns)
    elif which == 'E':
        probe_E(t0=int(sys.argv[2]), nwin=int(sys.argv[3]),
                depth=int(sys.argv[4]))
    elif which == 'D':
        probe_D(t0=int(sys.argv[2]), nwin=int(sys.argv[3]))
    elif which == 'B':
        probe_B(taps=arg or 'full')
    else:        probe_C()
