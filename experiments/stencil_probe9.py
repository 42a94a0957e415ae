"""Probe 9: sliding-window (ring) Pallas pipeline for the acoustic so8
update.

Design under test:
- fields stored (NX+16, NY+16, NZ) — x/y halo 8, z COMPACT (lane-aligned)
- 1-D grid over x-tiles; a VMEM window (TX+16, NY+16, NZ) slides along x:
  each tile VMEM-copies the window tail into the head and DMAs only the
  NEW TX-slab -> zero x-halo re-fetch from HBM
- u[t-1]/vp/damp are margin-free: double-buffered slab DMAs
- z taps via lane rolls + iota edge masks (no z padding, no 384-lane
  overfetch)

Target: beat the XLA z-compact path (0.74 ms/step @ 256^3 so8 on v5e).
Usage: python experiments/stencil_probe9.py [N] [TX] [steps]
"""

import os
import sys
sys.path.insert(0, os.getcwd())
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = 8  # so8 halo


def make_kernel(N, TX):
    NXP = N + 2 * H          # padded x
    NYP = N + 2 * H          # padded y
    NZ = N                   # compact z (lane-aligned when N % 128 == 0)
    S = TX + 2 * H           # window depth
    ntiles = N // TX

    # so8 second-derivative weights
    w = np.array([-1/560, 8/315, -1/5, 8/5, -205/72, 8/5, -1/5, 8/315,
                  -1/560], np.float32)

    def kernel(c_ref, u0_any, u1_any, vp_any, dp_any, out_ref,
               win, stage_u1, stage_vp, stage_dp, done_first, sems):
        i = pl.program_id(0)
        two = np.int32(2)
        slot = jax.lax.rem(i, two)
        nslot = jax.lax.rem(i + np.int32(1), two)

        def slab_dma(src, dst, tidx, s, rows, row0_off, sem_i):
            start = tidx * TX + row0_off
            return pltpu.make_async_copy(
                src.at[pl.ds(start, rows)], dst.at[s], sems.at[2 * sem_i + s])

        # prefetch next tile's slabs while computing this one
        @pl.when(i == 0)
        def _():
            # first tile: full window + slabs for tile 0
            pltpu.make_async_copy(u0_any.at[pl.ds(0, S)], win,
                                  sems.at[8]).start()
            slab_dma(u1_any, stage_u1, i, slot, TX, H, 0).start()
            slab_dma(vp_any, stage_vp, i, slot, TX, H, 1).start()
            slab_dma(dp_any, stage_dp, i, slot, TX, H, 2).start()

        @pl.when(i + 1 < ntiles)
        def _():
            slab_dma(u1_any, stage_u1, i + 1, nslot, TX, H, 0).start()
            slab_dma(vp_any, stage_vp, i + 1, nslot, TX, H, 1).start()
            slab_dma(dp_any, stage_dp, i + 1, nslot, TX, H, 2).start()
            # next u0 slab lands in the window TAIL after the shift; stage
            # it into the scratch tail region via a separate DMA below

        @pl.when(i == 0)
        def _():
            pltpu.make_async_copy(u0_any.at[pl.ds(0, S)], win,
                                  sems.at[8]).wait()

        @pl.when(i > 0)
        def _():
            # window slide: tail (2H rows) -> head, then wait for the new
            # TX-slab DMA (started by the PREVIOUS tile) into rows 2H:S
            win[0:2 * H] = win[TX:TX + 2 * H]
            pltpu.make_async_copy(u0_any.at[pl.ds(i * TX + 2 * H, TX)],
                                  win.at[pl.ds(2 * H, TX)],
                                  sems.at[9]).start()
            pltpu.make_async_copy(u0_any.at[pl.ds(i * TX + 2 * H, TX)],
                                  win.at[pl.ds(2 * H, TX)],
                                  sems.at[9]).wait()

        slab_dma(u1_any, stage_u1, i, slot, TX, H, 0).wait()
        slab_dma(vp_any, stage_vp, i, slot, TX, H, 1).wait()
        slab_dma(dp_any, stage_dp, i, slot, TX, H, 2).wait()

        c = c_ref[0]

        # stencil: u = win rows [H .. H+TX), y region [H, H+N), z full
        def xs(dx):
            return win[H + dx:H + dx + TX, H:H + N, :]

        def ys(dy):
            return win[H:H + TX, H + dy:H + dy + N, :]

        u = xs(0)
        acc = w[4] * 3.0 * u
        for k in range(1, H // 2 + 1):
            acc = acc + w[4 + k] * (xs(k) + xs(-k) + ys(k) + ys(-k))
        # z taps via lane roll + edge mask
        lanes = jax.lax.broadcasted_iota(jnp.int32, u.shape, 2)
        for k in range(1, H // 2 + 1):
            zp = pltpu.roll(u, N - k, 2)   # left shift by k (cyclic)
            zm = pltpu.roll(u, k, 2)
            zp = jnp.where(lanes < N - k, zp, 0.0)
            zm = jnp.where(lanes >= k, zm, 0.0)
            acc = acc + w[4 + k] * (zp + zm)
        u1s = stage_u1[slot]
        vps = stage_vp[slot]
        dps = stage_dp[slot]
        out_ref[...] = (2.0 * u - u1s + c * vps * vps * acc
                        - dps * u)

    grid = (ntiles,)
    out_spec = pl.BlockSpec((TX, N, NZ), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((S, NYP, NZ), jnp.float32),       # sliding window
        pltpu.VMEM((2, TX, N, NZ), jnp.float32),     # u1 slabs
        pltpu.VMEM((2, TX, N, NZ), jnp.float32),     # vp slabs
        pltpu.VMEM((2, TX, N, NZ), jnp.float32),     # damp slabs
        pltpu.SMEM((1,), jnp.int32),
        pltpu.SemaphoreType.DMA((10,)),
    ]
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((N, N, NZ), jnp.float32),
        scratch_shapes=scratch,
    )
    return call


def main(N=256, TX=32, steps=64):
    NXP = N + 2 * H
    rng = np.random.default_rng(0)
    # u0 padded in x/y, compact z; slab sources for u1/vp/damp are domain
    # regions of padded buffers: for the probe store them domain-only in
    # x with y padded to match slicing ((N+2H) y, N z)
    u0 = jnp.asarray(rng.standard_normal((NXP, NXP, N)).astype(np.float32))
    u1 = jnp.asarray(rng.standard_normal((NXP, NXP, N)).astype(np.float32))
    vp = jnp.ones((NXP, NXP, N), np.float32) * 1.5
    dp = jnp.zeros((NXP, NXP, N), np.float32)
    c = jnp.asarray([1e-4], np.float32)

    call = make_kernel(N, TX)

    # slab inputs are read at rows [H + i*TX, ...) with y sliced [H,H+N):
    # pre-slice y so the kernel's (TX, N, NZ) slab windows match
    u1s = u1[:, H:H + N, :]
    vps = vp[:, H:H + N, :]
    dps = dp[:, H:H + N, :]

    def _step(u0, u1s, vps, dps):
        return call(c, u0, u1s, vps, dps)

    step = jax.jit(_step).lower(u0, u1s, vps, dps).compile(
        compiler_options={'xla_tpu_scoped_vmem_limit_kib': '100000'})

    out = step(u0, u1s, vps, dps)
    out.block_until_ready()
    # correctness vs XLA reference
    def ref():
        w = np.array([-1/560, 8/315, -1/5, 8/5, -205/72, 8/5, -1/5, 8/315,
                      -1/560], np.float32)
        u = u0[H:H + N, H:H + N, :]
        acc = w[4] * 3.0 * u
        for k in range(1, 5):
            acc = acc + w[4 + k] * (
                u0[H + k:H + N + k, H:H + N, :] + u0[H - k:H + N - k, H:H + N, :]
                + u0[H:H + N, H + k:H + N + k, :] + u0[H:H + N, H - k:H + N - k, :])
            zp = jnp.pad(u, ((0, 0), (0, 0), (0, k)))[:, :, k:]
            zm = jnp.pad(u, ((0, 0), (0, 0), (k, 0)))[:, :, :N]
            acc = acc + w[4 + k] * (zp + zm)
        return (2.0 * u - u1s[H:H + N] + c[0] * vps[H:H + N] ** 2 * acc
                - dps[H:H + N] * u)
    r = jax.jit(ref)()
    err = float(jnp.max(jnp.abs(out - r)))
    print('max abs err vs XLA reference:', err)

    t0 = time.perf_counter()
    for _ in range(steps):
        out = step(u0, u1s, vps, dps)
    out.block_until_ready()
    float(np.asarray(out[0, 0, 0]))
    dt = (time.perf_counter() - t0) / steps
    gb = 5 * N * N * N * 4 / 1e9
    print(f'N={N} TX={TX}: {dt*1e3:.3f} ms/step, {N**3/dt/1e9:.2f} GPts/s, '
          f'{gb/dt:.0f} GB/s effective')


if __name__ == '__main__':
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    TX = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    main(N, TX, steps)
