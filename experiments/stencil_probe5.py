"""Pallas v4: x-only tiling, y/z fully resident (contiguous DMA rows).

- u_t: manual double-buffered DMA of halo'd windows (TX+2H, NP, ZA)
- u_prev, m: pipelined blocked specs (TX, NP, ZA) over the padded array
- output: full padded array written tile-by-tile (x-halo rows zeroed at
  edge tiles, y/z halo columns zeroed) -> no outer DUS, no slice copies

MODE=cpu validates (interpret); MODE=tpu measures. Requires NP % TX == 0.
"""
import os
import time
from functools import partial

import numpy as np

MODE = os.environ.get('MODE', 'cpu')
if MODE == 'cpu':
    os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402
if MODE == 'cpu':
    jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

N = int(os.environ.get('N', 48 if MODE == 'cpu' else 240))
STEPS = int(os.environ.get('STEPS', 4 if MODE == 'cpu' else 64))
TX = int(os.environ.get('TX', 8 if MODE == 'cpu' else 32))
SO = 8
H = SO // 2
W = [np.float32(w) for w in [-1/560, 8/315, -1/5, 8/5, -205/72, 8/5, -1/5,
                             8/315, -1/560]]
pad = H
NP = N + 2 * pad
XP = NP + 2 * H      # extra x ring so halo windows never clamp
ZA = ((NP + 127) // 128) * 128
shape = (XP, NP, ZA)
X0 = H + pad         # first interior x row
INTERP = MODE == 'cpu'
assert XP % TX == 0
NXT = XP // TX
WINX = TX + 2 * H


def lap_interior(u):
    cx = slice(X0, X0 + N)
    c = slice(pad, pad + N)
    out = 0.
    for axis in range(3):
        for i, w in enumerate(W):
            k = i - H
            idx = [cx, c, slice(pad, pad + N)]
            if axis == 0:
                idx[0] = slice(X0 + k, X0 + k + N)
            else:
                idx[axis] = slice(pad + k, pad + k + N)
            out = out + w * u[tuple(idx)]
    return out


@partial(jax.jit, donate_argnums=(0, 1))
def run_A(u0, u1, m, nsteps):
    def body(i, carry):
        up, uc = carry
        l = lap_interior(uc)
        interior = (2. * uc[X0:X0+N, pad:pad+N, pad:pad+N]
                    - up[X0:X0+N, pad:pad+N, pad:pad+N]
                    + m * l)
        un = up.at[X0:X0+N, pad:pad+N, pad:pad+N].set(interior)
        return (uc, un)
    return jax.lax.fori_loop(0, nsteps, body, (u0, u1))


def make_v4_step():
    def kernel(uc_hbm, uprev, mref, out_ref, ubuf, sems):
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)
        nslot = jax.lax.rem(i + 1, 2)

        def win_start(ti):
            return jnp.clip(ti * TX - H, 0, XP - WINX)

        def dma_for(ti, s):
            return pltpu.make_async_copy(
                uc_hbm.at[pl.ds(win_start(ti), WINX)],
                ubuf.at[s], sems.at[s])

        @pl.when(i == 0)
        def _():
            dma_for(0, 0).start()

        @pl.when(i + 1 < NXT)
        def _():
            dma_for(i + 1, nslot).start()

        dma_for(i, slot).wait()
        # local row of absolute row (i*TX + l + k): i*TX + k - win_start
        base = i * TX - win_start(i)

        # full-shape compute: x taps by row slices, y/z taps by native
        # sublane/lane rotations (pltpu.roll); unaligned lane slices and
        # stores never occur. Rotation wrap garbage lands outside the
        # interior and is masked off.
        acc = None
        for ii, w in enumerate(W):
            k = ii - H
            s0 = jnp.maximum(base + k, 0)  # edge tiles are fully masked
            t1 = w * ubuf[slot, pl.ds(s0, TX)]
            acc = t1 if acc is None else acc + t1
        ucc0 = ubuf[slot, pl.ds(base, TX)]
        for ii, w in enumerate(W):
            k = ii - H
            acc = acc + w * pltpu.roll(ucc0, (-k) % NP, 1)
        for ii, w in enumerate(W):
            k = ii - H
            acc = acc + w * pltpu.roll(ucc0, (-k) % ZA, 2)
        val = 2. * ucc0 - uprev[...] + mref[...] * acc
        rows = jax.lax.broadcasted_iota(jnp.int32, (TX, 1, 1), 0) + i * TX
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, NP, 1), 1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ZA), 2)
        interior = ((rows >= X0) & (rows < X0 + N)
                    & (cols >= pad) & (cols < pad + N)
                    & (lanes >= pad) & (lanes < pad + N))
        out_ref[...] = jnp.where(interior, val, 0.)

    def step(uc_pad, uprev_pad, m_pad):
        return pl.pallas_call(
            kernel,
            grid=(NXT,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((TX, NP, ZA), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TX, NP, ZA), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TX, NP, ZA), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((XP, NP, ZA), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, WINX, NP, ZA), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=INTERP,
        )(uc_pad, uprev_pad, m_pad)
    return step


def make_run_E():
    step = make_v4_step()

    @partial(jax.jit, donate_argnums=(0, 1))
    def run_E(u0, u1, m_pad, nsteps):
        def body(i, carry):
            up, uc = carry
            un = step(uc, up, m_pad)
            return (uc, un)
        return jax.lax.fori_loop(0, nsteps, body, (u0, u1))
    return run_E


def bench(mk):
    fn, args = mk()
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(np.asarray(jax.device_get(leaf[pad, pad, pad])))
    fn, args = mk()
    t0 = time.perf_counter()
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(np.asarray(jax.device_get(leaf[pad, pad, pad])))
    return time.perf_counter() - t0, out


def main():
    key = jax.random.PRNGKey(0)
    u0 = jnp.zeros(shape, jnp.float32)
    u0 = u0.at[X0:X0+N, pad:pad+N, pad:pad+N].set(
        jax.random.normal(key, (N, N, N), jnp.float32) * 1e-3)
    u1 = jnp.zeros(shape, jnp.float32)
    m = jnp.full((N, N, N), 0.2, jnp.float32)
    m_pad = jnp.zeros(shape, jnp.float32).at[
        X0:X0+N, pad:pad+N, pad:pad+N].set(m)

    t, outA = bench(lambda: (run_A, (u0 + 0, u1 + 0, m, STEPS)))
    print(f"A xla-DUS: {t*1e3:.1f} ms, {N**3*STEPS/t/1e9:.2f} GPts/s",
          flush=True)

    run_E = make_run_E()
    t, outE = bench(lambda: (run_E, (u0 + 0, u1 + 0, m_pad, STEPS)))
    print(f"E v4 TX={TX}: {t*1e3:.1f} ms, {N**3*STEPS/t/1e9:.2f} GPts/s",
          flush=True)

    a = np.asarray(outA[1])[X0:X0+N, pad:pad+N, pad:pad+N]
    e = np.asarray(outE[1])[X0:X0+N, pad:pad+N, pad:pad+N]
    print("E vs A interior err:", np.abs(a - e).max(), flush=True)


if __name__ == '__main__':
    main()
