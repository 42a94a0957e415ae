"""Measure stencil-kernel strategies on the TPU to pick the backend design.

A: raw XLA shifted-slice stencil (what the framework emits today)
C: Pallas kernel — (x,y)-tiled, halo'd tiles DMA'd HBM->VMEM manually,
   z innermost fully resident (contiguous lanes).
"""
import os
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

N = int(os.environ.get('N', 256))
STEPS = int(os.environ.get('STEPS', 64))
TX = int(os.environ.get('TX', 32))
TY = int(os.environ.get('TY', 32))
SO = 8
H = SO // 2
W = [np.float32(w) for w in [-1/560, 8/315, -1/5, 8/5, -205/72, 8/5, -1/5,
                             8/315, -1/560]]
pad = H
shape = (N + 2 * pad, N + 2 * pad, N + 2 * pad)


def lap(u):
    c = slice(pad, -pad)
    out = 0.
    for axis in range(3):
        for i, w in enumerate(W):
            k = i - H
            sl = slice(pad + k, pad + k + N)
            idx = [c, c, c]
            idx[axis] = sl
            out = out + w * u[tuple(idx)]
    return out


@partial(jax.jit, donate_argnums=(0, 1))
def run_xla(u0, u1, m, damp, nsteps):
    def body(i, carry):
        up, uc = carry
        l = lap(uc)
        interior = (2. * uc[pad:-pad, pad:-pad, pad:-pad]
                    - up[pad:-pad, pad:-pad, pad:-pad]
                    + m * l - damp * uc[pad:-pad, pad:-pad, pad:-pad])
        un = up.at[pad:-pad, pad:-pad, pad:-pad].set(interior)
        return (uc, un)
    return jax.lax.fori_loop(0, nsteps, body, (u0, u1))


def bench(fn, *args):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(np.asarray(leaf.ravel()[0]))
    t0 = time.perf_counter()
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(np.asarray(leaf.ravel()[0]))
    return time.perf_counter() - t0


def make_pallas_step():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NXT, NYT = N // TX, N // TY
    NZ = N + 2 * H

    def kernel(up_hbm, uc_hbm, m_ref, damp_ref, out_ref,
               up_t, uc_t, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        cp1 = pltpu.make_async_copy(
            up_hbm.at[pl.ds(i * TX, TX + 2 * H),
                      pl.ds(j * TY, TY + 2 * H), :],
            up_t, sems.at[0])
        cp2 = pltpu.make_async_copy(
            uc_hbm.at[pl.ds(i * TX, TX + 2 * H),
                      pl.ds(j * TY, TY + 2 * H), :],
            uc_t, sems.at[1])
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()

        uc_c = uc_t[H:-H, H:-H, H:-H]
        c = 2. * uc_c - up_t[H:-H, H:-H, H:-H]
        l = None
        for ii, w in enumerate(W):
            k = ii - H
            t1 = w * uc_t[H + k:H + k + TX, H:-H, H:-H]
            l = t1 if l is None else l + t1
        for ii, w in enumerate(W):
            k = ii - H
            l = l + w * uc_t[H:-H, H + k:H + k + TY, H:-H]
        for ii, w in enumerate(W):
            k = ii - H
            l = l + w * uc_t[H:-H, H:-H, H + k:H + k + N]
        out_ref[...] = c + m_ref[...] * l - damp_ref[...] * uc_c

    from jax.experimental.pallas import tpu as pltpu2

    def step(up, uc, m, damp):
        return pl.pallas_call(
            kernel,
            grid=(NXT, NYT),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((TX, TY, N), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TX, TY, N), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TX, TY, N), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, N, N), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((TX + 2 * H, TY + 2 * H, NZ), jnp.float32),
                pltpu.VMEM((TX + 2 * H, TY + 2 * H, NZ), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(up, uc, m, damp)
    return step


def main():
    key = jax.random.PRNGKey(0)
    u0 = jax.random.normal(key, shape, jnp.float32) * 1e-3
    u1 = jnp.zeros(shape, jnp.float32)
    m = jnp.full((N, N, N), 0.2, jnp.float32)
    damp = jnp.zeros((N, N, N), jnp.float32)

    t = bench(run_xla, u0, u1, m, damp, STEPS)
    print(f"A raw-XLA: {t*1e3:.1f} ms, {N**3*STEPS/t/1e9:.2f} GPts/s")

    pallas_step = make_pallas_step()

    @partial(jax.jit, donate_argnums=(0, 1))
    def run_pallas(u0, u1, m, damp, nsteps):
        def body(i, carry):
            up, uc = carry
            interior = pallas_step(up, uc, m, damp)
            un = up.at[pad:-pad, pad:-pad, pad:-pad].set(interior)
            return (uc, un)
        return jax.lax.fori_loop(0, nsteps, body, (u0, u1))

    try:
        t = bench(run_pallas, u0, u1, m, damp, STEPS)
        print(f"C pallas TX={TX} TY={TY}: {t*1e3:.1f} ms, "
              f"{N**3*STEPS/t/1e9:.2f} GPts/s")
        # correctness vs XLA
        a = run_xla(u0 + 0, u1 + 0, m, damp, 3)
        b = run_pallas(u0 + 0, u1 + 0, m, damp, 3)
        err = float(jnp.abs(a[1] - b[1]).max())
        print("max |xla - pallas| after 3 steps:", err)
    except Exception as e:
        import traceback
        traceback.print_exc()
        print("C failed:", str(e)[:300])


if __name__ == '__main__':
    main()
