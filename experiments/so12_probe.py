#!/usr/bin/env python
"""SO=12 VPU-bound probe (round 4, VERDICT item 3).

512^3 SO=12 runs at 18.5 GPts/s: 12 x 0.40 ms stencil fusions ~2.4x the
per-chunk HBM bound, plus 12 x 0.163 ms window converts. The 37-tap
laplacian is partially VPU-bound at fp32. Measure the candidate levers
directly on a chunk-sized slab:

  A. raw VPU throughput, fp32 vs bf16 elementwise FMA chains
     (is packed-bf16 2x real on this chip?)
  B. the current formulation: upcast slab -> 37 shifted-slice taps, fp32
  C. bf16 tap arithmetic (no upcast), fp32 accumulation every pair
  D. pure bf16 taps + bf16 accumulate
  E. MXU banded matmul for the z-derivative (bf16 x bf16 -> fp32,
     lane-blocked 128x128 band matrices), x/y taps on VPU

Usage: python experiments/so12_probe.py [--n 512] [--so 12]
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(f, *args, iters=30):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def fd_weights_2nd(so):
    """Symmetric 2nd-derivative weights, taps -so/2..so/2 (fp64)."""
    import sympy
    h = so // 2
    xs = list(range(-h, h + 1))
    # standard central weights via sympy finite_diff_weights
    w = sympy.finite_diff_weights(2, xs, 0)[2][-1]
    return np.array([float(v) for v in w])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=512)
    ap.add_argument('--so', type=int, default=12)
    ap.add_argument('--rows', type=int, default=44)  # ~512/12 chunk rows
    args = ap.parse_args()
    n, so, rows = args.n, args.so, args.rows
    h = so // 2
    w = fd_weights_2nd(so)
    print(f'device: {jax.devices()[0].device_kind}')

    # ---- A: raw VPU FMA chains --------------------------------------
    for dt in (jnp.float32, jnp.bfloat16):
        x = jnp.ones((2048, 2048), dt)

        @jax.jit
        def chain(x):
            acc = x
            for i in range(64):
                acc = acc * np.float32(1.0001) + x
            return acc

        t = timeit(chain, x)
        ops = 2 * 64 * x.size
        print(f'A raw FMA chain {np.dtype(dt).name:9s}: {t*1e3:7.3f} ms '
              f'= {ops/t/1e12:6.2f} Tops/s')

    # chunk-shaped slab operands: rows+2h of n x n, storage bf16
    slab_shape = (rows + 2 * h, n + 2 * h, n)   # x-window, padded y, compact z
    key = jax.random.PRNGKey(0)
    slab_bf16 = jax.random.normal(key, slab_shape, jnp.float32).astype(
        jnp.bfloat16)

    def lap_taps(sl, wdt, accdt):
        """37-tap star laplacian on the interior of the slab."""
        ww = w.astype(np.float32)
        out = jnp.zeros((rows, n, n - 2 * h), accdt)
        for k in range(-h, h + 1):
            for ax, name in ((0, 'x'), (1, 'y'), (2, 'z')):
                if ax != 2 and k == 0:
                    continue  # center tap counted once (on z)
                wk = (ww[k + h] * (3 if ax == 2 and k == 0 else 1)
                      if ax == 2 and k == 0 else ww[k + h])
                sl_x = slice(h + (k if ax == 0 else 0),
                             h + (k if ax == 0 else 0) + rows)
                sl_y = slice(h + (k if ax == 1 else 0),
                             h + (k if ax == 1 else 0) + n)
                sl_z = slice(h + (k if ax == 2 else 0),
                             h + (k if ax == 2 else 0) + n - 2 * h)
                tap = sl[sl_x, sl_y, sl_z].astype(wdt)
                out = out + (np.array(wk, wdt) * tap).astype(accdt)
        return out

    # ---- B: current formulation (upcast slab, fp32 taps) -------------
    @jax.jit
    def formB(sl):
        return lap_taps(sl.astype(jnp.float32), jnp.float32, jnp.float32)

    # ---- C: bf16 taps, fp32 accumulate --------------------------------
    @jax.jit
    def formC(sl):
        return lap_taps(sl, jnp.bfloat16, jnp.float32)

    # ---- D: pure bf16 --------------------------------------------------
    @jax.jit
    def formD(sl):
        return lap_taps(sl, jnp.bfloat16, jnp.bfloat16).astype(jnp.float32)

    pts = rows * n * (n - 2 * h)
    for nm, f in (('B fp32 taps (upcast slab)', formB),
                  ('C bf16 taps fp32 acc     ', formC),
                  ('D bf16 taps bf16 acc     ', formD)):
        t = timeit(f, slab_bf16)
        print(f'{nm}: {t*1e3:7.3f} ms  '
              f'({pts/t/1e9:6.1f} Gpts/s slab rate)')

    # ---- E: MXU banded matmul for the z-derivative --------------------
    # out[..., z] = sum_k w[k] u[..., z+k]  ==  u_pad @ B  with B banded
    # (nz+2h, nz). Feed the MXU bf16 x bf16 -> fp32.
    nz = n
    B = np.zeros((nz + 2 * h, nz), np.float32)
    for k in range(-h, h + 1):
        for z in range(nz):
            B[z + k + h, z] = w[k + h]
    B_bf = jnp.asarray(B, jnp.bfloat16)
    slab_zpad = jax.random.normal(key, (rows, n, nz + 2 * h),
                                  jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def formE(sl, Bm):
        return jax.lax.dot_general(
            sl, Bm, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    t = timeit(formE, slab_zpad, B_bf)
    ptsE = rows * n * nz
    print(f'E MXU banded z-matmul     : {t*1e3:7.3f} ms  '
          f'({ptsE/t/1e9:6.1f} Gpts/s slab rate, full {nz}x{nz} band)')

    # E2: same but only the band blocks (3 shifted 128-blocks) — emulate
    # a block-banded contraction cost
    Bblk = jnp.asarray(B[:384, :128], jnp.bfloat16)

    @jax.jit
    def formE2(sl, Bm):
        outs = []
        for zb in range(0, nz, 128):
            win = jax.lax.dynamic_slice_in_dim(sl, zb, 384, axis=2)
            outs.append(jax.lax.dot_general(
                win, Bm, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        return jnp.concatenate(outs, axis=2)

    t = timeit(formE2, slab_zpad, Bblk)
    print(f'E2 MXU block-banded       : {t*1e3:7.3f} ms  '
          f'({ptsE/t/1e9:6.1f} Gpts/s slab rate)')

    # numerics check C vs B
    rb = formB(slab_bf16)
    rc = formC(slab_bf16)
    rd = formD(slab_bf16)
    print('C vs B max rel err:',
          float(jnp.max(jnp.abs(rc - rb)) / jnp.max(jnp.abs(rb))))
    print('D vs B max rel err:',
          float(jnp.max(jnp.abs(rd - rb)) / jnp.max(jnp.abs(rb))))


if __name__ == '__main__':
    main()
