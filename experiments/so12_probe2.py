#!/usr/bin/env python
"""SO=12 probe, take 2: DEVICE-TRACE timing (the tunnel lies to
block_until_ready — see bench.py docstring / PERF_NOTES).

Each variant runs ITERS times under jax.profiler.trace; the per-call
period comes from the median gap between successive firings of its XLA
ops on the device timeline (bench.parse_trace_period).
"""
import os
import shutil
import sys
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import parse_trace_period  # noqa: E402

ITERS = 24


def trace_time(f, *args):
    r = f(*args)          # compile
    jax.block_until_ready(r)
    tdir = tempfile.mkdtemp(prefix='so12p_')
    try:
        with jax.profiler.trace(tdir):
            for _ in range(ITERS):
                r = f(*args)
            np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]  # real sync
        period = parse_trace_period(tdir, ITERS)
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
    return period


def fd_weights_2nd(so):
    import sympy
    h = so // 2
    w = sympy.finite_diff_weights(2, list(range(-h, h + 1)), 0)[2][-1]
    return np.array([float(v) for v in w])


def main():
    n, so, rows = 512, 12, 44
    h = so // 2
    w = fd_weights_2nd(so)
    print(f'device: {jax.devices()[0].device_kind}', flush=True)

    key = jax.random.PRNGKey(0)
    slab_shape = (rows + 2 * h, n + 2 * h, n)
    slab_bf16 = jax.random.normal(key, slab_shape, jnp.float32).astype(
        jnp.bfloat16)

    def lap_taps(sl, wdt, accdt):
        ww = w.astype(np.float64)
        out = None
        for k in range(-h, h + 1):
            for ax in (0, 1, 2):
                if ax != 2 and k == 0:
                    continue
                wk = ww[k + h] * (3 if (ax == 2 and k == 0) else 1)
                sl_x = slice(h + (k if ax == 0 else 0),
                             h + (k if ax == 0 else 0) + rows)
                sl_y = slice(h + (k if ax == 1 else 0),
                             h + (k if ax == 1 else 0) + n)
                sl_z = slice(h + (k if ax == 2 else 0),
                             h + (k if ax == 2 else 0) + n - 2 * h)
                tap = sl[sl_x, sl_y, sl_z].astype(wdt)
                term = (np.array(wk, wdt) * tap).astype(accdt)
                out = term if out is None else out + term
        return out

    @jax.jit
    def formB(sl):
        return lap_taps(sl.astype(jnp.float32), jnp.float32, jnp.float32)

    @jax.jit
    def formC(sl):
        return lap_taps(sl, jnp.bfloat16, jnp.float32)

    @jax.jit
    def formD(sl):
        return lap_taps(sl, jnp.bfloat16, jnp.bfloat16).astype(jnp.float32)

    pts = rows * n * (n - 2 * h)
    for nm, f, a in (('B fp32 taps', formB, slab_bf16),
                     ('C bf16 taps fp32 acc', formC, slab_bf16),
                     ('D bf16 taps bf16 acc', formD, slab_bf16)):
        t = trace_time(f, a)
        if t:
            print(f'{nm:28s}: {t*1e3:7.3f} ms ({pts/t/1e9:6.1f} Gpts/s, '
                  f'x12 chunks = {12*t*1e3:5.2f} ms/step)', flush=True)
        else:
            print(f'{nm:28s}: trace parse failed', flush=True)

    # MXU banded z-derivative
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

    t = trace_time(formE, slab_zpad, B_bf)
    ptsE = rows * n * nz
    if t:
        print(f'{"E MXU full banded z-matmul":28s}: {t*1e3:7.3f} ms '
              f'({ptsE/t/1e9:6.1f} Gpts/s)', flush=True)

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

    t = trace_time(formE2, slab_zpad, Bblk)
    if t:
        print(f'{"E2 MXU block-banded":28s}: {t*1e3:7.3f} ms '
              f'({ptsE/t/1e9:6.1f} Gpts/s)', flush=True)

    # F: full 3-axis laplacian as 3 MXU matmuls (x and y axes contract
    # over their own axis with banded matrices; z via formE)
    Bx = np.zeros((rows + 2 * h, rows), np.float32)
    for k in range(-h, h + 1):
        for i in range(rows):
            Bx[i + k + h, i] = w[k + h]
    By = np.zeros((n + 2 * h, n), np.float32)
    for k in range(-h, h + 1):
        for i in range(n):
            By[i + k + h, i] = w[k + h]
    Bx_bf = jnp.asarray(Bx, jnp.bfloat16)
    By_bf = jnp.asarray(By, jnp.bfloat16)
    slab_full = jax.random.normal(
        key, (rows + 2 * h, n + 2 * h, nz + 2 * h),
        jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def formF(sl, bx, by, bz):
        # d2x: contract axis 0 (rows+2h -> rows), keep y/z interior
        dx = jnp.einsum('iyz,ix->xyz', sl[:, h:-h, h:-h], bx,
                        preferred_element_type=jnp.float32)
        dy = jnp.einsum('xjz,jy->xyz', sl[h:-h, :, h:-h], by,
                        preferred_element_type=jnp.float32)
        dz = jnp.einsum('xyk,kz->xyz', sl[h:-h, h:-h, :], bz,
                        preferred_element_type=jnp.float32)
        return dx + dy + dz

    t = trace_time(formF, slab_full, Bx_bf, By_bf, B_bf)
    ptsF = rows * n * nz
    if t:
        print(f'{"F MXU 3-axis laplacian":28s}: {t*1e3:7.3f} ms '
              f'({ptsF/t/1e9:6.1f} Gpts/s, x12 = {12*t*1e3:5.2f} ms/step)',
              flush=True)


if __name__ == '__main__':
    main()
