"""Probe 10: z-layout strategies for NON-lane-aligned domains (n=192).

bench r2 found 192^3 runs ~3x slower per point than 128^3/256^3: 192 is
not a lane multiple, so the z-compact layout is gated off (commit
ae7e78b: compact rows of 180/212 lanes scrambled XLA layout assignment)
and the padded layout's z-offset reads cross lanes every tap.

Variants (all: stacked modulo-row so8 damped-acoustic step, 192^3):
  padded      — buffer z = 192+16 halo -> 256 lanes, taps at offset 8+k
                (the shipped fallback for 192).
  compact     — buffer z = 192 exactly (the gated-off layout; expect
                scrambled-layout slowness).
  tail        — buffer z = 256 = round_up(192,128); domain in the lane-
                aligned PREFIX, dead tail; z taps synthesized by
                pad-of-prefix-slice in VMEM; writes are full 256-lane
                rows (tail written as zeros).
  tailp       — like tail but writes only the 192-lane prefix via DUS.

Run on the chip: python experiments/stencil_probe10.py [variant] [steps]
No arg: run all variants with pair-differenced timing.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

N, H = int(os.environ.get('PROBE_N', 192)), 8
W = [-205.0 / 72, 8.0 / 5, -1.0 / 5, 8.0 / 315, -1.0 / 560]
C = 0.1


def shiftz_prefix(a, k, n):
    """z tap at offset k of the domain living in a[..., :n], zero halo."""
    row = a[..., :n]
    if k == 0:
        return row
    zeros = jnp.zeros(row.shape[:-1] + (abs(k),), a.dtype)
    if k > 0:
        return jnp.concatenate([row[..., k:], zeros], axis=-1)
    return jnp.concatenate([zeros, row[..., :n + k]], axis=-1)


def _round_up(v, q):
    return -(-v // q) * q


def make_step(variant):
    XA = YA = N + 2 * H
    if variant == 'padded':
        ZA, zoff = _round_up(N + 2 * H, 128), H
    elif variant == 'compact':
        ZA, zoff = N, 0
    else:
        ZA, zoff = _round_up(N, 128), 0

    def lap(u):
        # x/y taps: slices in the halo'd axes; z taps per variant
        acc = None
        for axis in (0, 1):
            for k in range(-H // 2, H // 2 + 1):
                w = W[abs(k)]
                if w == 0.0 and k != 0:
                    continue
                idx = [slice(H, H + N)] * 2 + [slice(zoff, zoff + N)]
                idx[axis] = slice(H + k, H + k + N)
                tap = w * u[tuple(idx)]
                acc = tap if acc is None else acc + tap
        for k in range(-H // 2, H // 2 + 1):
            w = W[abs(k)]
            if w == 0.0 and k != 0:
                continue
            if variant == 'padded':
                tap = w * u[H:H + N, H:H + N, zoff + k:zoff + k + N]
            else:
                tap = w * shiftz_prefix(u[H:H + N, H:H + N, :], k, N)
            acc = acc + tap
        return acc

    def step(t, buf):
        cur = jax.lax.dynamic_index_in_dim(buf, jnp.mod(t, 3), 0,
                                           keepdims=False)
        prev = jax.lax.dynamic_index_in_dim(buf, jnp.mod(t + 2, 3), 0,
                                            keepdims=False)
        if variant == 'padded':
            pc = prev[H:H + N, H:H + N, zoff:zoff + N]
        else:
            pc = prev[H:H + N, H:H + N, :N]
        val = (2.0 * (cur[H:H + N, H:H + N, zoff:zoff + N]
                      if variant == 'padded'
                      else cur[H:H + N, H:H + N, :N])
               - pc + C * lap(cur))
        if variant == 'tail':
            val = jnp.concatenate(
                [val, jnp.zeros(val.shape[:-1] + (ZA - N,), val.dtype)],
                axis=-1)
            zlen = ZA
        else:
            zlen = N
        nxt = jax.lax.dynamic_index_in_dim(buf, jnp.mod(t + 1, 3), 0,
                                           keepdims=False)
        nxt = jax.lax.dynamic_update_slice(
            nxt, val, (np.int32(H), np.int32(H), np.int32(zoff)))
        return jax.lax.dynamic_update_slice_in_dim(
            buf, nxt[None], jnp.mod(t + 1, 3), 0)

    shape = (3, XA, YA, ZA)

    @jax.jit
    def run(buf, t0, k):
        return jax.lax.fori_loop(
            t0, t0 + k, lambda t, b: step(t, b), buf)

    return shape, run


def time_variant(variant, k1=32, k2=160):
    shape, run = make_step(variant)
    key = jax.random.PRNGKey(0)
    buf = jax.random.normal(key, shape, jnp.float32) * 1e-3
    run(buf, np.int32(0), np.int32(2))  # compile + warm
    _ = float(np.asarray(run(buf, np.int32(0), np.int32(2))[0, 50, 50, 50]))
    ests = []
    for _ in range(3):
        ts = []
        for k in (k1, k2):
            t0 = time.perf_counter()
            out = run(buf, np.int32(0), np.int32(k))
            _ = float(np.asarray(out[0, 50, 50, 50]))
            ts.append(time.perf_counter() - t0)
        if ts[1] > ts[0]:
            ests.append((ts[1] - ts[0]) / (k2 - k1))
    per = float(np.median(ests)) if ests else float('nan')
    gpts = N ** 3 / per / 1e9
    print(f"{variant:10s} {per * 1e3:8.3f} ms/step  {gpts:7.2f} GPts/s",
          flush=True)
    return per


def main():
    variants = [sys.argv[1]] if len(sys.argv) > 1 else \
        ['padded', 'tail', 'tailp', 'compact']
    for v in variants:
        time_variant(v)


if __name__ == '__main__':
    main()
