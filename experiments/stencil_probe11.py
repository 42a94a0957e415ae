"""Per-tap streaming of CIRE-style temp buffers — carry member vs
step-local value.

TTI's u/v sections read the CIRE temporaries at ~25 shifted taps.  The
temps are recomputed every step and only read within the step, yet the
executor carries them through the fori_loop (write_names), forcing an
HBM-resident donated buffer.  This probe measures whether making the
temp a STEP-LOCAL value (not carried) lets XLA/MSA schedule it better,
at TTI-like sizes ((224, 224, 256) fp32, 3-slot stacked wavefield).

Variants:
  A  temp carried: buf.at[...].set(val) into a loop-carry buffer, taps
     as static slices (current executor structure)
  B  temp step-local: val padded to the halo'd shape inside the step,
     taps slice the local value

Usage: python experiments/stencil_probe11.py [n] [ntaps] [steps]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 208
    ntaps = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    h = 8
    shape = (n + 2 * h, n + 2 * h, 256)
    key = jax.random.PRNGKey(0)
    u0 = jax.random.normal(key, (3,) + shape, jnp.float32) * 1e-3
    c0 = jnp.zeros(shape, jnp.float32)

    r = 4
    taps = []
    for k in range(ntaps):
        ax = k % 3
        off = (k // 3) % (2 * r + 1) - r
        d = [0, 0, 0]
        d[ax] = off
        taps.append(tuple(d))
    w = [0.01 * (k + 1) for k in range(len(taps))]

    dom = (slice(h, h + n), slice(h, h + n), slice(h, h + n))
    # temp computed over a halo-extended region so taps stay valid
    ext = tuple(slice(h - r, h + n + r) for _ in range(2)) + \
        (slice(h - r, h + n + r),)

    def tapsum(arr):
        out = None
        for (dx, dy, dz), wk in zip(taps, w):
            sl = (slice(h + dx, h + dx + n), slice(h + dy, h + dy + n),
                  slice(h + dz, h + dz + n))
            v = arr[sl] * wk
            out = v if out is None else out + v
        return out

    def produce(ut):
        # first-stage derivative-ish: cheap expression over ext region
        a = ut[ext]
        return a * 1.0001 + jnp.roll(a, 1, axis=0) * 0.25

    def consume(u, t, c):
        ut = jax.lax.dynamic_index_in_dim(u, jnp.mod(t, 3), 0,
                                          keepdims=False)
        um = jax.lax.dynamic_index_in_dim(u, jnp.mod(t + 2, 3), 0,
                                          keepdims=False)
        val = tapsum(c) + 2.0 * ut[dom] - um[dom]
        row = jnp.mod(t + 1, 3)
        ut1 = jax.lax.dynamic_index_in_dim(u, row, 0, keepdims=False)
        new = jax.lax.dynamic_update_slice(
            ut1, val.astype(u.dtype), (h, h, h))
        return jax.lax.dynamic_update_slice(u, new[None], (row, 0, 0, 0))

    def step_A(t, carry):
        u, c = carry
        ut = jax.lax.dynamic_index_in_dim(u, jnp.mod(t, 3), 0,
                                          keepdims=False)
        val = produce(ut)
        c = jax.lax.dynamic_update_slice(
            c, val.astype(c.dtype), (h - r, h - r, h - r))
        return consume(u, t, c), c

    def step_B(t, carry):
        u, = carry
        ut = jax.lax.dynamic_index_in_dim(u, jnp.mod(t, 3), 0,
                                          keepdims=False)
        val = produce(ut)
        pad = [(h - r, h - r)] * 2 + [(h - r, h - r)]
        c = jnp.pad(val, pad)
        return (consume(u, t, c),)

    for label, step, carry in [('A carried temp', step_A, (u0, c0)),
                               ('B step-local temp', step_B, (u0,))]:
        @jax.jit
        def run(carry):
            return jax.lax.fori_loop(0, steps, step, carry)

        out = run(carry)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run(carry)
        jax.block_until_ready(out)
        el = time.perf_counter() - t0
        print(f"{label}: {el / steps * 1e3:.3f} ms/step", flush=True)


if __name__ == '__main__':
    main()
