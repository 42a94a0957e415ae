"""Probe 12: rolling-buffer formulation for the damped acoustic SO=8
step — stacked modulo rows + dynamic slice/update (shipped r2/r3
executor) vs separate per-row loop carries rotated by position.

Motivation (PERF_NOTES 'Known remaining headroom'): the shipped per-step
HLO stages u[t] out of the stacked (3, ...) buffer into an HBM copy
(~0.15 ms/step avoidable traffic at 256^3 fp32). With each time row a
SEPARATE while-loop carry, the rotation (prev, cur) -> (cur, new) is a
buffer swap XLA resolves at aliasing level: no dynamic_slice staging, no
DUS — the stencil fusion reads the carries directly.

Variants:
  dus — stacked (3, X, Y, Zc) z-compact rows, modulo dynamic index +
        dynamic_update_slice (mirror of the shipped executor's layout).
  rot — two carried rows (read prev/cur), write materializes the new
        row via jnp.pad; carry rotation by position.

Run: python experiments/stencil_probe12.py <variant> [steps]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

N, H, R = 256, 8, 4
W = [-205.0 / 72, 8.0 / 5, -1.0 / 5, 8.0 / 315, -1.0 / 560]
DT2 = 100.0
ISP2 = 1.0 / 100.0

XA = YA = N + 2 * H   # x/y halos stored
ZA = N                # z-compact: halo synthesized in-fusion


def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf[tuple(0 for _ in leaf.shape)])


def make(variant):
    vp = jnp.full((N, N, N), 1.5, jnp.float32)
    damp = jnp.zeros((N, N, N), jnp.float32)
    m = 1.0 / (vp * vp)
    a = m * DT2
    b = damp * 5.0
    c1 = 2.0 * a
    c2 = a - b
    c3 = 1.0 / (a + b)

    def tap(u0z, dx, dy, dz):
        # u0z: (XA, YA, N + 2H) — z halo already synthesized
        return u0z[H + dx:H + dx + N, H + dy:H + dy + N,
                   H + dz:H + dz + N]

    def rhs(u0row, u1row):
        """u0row/u1row: (XA, YA, ZA) stored rows; returns interior val."""
        u0z = jnp.pad(u0row, ((0, 0), (0, 0), (H, H)))
        ut0 = tap(u0z, 0, 0, 0)
        lap = (3.0 * W[0]) * ut0
        for k in range(1, R + 1):
            lap += (W[k] * tap(u0z, k, 0, 0) + W[k] * tap(u0z, -k, 0, 0)
                    + W[k] * tap(u0z, 0, k, 0) + W[k] * tap(u0z, 0, -k, 0)
                    + W[k] * tap(u0z, 0, 0, k) + W[k] * tap(u0z, 0, 0, -k))
        lap = lap * ISP2
        u1 = u1row[H:H + N, H:H + N, :]
        return (c1 * ut0 - c2 * u1 + lap) * c3

    u_init = np.zeros((3, XA, YA, ZA), np.float32)
    u_init[:, XA // 2, YA // 2, ZA // 2] = 0.01
    u_init = jnp.asarray(u_init)

    if variant == 'dus':
        def step(i, buf):
            r0 = jnp.mod(i, 3).astype(jnp.int32)
            r1 = jnp.mod(i + 2, 3).astype(jnp.int32)
            rw = jnp.mod(i + 1, 3).astype(jnp.int32)
            u0row = jax.lax.dynamic_index_in_dim(buf, r0, 0, keepdims=False)
            u1row = jax.lax.dynamic_index_in_dim(buf, r1, 0, keepdims=False)
            val = rhs(u0row, u1row)
            starts = (rw, np.int32(H), np.int32(H), np.int32(0))
            return jax.lax.dynamic_update_slice(buf, val[None], starts)

        @jax.jit
        def run(state, nsteps):
            return jax.lax.fori_loop(0, nsteps, step, state)

        return run, u_init

    assert variant == 'rot'

    def step(i, carry):
        uprev, ucur = carry
        val = rhs(ucur, uprev)
        unew = jnp.pad(val, ((H, H), (H, H), (0, 0)))
        return (ucur, unew)

    @jax.jit
    def run(state, nsteps):
        uprev, ucur = state[2], state[0]
        out = jax.lax.fori_loop(0, nsteps, step, (uprev, ucur))
        return jnp.stack([out[0], out[1], out[1]])

    return run, u_init


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else 'rot'
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    run, u = make(variant)
    r = run(u, 4)
    _sync(r)
    t0 = time.perf_counter()
    r = run(u, steps)
    _sync(r)
    t1 = time.perf_counter()
    per = (t1 - t0) / steps
    print(f"{variant}: {per * 1e3:.3f} ms/step "
          f"({N ** 3 * 1e-9 / per:.2f} GPts/s)")


if __name__ == '__main__':
    main()
