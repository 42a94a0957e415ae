"""Probe 8: XLA-path layout + flop experiments for the damped acoustic
SO=8 step (the headline bench config), all on the stacked modulo-row
formulation the shipped executor uses.

Variants:
  cur        — shipped layout: buffers (3, 272, 272, 384) (z halo 8+8
               padded to 384 lanes), interior val + hoisted zero strips
               concat -> full-lane DUS.
  fact       — same layout, symmetric-pair factored weights
               (w*(u[+k]+u[-k]) instead of w*u[+k] + w*u[-k]).
  zfree      — z-halo-free: buffers (3, 272, 272, 256); z taps are
               slice+zero-concat shifts (halo is provably zero), writes
               naturally full-lane. 384->256 lanes = 1.5x less traffic.
  zfree_fact — zfree + factored weights.
  allfree    — no halo anywhere: (3, 256, 256, 256); every tap is a
               zero-concat shift.
  allfree_fact

Run: python experiments/stencil_probe8.py <variant> [steps]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

N, H, R = 256, 8, 4
W = [-205.0 / 72, 8.0 / 5, -1.0 / 5, 8.0 / 315, -1.0 / 560]
DT2 = 100.0
ISP2 = 1.0 / 100.0  # 1/h^2


def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf[tuple(0 for _ in leaf.shape)])


def shiftz(a, k):
    """z-shifted view of a with zero fill (halo-free z layout)."""
    if k == 0:
        return a
    z = a.shape[-1]
    zeros = jnp.zeros(a.shape[:-1] + (abs(k),), a.dtype)
    if k > 0:
        return jnp.concatenate([a[..., k:], zeros], axis=-1)
    return jnp.concatenate([zeros, a[..., :z + k]], axis=-1)


def shift_axis(a, k, axis):
    if k == 0:
        return a
    n = a.shape[axis]
    pad = list(a.shape)
    pad[axis] = abs(k)
    zeros = jnp.zeros(pad, a.dtype)
    idx = [slice(None)] * a.ndim
    if k > 0:
        idx[axis] = slice(k, n)
        return jnp.concatenate([a[tuple(idx)], zeros], axis=axis)
    idx[axis] = slice(0, n + k)
    return jnp.concatenate([zeros, a[tuple(idx)]], axis=axis)


def make_step(variant):
    fact = variant.endswith('fact')
    hoist = 'hoist' in variant
    zpad = 'zpad' in variant
    compact = 'compact' in variant
    allpad = 'allpad' in variant
    if allpad:
        ZA = XA = YA = N
        zoff = 0
    elif variant.startswith('zfree') or zpad:
        ZA = N
        XA = YA = N + 2 * H
        zoff = 0
    elif variant.startswith('allfree'):
        ZA = XA = YA = N
        zoff = 0
    else:
        ZA = 384
        XA = YA = N + 2 * H
        zoff = H

    halox = XA != N

    vp = jnp.full((XA, YA, ZA), 1.5, jnp.float32)
    damp = jnp.zeros((XA, YA, ZA), jnp.float32)
    u = jnp.zeros((3, XA, YA, ZA), jnp.float32)
    u = u.at[:, XA // 2, YA // 2, ZA // 2].set(0.01)

    def interior(a):
        if halox:
            return a[H:H + N, H:H + N, zoff:zoff + N] if zoff or ZA != N \
                else a[H:H + N, H:H + N, :]
        return a

    def tap(a, dx, dy, dz):
        """a is the staged row (XA, YA, ZA); return interior-shaped tap."""
        if a.shape == (N + 2 * H,) * 3:  # fully padded staged row
            return a[H + dx:H + dx + N, H + dy:H + dy + N,
                     H + dz:H + dz + N]
        if halox:
            if zoff or a.shape[-1] == N + 2 * H:  # full halo: pure slicing
                zo = zoff if zoff else H
                return a[H + dx:H + dx + N, H + dy:H + dy + N,
                         zo + dz:zo + dz + N]
            # x/y halo by slicing, z by zero-shift
            v = a[H + dx:H + dx + N, H + dy:H + dy + N, :]
            return shiftz(v, dz)
        # allfree: zero-shift every axis
        v = shift_axis(a, dx, 0)
        v = shift_axis(v, dy, 1)
        return shiftz(v, dz)

    def lap_of(u0r):
        ut0 = tap(u0r, 0, 0, 0)
        if fact:
            lap = (3.0 * W[0]) * ut0
            for k in range(1, R + 1):
                s = (tap(u0r, k, 0, 0) + tap(u0r, -k, 0, 0)
                     + tap(u0r, 0, k, 0) + tap(u0r, 0, -k, 0)
                     + tap(u0r, 0, 0, k) + tap(u0r, 0, 0, -k))
                lap += W[k] * s
        else:
            lap = (3.0 * W[0]) * ut0
            for k in range(1, R + 1):
                lap += (W[k] * tap(u0r, k, 0, 0) + W[k] * tap(u0r, -k, 0, 0)
                        + W[k] * tap(u0r, 0, k, 0) + W[k] * tap(u0r, 0, -k, 0)
                        + W[k] * tap(u0r, 0, 0, k) + W[k] * tap(u0r, 0, 0, -k))
        return lap * ISP2, ut0

    def rhs(u0r, u1r, vpc, dpc):
        lap, ut0 = lap_of(u0r)
        u1 = u1r if not halox else interior(u1r)
        m = 1.0 / (vpc * vpc)
        a = m * DT2
        b = dpc * 5.0
        return ((2.0 * a) * ut0 - (a - b) * u1 + lap) / (a + b)

    def rhs_hoisted(u0r, u1r, c1, c2, c3):
        lap, ut0 = lap_of(u0r)
        u1 = u1r if not halox else interior(u1r)
        return (c1 * ut0 - c2 * u1 + lap) * c3

    if compact:
        vpc = interior(vp) if halox else vp
        dpc = interior(damp) if halox else damp
        # re-materialize as standalone compact (N,N,N) arrays
        vpc = vpc + 0.0
        dpc = dpc + 0.0
    else:
        vpc = interior(vp)
        dpc = interior(damp)

    if hoist:
        m = 1.0 / (vpc * vpc)
        a = m * DT2
        b = dpc * 5.0
        c1 = 2.0 * a
        c2 = a - b
        c3 = 1.0 / (a + b)

    nslots = 2 if 'slot2' in variant else 3
    if nslots == 2:
        u = u[:2]

    def step(i, buf):
        r0 = jnp.mod(i, nslots).astype(jnp.int32)
        r1 = jnp.mod(i + nslots - 1, nslots).astype(jnp.int32)
        rw = jnp.mod(i + 1, nslots).astype(jnp.int32)
        u0r = jax.lax.dynamic_index_in_dim(buf, r0, 0, keepdims=False)
        u1r = jax.lax.dynamic_index_in_dim(buf, r1, 0, keepdims=False)
        if allpad:
            u0r = jnp.pad(u0r, ((H, H), (H, H), (H, H)))
        elif zpad:
            u0r = jnp.pad(u0r, ((0, 0), (0, 0), (H, H)))
        if hoist:
            val = rhs_hoisted(u0r, u1r, c1, c2, c3)
        else:
            val = rhs(u0r, u1r, vpc, dpc)
        if halox:
            if zoff:  # concat zero strips to full lanes (hoisted-strip analog)
                zl = jnp.zeros((N, N, zoff), jnp.float32)
                zr = jnp.zeros((N, N, ZA - zoff - N), jnp.float32)
                val = jnp.concatenate([zl, val, zr], axis=-1)
            starts = (rw, np.int32(H), np.int32(H), np.int32(0))
        else:
            starts = (rw, np.int32(0), np.int32(0), np.int32(0))
        return jax.lax.dynamic_update_slice(buf, val[None], starts)

    if 'shadow' in variant:
        # padded shadow of the latest-written row rides the carry in VMEM:
        # no HBM staging read at all; next step pads val VMEM->VMEM
        assert zpad and hoist

        def step_shadow(i, carry):
            buf, P = carry
            r1 = jnp.mod(i + nslots - 1, nslots).astype(jnp.int32)
            rw = jnp.mod(i + 1, nslots).astype(jnp.int32)
            u1r = jax.lax.dynamic_index_in_dim(buf, r1, 0, keepdims=False)
            val = rhs_hoisted(P, u1r, c1, c2, c3)
            starts = (rw, np.int32(H), np.int32(H), np.int32(0))
            buf = jax.lax.dynamic_update_slice(buf, val[None], starts)
            P2 = jnp.pad(val, ((H, H), (H, H), (H, H)))
            return (buf, P2)

        @jax.jit
        def run_shadow(buf, nsteps):
            r0 = jnp.mod(0, nslots).astype(jnp.int32)
            u0r = jax.lax.dynamic_index_in_dim(buf, r0, 0, keepdims=False)
            P0 = jnp.pad(u0r, ((0, 0), (0, 0), (H, H)))
            buf, P = jax.lax.fori_loop(0, nsteps, step_shadow, (buf, P0))
            return buf

        return run_shadow, u

    @jax.jit
    def run(buf, nsteps):
        return jax.lax.fori_loop(0, nsteps, step, buf)

    return run, u


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else 'cur'
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    run, u = make_step(variant)
    n = jnp.int32(steps)
    r = run(u, n)
    _sync(r)
    t0 = time.perf_counter()
    r = run(u, n)
    _sync(r)
    dt = (time.perf_counter() - t0) / steps
    print(f"{variant}: {dt*1e3:.3f} ms/step -> "
          f"{N**3/dt/1e9:.2f} GPts/s", flush=True)


if __name__ == '__main__':
    main()
