"""Pallas v2 candidates, validated in interpret mode on CPU before any
TPU compile (the remote tunnel wedges on failed Mosaic compiles).

Variants:
  A  xla-DUS        (baseline, framework's XLA path)
  D  xla-conv       separable 1-D convs via conv_general_dilated
  E  pallas-nb      neighbor-block pipeline + VMEM scratch assembly
Env: MODE=cpu|tpu  N, STEPS, T
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

N = int(os.environ.get('N', 64 if MODE == 'cpu' else 128))
STEPS = int(os.environ.get('STEPS', 8 if MODE == 'cpu' else 64))
T = int(os.environ.get('T', 8))
SO = 8
H = SO // 2
W = [np.float32(w) for w in [-1/560, 8/315, -1/5, 8/5, -205/72, 8/5, -1/5,
                             8/315, -1/560]]
pad = H
NP = N + 2 * pad
ZP = ((NP + 127) // 128) * 128
shape = (NP, NP, ZP)
INTERP = MODE == 'cpu'


def lap_interior(u):
    c = slice(pad, pad + N)
    out = 0.
    for axis in range(3):
        for i, w in enumerate(W):
            k = i - H
            idx = [c, c, slice(pad, pad + N)]
            idx[axis] = slice(pad + k, pad + k + N)
            out = out + w * u[tuple(idx)]
    return out


@partial(jax.jit, donate_argnums=(0, 1))
def run_A(u0, u1, m, nsteps):
    def body(i, carry):
        up, uc = carry
        l = lap_interior(uc)
        interior = (2. * uc[pad:pad+N, pad:pad+N, pad:pad+N]
                    - up[pad:pad+N, pad:pad+N, pad:pad+N] + m * l)
        un = up.at[pad:pad+N, pad:pad+N, pad:pad+N].set(interior)
        return (uc, un)
    return jax.lax.fori_loop(0, nsteps, body, (u0, u1))


def make_conv_step():
    wk = jnp.asarray(np.array(W, np.float32))

    def conv1d(u, axis):
        # u: (NP, NP, ZP); 1-D conv along `axis`, VALID on that axis
        x = u[None, None]  # NCDHW
        kshape = [1, 1, 1, 1, 1]
        kshape[2 + axis] = len(W)
        k = wk.reshape(kshape)
        out = jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1, 1),
            padding=[(0, 0)] * 3,
            dimension_numbers=('NCDHW', 'OIDHW', 'NCDHW'))
        return out[0, 0]

    @partial(jax.jit, donate_argnums=(0, 1))
    def run_D(u0, u1, m, nsteps):
        def body(i, carry):
            up, uc = carry
            cx = conv1d(uc, 0)[:, pad:pad+N, pad:pad+N]
            cy = conv1d(uc, 1)[pad:pad+N, :, pad:pad+N]
            cz = conv1d(uc, 2)[pad:pad+N, pad:pad+N, :N]
            l = cx + cy + cz
            interior = (2. * uc[pad:pad+N, pad:pad+N, pad:pad+N]
                        - up[pad:pad+N, pad:pad+N, pad:pad+N] + m * l)
            un = up.at[pad:pad+N, pad:pad+N, pad:pad+N].set(interior)
            return (uc, un)
        return jax.lax.fori_loop(0, nsteps, body, (u0, u1))
    return run_D


def make_pallas_step():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    NT = NP // T
    assert T >= pad and NP % T == 0

    def kernel(um, u0b, up1, uprev, mref, out_ref, vstack):
        vstack[0:T] = um[...]
        vstack[T:2 * T] = u0b[...]
        vstack[2 * T:3 * T] = up1[...]

        c = slice(pad, pad + N)
        zc = slice(pad, pad + N)
        acc = None
        for i, w in enumerate(W):
            k = i - H
            t1 = w * vstack[T + k:T + k + T, c, zc]
            acc = t1 if acc is None else acc + t1
        u0c = u0b[...]
        for i, w in enumerate(W):
            k = i - H
            acc = acc + w * u0c[:, pad + k:pad + k + N, zc]
        for i, w in enumerate(W):
            k = i - H
            acc = acc + w * u0c[:, c, pad + k:pad + k + N]
        val = 2. * u0c[:, c, zc] - uprev[:, c, zc] + mref[:, c, zc] * acc
        # zero the x-halo rows of boundary tiles so the rolling halo stays 0
        i = pl.program_id(0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (T, 1, 1), 0) + i * T
        val = jnp.where((rows >= pad) & (rows < pad + N), val, 0.)
        out_ref[...] = jnp.pad(
            val, ((0, 0), (pad, NP - N - pad), (pad, ZP - N - pad)))

    def bs(d):
        return pl.BlockSpec(
            (T, NP, ZP),
            (lambda i, d=d: (jnp.clip(i + d, 0, NT - 1), 0, 0)),
            memory_space=pltpu.VMEM)

    def step(up, uc, mfull):
        return pl.pallas_call(
            kernel,
            grid=(NT,),
            in_specs=[bs(-1), bs(0), bs(1), bs(0), bs(0)],
            out_specs=pl.BlockSpec((T, NP, ZP), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NP, NP, ZP), jnp.float32),
            scratch_shapes=[pltpu.VMEM((3 * T, NP, ZP), jnp.float32)],
            interpret=INTERP,
        )(uc, uc, uc, up, mfull)

    @partial(jax.jit, donate_argnums=(0, 1))
    def run_E(u0, u1, mfull, nsteps):
        def body(i, carry):
            up, uc = carry
            un = step(up, uc, mfull)
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
    u0 = u0.at[pad:pad+N, pad:pad+N, pad:pad+N].set(
        jax.random.normal(key, (N, N, N), jnp.float32) * 1e-3)
    u1 = jnp.zeros(shape, jnp.float32)
    m = jnp.full((N, N, N), 0.2, jnp.float32)
    mfull = jnp.full(shape, 0.2, jnp.float32)

    t, outA = bench(lambda: (run_A, (u0 + 0, u1 + 0, m, STEPS)))
    print(f"A xla-DUS: {t*1e3:.1f} ms, {N**3*STEPS/t/1e9:.2f} GPts/s",
          flush=True)

    run_D = make_conv_step()
    t, outD = bench(lambda: (run_D, (u0 + 0, u1 + 0, m, STEPS)))
    print(f"D xla-conv: {t*1e3:.1f} ms, {N**3*STEPS/t/1e9:.2f} GPts/s",
          flush=True)
    errD = float(jnp.abs(outA[1] - outD[1]).max())
    print("D vs A err:", errD, flush=True)

    run_E = make_pallas_step()
    t, outE = bench(lambda: (run_E, (u0 + 0, u1 + 0, mfull, STEPS)))
    print(f"E pallas-nb T={T}: {t*1e3:.1f} ms, "
          f"{N**3*STEPS/t/1e9:.2f} GPts/s", flush=True)
    s = slice(pad + 2 * STEPS if 2 * STEPS < N // 2 else pad, pad + N)
    a = outA[1][pad:pad+N, pad:pad+N, pad:pad+N]
    e = outE[1][pad:pad+N, pad:pad+N, pad:pad+N]
    errE = float(jnp.abs(a - e).max())
    print("E vs A interior err:", errE, flush=True)


if __name__ == '__main__':
    main()
