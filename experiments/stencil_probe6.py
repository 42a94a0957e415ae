"""Probe 6: find the winning v5e kernel design for the 256^3 SO=8 acoustic
step (round-2 perf push).

Questions answered on real hardware:
  P1  HBM copy roofline for the padded buffer shapes we use.
  P2  Are lane-misaligned DMAs (z offset 8) supported, and at what speed?
  P3  GPts/s of an in-place (input_output_aliases) x-sliding Pallas kernel
      that writes the target buffer directly (no DUS in the executor),
      for combinations of: input z window (272 vs 384 lanes), output mode
      (full-z rows with zeroed halo lanes vs misaligned interior write).

Run:  python experiments/stencil_probe6.py [t0]
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 256
H = 8          # allocated halo per side
R = 4          # stencil radius (SO=8 second derivative)
ZA = 384       # lane-aligned z allocation (272 -> 384)
NY = N + 2 * H  # 272
DT = 0.1
HSP = 10.0

W = [-205.0 / 72, 8.0 / 5, -1.0 / 5, 8.0 / 315, -1.0 / 560]


def _sync(r):
    """Force real completion: through the remote tunnel block_until_ready
    alone does not guarantee execution finished — fetch a scalar."""
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf[tuple(0 for _ in leaf.shape)])


def timeit(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        r = fn(*args)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0) / iters, r


def p1_copy_roofline():
    x = jnp.ones((NY, NY, ZA), jnp.float32)

    @jax.jit
    def cp(a):
        return a + 1.0

    dt, _ = timeit(cp, x, iters=10)
    nbytes = x.size * 4 * 2
    print(f"P1 read+write full padded buffer: {dt*1e3:.3f} ms "
          f"-> {nbytes/dt/1e9:.1f} GB/s")


def p2_misaligned_dma():
    """HBM->VMEM and VMEM->HBM DMAs with lane offset 8."""
    src = jnp.arange(NY * NY * ZA, dtype=jnp.float32).reshape(NY, NY, ZA)

    def mk(zoff, zlen, label):
        def kernel(s_ref, o_ref, win, sem, osem):
            dma = pltpu.make_async_copy(
                s_ref.at[pl.ds(0, 64), pl.ds(8, 256), pl.ds(zoff, zlen)],
                win, sem)
            dma.start()
            dma.wait()
            od = pltpu.make_async_copy(
                win, o_ref.at[pl.ds(0, 64), pl.ds(8, 256), pl.ds(zoff, zlen)],
                osem)
            od.start()
            od.wait()

        f = pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((NY, NY, ZA), jnp.float32),
            scratch_shapes=[pltpu.VMEM((64, 256, zlen), jnp.float32),
                            pltpu.SemaphoreType.DMA(()),
                            pltpu.SemaphoreType.DMA(())],
        )
        try:
            dt, out = timeit(jax.jit(lambda a: f(a)), src, iters=10)
            nb = 64 * 256 * zlen * 4 * 4  # r+w on both DMAs
            ok = bool(jnp.allclose(out[0:64, 8:264, zoff:zoff + zlen],
                                   src[0:64, 8:264, zoff:zoff + zlen]))
            print(f"P2 {label}: {dt*1e3:.3f} ms ({nb/dt/1e9:.1f} GB/s) "
                  f"correct={ok}")
        except Exception as e:
            print(f"P2 {label}: FAILED - {str(e)[:160]}")

    mk(0, 256, "aligned   z[0:256)")
    mk(8, 256, "misaligned z[8:264)")
    mk(0, 272, "aligned   z[0:272) partial-tile len")


def make_step(t0, zin_full, out_mode, taps='full'):
    """Build the in-place pallas step.

    zin_full: True -> window DMAs read z [0:384); False -> z [0:272) for
              u_t and misaligned z [8-R:264+R)=[4:268) for others... we
              keep it simple: u_t z[0:272), others z[8:264+0)? others need
              only interior z minus nothing: [8:264). Misaligned.
    out_mode: 'fullz' (write rows y[0:272) z[0:384) with halo lanes zeroed
              outside the region, y halo rows zeroed too)
              'interior' (write y[8:264) z[8:264) misaligned DMA)
    """
    nxt = N // t0
    ZIN = ZA if zin_full else NY          # u_t window z extent
    zoff_in = 0
    # secondary streams: interior z only when allowed
    if zin_full:
        Z2, z2off = ZA, 0
    else:
        Z2, z2off = N, H                  # misaligned read [8:264)

    def kernel(ut_hbm, utm1_hbm, vp_hbm, damp_hbm, tp_hbm, out_hbm,
               ut_w, u1_w, vp_w, dp_w, out_w, sems, osems):
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)
        nslot = jax.lax.rem(i + 1, 2)

        def _out_dst(ti):
            x0 = H + ti * t0
            if out_mode == 'fullz':
                return out_hbm.at[pl.ds(x0, t0)]
            return out_hbm.at[pl.ds(x0, t0), pl.ds(H, N), pl.ds(H, N)]

        def in_dmas(ti, s):
            x0 = H + ti * t0
            yield pltpu.make_async_copy(
                ut_hbm.at[pl.ds(x0 - R, t0 + 2 * R), pl.ds(0, NY),
                          pl.ds(zoff_in, ZIN)],
                ut_w.at[s], sems.at[s, 0])
            for k, (hbm, w) in enumerate(((utm1_hbm, u1_w), (vp_hbm, vp_w),
                                          (damp_hbm, dp_w))):
                # full y rows: each x-row is one contiguous HBM chunk
                # (y-offset slices fragment the DMA into tiny segments)
                yield pltpu.make_async_copy(
                    hbm.at[pl.ds(x0, t0), pl.ds(0, NY), pl.ds(z2off, Z2)],
                    w.at[s], sems.at[s, k + 1])

        @pl.when(i == 0)
        def _():
            for d in in_dmas(0, 0):
                d.start()

        @pl.when(i + 1 < nxt)
        def _():
            for d in in_dmas(i + 1, nslot):
                d.start()

        for d in in_dmas(i, slot):
            d.wait()

        # wait for the out DMA issued two steps ago on this slot
        @pl.when(i >= 2)
        def _():
            pltpu.make_async_copy(out_w.at[slot], _out_dst(i - 2),
                                  osems.at[slot]).wait()

        def at3(wref, dx, dy, dz):
            # u_t access with stencil offset, in window coords
            return wref[slot, pl.ds(R + dx, t0),
                        pl.ds(H + dy, N), pl.ds(H - zoff_in + dz, N)]

        ut0 = at3(ut_w, 0, 0, 0)
        lap = (3.0 * W[0]) * ut0
        if taps != 'none':
            for k in range(1, R + 1):
                wk = W[k]
                terms = at3(ut_w, 0, 0, k) + at3(ut_w, 0, 0, -k)
                if taps == 'full':
                    terms = (terms + at3(ut_w, k, 0, 0) + at3(ut_w, -k, 0, 0)
                             + at3(ut_w, 0, k, 0) + at3(ut_w, 0, -k, 0))
                lap += wk * terms
        lap = lap * (1.0 / (HSP * HSP))

        if zin_full:
            u1 = u1_w[slot, :, H:H + N, H:H + N]
            vp = vp_w[slot, :, H:H + N, H:H + N]
            dp = dp_w[slot, :, H:H + N, H:H + N]
        else:
            u1 = u1_w[slot, :, H:H + N, :]
            vp = vp_w[slot, :, H:H + N, :]
            dp = dp_w[slot, :, H:H + N, :]
        m = 1.0 / (vp * vp)
        a = m * (1.0 / (DT * DT))
        b = dp * (0.5 / DT)
        val = ((2.0 * a) * ut0 - (a - b) * u1 + lap) / (a + b)

        if out_mode == 'fullz':
            @pl.when(i < 2)
            def _():
                out_w[slot] = jnp.zeros_like(out_w[slot])
            out_w[slot, :, H:H + N, H:H + N] = val
        else:
            out_w[slot] = val

        od = pltpu.make_async_copy(out_w.at[slot], _out_dst(i),
                                   osems.at[slot])
        od.start()

        # drain on the final step
        @pl.when(i == nxt - 1)
        def _():
            @pl.when(nxt >= 2)
            def _():
                pltpu.make_async_copy(out_w.at[nslot], _out_dst(i - 1),
                                      osems.at[nslot]).wait()
            pltpu.make_async_copy(out_w.at[slot], _out_dst(i),
                                  osems.at[slot]).wait()

    if out_mode == 'fullz':
        ow = pltpu.VMEM((2, t0, NY, ZA), jnp.float32)
    else:
        ow = pltpu.VMEM((2, t0, N, N), jnp.float32)

    call = pl.pallas_call(
        kernel,
        grid=(nxt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((NY, NY, ZA), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, t0 + 2 * R, NY, ZIN), jnp.float32),
            pltpu.VMEM((2, t0, NY, Z2), jnp.float32),
            pltpu.VMEM((2, t0, NY, Z2), jnp.float32),
            pltpu.VMEM((2, t0, NY, Z2), jnp.float32),
            ow,
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )
    return call


def ref_step(ut, utm1, vp, damp):
    sl = slice(H, H + N)
    lap = (3.0 * W[0]) * ut[sl, sl, sl]
    for k in range(1, R + 1):
        lap += W[k] * (
            ut[H + k:H + k + N, sl, sl] + ut[H - k:H - k + N, sl, sl]
            + ut[sl, H + k:H + k + N, sl] + ut[sl, H - k:H - k + N, sl]
            + ut[sl, sl, H + k:H + k + N] + ut[sl, sl, H - k:H - k + N])
    lap = lap / (HSP * HSP)
    m = 1.0 / (vp[sl, sl, sl] ** 2)
    a = m / (DT * DT)
    b = damp[sl, sl, sl] * 0.5 / DT
    return ((2.0 * a) * ut[sl, sl, sl] - (a - b) * utm1[sl, sl, sl]
            + lap) / (a + b)


def p3_kernel(t0):
    key = jax.random.PRNGKey(0)
    ut = jnp.zeros((NY, NY, ZA), jnp.float32)
    ut = ut.at[H:H + N, H:H + N, H:H + N].set(
        jax.random.normal(key, (N, N, N)) * 0.01)
    utm1 = ut * 0.95
    vp = jnp.full((NY, NY, ZA), 1.5, jnp.float32)
    damp = jnp.zeros((NY, NY, ZA), jnp.float32)
    tgt = jnp.zeros((NY, NY, ZA), jnp.float32)

    want = ref_step(ut, utm1, vp, damp)

    for tt0 in (t0, 2 * t0):
        for taps in ('none', 'z', 'full'):
            label = f"t0={tt0} taps={taps}"
            check = taps == 'full'
            try:
                call = make_step(tt0, True, 'fullz', taps)

                @jax.jit
                def onestep(a, b, c, d, e):
                    return call(a, b, c, d, e)

                err = 0.0
                if check:
                    out = onestep(ut, utm1, vp, damp, tgt)
                    got = out[H:H + N, H:H + N, H:H + N]
                    err = float(jnp.max(jnp.abs(got - want)))

                # steady-state loop timing with slot rotation
                @jax.jit
                def loop(s0, s1, s2, c, d):
                    def body(i, carry):
                        a, b, t = carry
                        newt = call(a, b, c, d, t)
                        return (newt, a, b)
                    return jax.lax.fori_loop(0, 32, body, (s0, s1, s2))

                dt, _ = timeit(loop, ut, utm1, tgt, vp, damp, iters=3)
                gpts = N ** 3 * 32 / dt / 1e9
                print(f"P3 {label}: max|err|={err:.2e}  {gpts:.2f} GPts/s")
            except Exception as e:
                print(f"P3 {label}: FAILED - {str(e)[:200]}")


if __name__ == '__main__':
    t0 = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    print("device:", jax.devices()[0])
    p1_copy_roofline()
    p2_misaligned_dma()
    p3_kernel(t0)
