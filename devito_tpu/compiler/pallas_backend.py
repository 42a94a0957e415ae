"""Pallas stencil backend: lower a dense LoweredEq to a TPU kernel.

This is the TPU-native replacement for the reference's optimized generated
stencil loops (blocking + OpenMP/SIMD, devito/passes/clusters/blocking.py +
Ompizer): the write region is tiled over a (x[,y]) grid with z innermost
fully resident; each tile DMAs halo'd input windows HBM->VMEM explicitly
(the VMEM analog of cache blocking), evaluates the whole fused RHS on the
VPU, and writes a disjoint output tile.

Falls back to the XLA slice path (translate.DenseCtx) when the eq shape
does not fit the kernelizable pattern; `interpret=True` is used off-TPU so
the same lowering is test-covered on CPU.
"""

from collections import OrderedDict

import numpy as np
import sympy

from ..ir.lowering import time_access_of, space_offsets_of
from ..types.basic import AbstractFunction, retrieve_functions
from ..types.dimension import Dimension
from ..parameters import configuration
from ..logger import debug

__all__ = ['PallasPlan', 'plan_for', 'execute_plan']

# VMEM budget for input windows (bytes); leave room for output + pipeline
_VMEM_BUDGET = 10 * 1024 * 1024

# Autotuner override: (t0,) for 2D or (t0, t1) for 3D; None = defaults
# (reference analog: the block-shape search in core/autotuning.py)
_tile_override = None


def set_tile_override(tiles):
    global _tile_override
    _tile_override = tiles


_backend_ok = None


def validate_backend(interpret=False):
    """Eagerly compile+run a miniature kernel with the same structure
    (ANY->VMEM halo DMA, blocked output) on the current backend; disable
    the Pallas path for the session if Mosaic rejects it."""
    global _backend_ok
    if _backend_ok is not None:
        return _backend_ok
    try:
        import jax
        import jax.numpy as jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        H, T, NZ, ZP = 2, 4, 16, 128

        def kernel(src, out_ref, scratch, sem):
            i = pl.program_id(0)
            cp = pltpu.make_async_copy(
                src.at[pl.ds(i * T, T + 2 * H),
                       pl.ds(0, T + 2 * H), :],
                scratch, sem)
            cp.start()
            cp.wait()
            val = (scratch[H:-H, H:-H, H:H + NZ]
                   + scratch[H + 1:H + 1 + T, H:-H,
                             H + 1:H + 1 + NZ])
            out_ref[...] = jnp.pad(val, ((0, 0), (0, 0), (0, ZP - NZ)))

        x = jnp.ones((T * 2 + 2 * H, T + 2 * H, ZP), jnp.float32)
        out = pl.pallas_call(
            kernel,
            grid=(2,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((T, T, ZP), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2 * T, T, ZP), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((T + 2 * H, T + 2 * H, ZP), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(x)
        jax.block_until_ready(out)
        _backend_ok = bool(abs(float(out[0, 0, 0]) - 2.0) < 1e-6)
    except Exception as e:
        debug(f"pallas backend validation failed: {str(e)[:200]}")
        _backend_ok = False
    return _backend_ok


def _pick_tile(n, prefer):
    for t in prefer:
        if t <= n and n % t == 0:
            return t
    return None


class PallasPlan:
    """Compiled tiling plan for one dense eq."""

    def __init__(self, eq, grid_shape, tiles, groups, param_names, dtype):
        self.eq = eq
        self.grid_shape = grid_shape      # pallas grid (tiles per dim)
        self.tiles = tiles                # tile extents per tiled dim
        self.groups = groups              # list of access-group descriptors
        self.param_names = param_names
        self.dtype = dtype

    @property
    def ok(self):
        return True


def plan_for(eq, stepping_info):
    """Build a PallasPlan for a dense eq, or None if not kernelizable."""
    fn = eq.target
    if fn.grid is None:
        return None
    ndim = len(eq.region)
    if ndim not in (2, 3):
        return None
    if eq.condition is not None or eq.reduction is not None or eq.increment:
        return None
    region_shape = tuple(b - a for a, b in eq.region)

    # group accesses by their time-resolved array
    accesses = list(retrieve_functions(eq.rhs))
    groups = OrderedDict()
    for a in accesses:
        f = a.function
        if f.is_SparseFunction:
            return None
        tk, toff = time_access_of(a)
        key = (f.name, tk, toff)
        g = groups.setdefault(key, {'fn': f, 'tk': tk, 'toff': toff,
                                    'offsets': set()})
        g['offsets'].add(space_offsets_of(a))

    # symbols used outside function accesses (dims there are just indices)
    params = []
    bad = []

    def _scan(e):
        if isinstance(e, AbstractFunction):
            return
        if isinstance(e, Dimension):
            bad.append(e)
            return
        if isinstance(e, sympy.Symbol):
            params.append(e.name)
            return
        for a in getattr(e, 'args', ()):
            _scan(a)

    _scan(sympy.sympify(eq.rhs))
    if bad:
        return None  # coordinate-dependent exprs: XLA path

    # tiling: tile dim0 (and dim1 in 3D); innermost dim full
    ov = _tile_override
    if ndim == 3:
        n0, n1, n2 = region_shape
        pref0 = (ov[0],) if ov else (8, 16, 4, 2, 1)
        pref1 = (ov[1],) if ov and len(ov) > 1 else \
            (128, 64, 32, 16, 8, 4, 2, 1)
        t0 = _pick_tile(n0, pref0) or _pick_tile(n0, (8, 16, 4, 2, 1))
        t1 = _pick_tile(n1, pref1) or _pick_tile(
            n1, (128, 64, 32, 16, 8, 4, 2, 1))
        if t0 is None or t1 is None:
            return None
        tiles = (t0, t1, n2)
        grid_shape = (n0 // t0, n1 // t1)
    else:
        n0, n1 = region_shape
        pref0 = (ov[0],) if ov else (16, 8, 32, 4, 2, 1)
        t0 = _pick_tile(n0, pref0) or _pick_tile(n0, (16, 8, 32, 4, 2, 1))
        if t0 is None:
            return None
        tiles = (t0, n1)
        grid_shape = (n0 // t0,)

    # VMEM budget check for the input windows (z = full aligned alloc)
    itemsize = np.dtype(fn.dtype).itemsize
    total = 0
    for g in groups.values():
        f = g['fn']
        halo = f.halo
        win = 1
        for j in range(ndim - 1):
            hl, hr = halo[j]
            win *= tiles[j] + hl + hr
        win *= f.shape_allocated[-1]
        total += win * itemsize
    if total > _VMEM_BUDGET:
        debug(f"pallas: VMEM budget exceeded ({total} B), falling back")
        return None

    return PallasPlan(eq, grid_shape, tiles, list(groups.values()),
                      sorted(set(params)), np.dtype(fn.dtype))


class _TileCtx:
    """Translator context inside the Pallas kernel: accesses -> static
    slices of the DMA'd VMEM windows."""

    def __init__(self, plan, refs, param_refs, region):
        self.plan = plan
        self.refs = refs              # {(name, tk, toff): scratch ref}
        self.param_refs = param_refs  # {name: smem ref}
        self.region = region

    def symbol(self, sym):
        from ..exceptions import CompilationError
        name = sym.name
        if name in self.param_refs:
            return self.param_refs[name][0]
        raise CompilationError(f"Unbound symbol {name} in pallas kernel")

    def access(self, e):
        f = e.function
        tk, toff = time_access_of(e)
        ref = self.refs[(f.name, tk, toff)]
        offs = space_offsets_of(e)
        tiles = self.plan.tiles
        ndim = len(offs)
        sl = []
        for j, (off, (hl, hr)) in enumerate(zip(offs, f.halo)):
            ext = tiles[j]
            if j == ndim - 1:
                # z window is the full (aligned) allocation: absolute index
                s = hl + self.region[j][0] + off
            else:
                s = hl + off
            sl.append(slice(s, s + ext))
        return ref[tuple(sl)]


def execute_plan(plan, resolved, params, interpret):
    """Run the plan: ``resolved`` maps group index -> padded (time-resolved)
    jax array; returns the region-shaped result.

    Mosaic constraint honored here: HBM DMA windows must be 128-aligned in
    the last dim, so the z window is the function's full (lane-aligned)
    allocation and the output block is zero-padded to a lane multiple.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from .translate import translate
    from ..utils import round_up

    eq = plan.eq
    ndim = len(eq.region)
    region_start = tuple(a for a, b in eq.region)
    region_shape = tuple(b - a for a, b in eq.region)
    tiles = plan.tiles
    ngroups = len(plan.groups)
    nparams = len(plan.param_names)
    nz = region_shape[-1]
    zp_out = round_up(nz, 128)

    def kernel(*args):
        # args: [param_smem...] + [hbm inputs...] + out_ref + scratch
        param_refs = {n: args[i] for i, n in enumerate(plan.param_names)}
        ins = args[nparams:nparams + ngroups]
        out_ref = args[nparams + ngroups]
        scratch = args[nparams + ngroups + 1:nparams + 2 * ngroups + 1]
        sems = args[-1]

        pids = [pl.program_id(d) for d in range(len(plan.grid_shape))]

        copies = []
        for gi, g in enumerate(plan.groups):
            f = g['fn']
            halo = f.halo
            idx = []
            for j in range(ndim - 1):
                hl, hr = halo[j]
                base = region_start[j]
                if j < len(plan.grid_shape):
                    start = base + pids[j] * tiles[j]
                else:
                    start = base
                ext = tiles[j] + hl + hr
                # window start in padded coords: halo+start-halo = start
                idx.append(pl.ds(start, ext))
            idx.append(slice(None))  # full aligned z window
            cp = pltpu.make_async_copy(ins[gi].at[tuple(idx)], scratch[gi],
                                       sems.at[gi])
            cp.start()
            copies.append(cp)
        for cp in copies:
            cp.wait()

        refs = {}
        for gi, g in enumerate(plan.groups):
            refs[(g['fn'].name, g['tk'], g['toff'])] = scratch[gi]
        ctx = _TileCtx(plan, refs, param_refs, eq.region)
        val = translate(eq.rhs, ctx)
        val = jnp.broadcast_to(val, tiles).astype(plan.dtype)
        if zp_out != nz:
            pad = [(0, 0)] * (ndim - 1) + [(0, zp_out - nz)]
            val = jnp.pad(val, pad)
        out_ref[...] = val

    # build specs
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] * nparams +
                [pl.BlockSpec(memory_space=pl.ANY)] * ngroups)
    if ndim == 3:
        out_spec = pl.BlockSpec(
            (tiles[0], tiles[1], zp_out),
            lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    else:
        out_spec = pl.BlockSpec(
            (tiles[0], zp_out),
            lambda i: (i, 0), memory_space=pltpu.VMEM)

    scratch_shapes = []
    for g in plan.groups:
        f = g['fn']
        shp = []
        for j in range(ndim - 1):
            hl, hr = f.halo[j]
            shp.append(tiles[j] + hl + hr)
        shp.append(f.shape_allocated[-1])
        scratch_shapes.append(pltpu.VMEM(tuple(shp), plan.dtype))
    scratch_shapes.append(pltpu.SemaphoreType.DMA((ngroups,)))

    param_args = [jnp.asarray([params[n]], dtype=plan.dtype)
                  for n in plan.param_names]
    out_shape = region_shape[:-1] + (zp_out,)
    call = pl.pallas_call(
        kernel,
        grid=plan.grid_shape,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, plan.dtype),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )
    out = call(*param_args, *resolved)
    if zp_out != nz:
        out = out[..., :nz]
    return out
