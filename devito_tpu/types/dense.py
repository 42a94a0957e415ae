"""Dense grid functions: Function and TimeFunction.

Reference parity: devito/types/dense.py (DiscreteFunction:43 with lazy
allocation and halo views, Function:975, TimeFunction:1345 with
``time_order``, ``save`` vs rolling buffer, ``.forward``/``.backward``).

TPU-first data plane: each function owns a coherent host(numpy)/device
(jax.Array) buffer pair. ``.data`` hands out a writable numpy *domain view*
(host becomes authoritative); Operators pull a device copy before running
and mark the device authoritative for outputs — this replaces the
reference's ctypes allocators + dataobj structs and minimizes HBM<->host
traffic across repeated ``op.apply`` calls.
"""

import numpy as np
import sympy

from .basic import AbstractFunction, NODE
from .dimension import ConditionalDimension
from ..utils import as_tuple

__all__ = ['DiscreteFunction', 'Function', 'TimeFunction', 'Buffer']


class Buffer:
    """Explicit rolling-buffer size for ``TimeFunction(save=Buffer(k))``
    (reference: types/dense.py save=Buffer semantics — k modulo slots
    instead of the default time_order+1, no full history)."""

    def __init__(self, size):
        self.size = int(size)

    def __repr__(self):
        return f"Buffer({self.size})"



# Device layouts by function NAME. The layout decision must be visible
# from EVERY instance family of a function (per-apply overrides and
# unpickled operators hold distinct generated classes for the "same"
# function), so the translator-side consults (dev_halo/is_zcompact) key
# on the name; buffers themselves live on the class that was bound at
# _prepare time.  Entries are ``(layout, family_token)``: a stale entry
# from a DEAD function family (an earlier, unrelated function that
# happened to share the name — e.g. across tests) must not poison a
# fresh same-named function whose class state is still the default, so
# lookups validate the token (shape/dtype/halo signature) and fall back
# to the class state on mismatch.
_layout_registry = {}


def _registry_layout(fn):
    """Resolve ``fn``'s device layout: a registry entry whose family
    token matches wins (alias instances of the same function agree even
    across generated classes); otherwise the instance's own class
    state."""
    entry = _layout_registry.get(fn.name)
    if entry is not None and entry[1] == fn._family_token():
        return entry[0]
    return type(fn)._dev_layout

# Device STORAGE dtype by function name: the device buffer may hold a
# narrower dtype (bfloat16) than the function's compute dtype — the
# executor upcasts each time-resolved row right after its dynamic slice
# (so the convert fuses into the stencil fusion and HBM streams the
# narrow bytes) and the write casts back in the same fusion.  This is
# the TPU analog of reduced-precision wavefield storage; the reference's
# counterpart is its dtype knob (devito/operator/operator.py dtype
# argument + mixed-precision discussions), re-designed as
# storage-vs-compute split because the MXU/VPU natively consume bf16.
_storage_registry = {}


class DiscreteFunction(AbstractFunction):
    """Common data machinery for grid-backed functions."""

    # data coherence states
    _HOST, _DEV, _BOTH = 'host', 'dev', 'both'

    # default device layout (subclasses with their own metadata init —
    # e.g. sparse functions — inherit the padded layout)
    _dev_layout = 'padded'

    # compiler-generated temporary (CIRE derivative temps, interpolation
    # dense temps): written every step and never user-facing, so the
    # 'storage-dtype' narrowing applies to them like to wavefields
    _compiler_temp = False

    @classmethod
    def __init_metadata__(cls, name=None, grid=None, shape=None,
                          dimensions=None, dtype=None, space_order=1,
                          staggered=None, padding=None, initializer=None,
                          allocator=None, parameter=False, avg_mode=None,
                          coefficients=None, **kwargs):
        # a Function may be defined on a SubDomain: its data covers only
        # that sub-region, its dimensions are the SubDimensions, and its
        # indices stay aligned with the GLOBAL grid indices via a
        # per-axis origin offset consumed by the compiler (reference:
        # tests/test_subdomains.py TestSubDomainFunctions — Function
        # (grid=subdomain) with global-index iteration)
        from .grid import SubDomain, SubDomainSet
        cls._subdomain_fn = None
        cls._origin_offset = None
        if isinstance(grid, SubDomain):
            sd = grid
            if isinstance(sd, SubDomainSet):
                raise ValueError(
                    "Functions cannot be defined on a SubDomainSet")
            if sd.grid is None:
                raise ValueError(
                    f"SubDomain {sd.name} is not attached to a Grid")
            cls._subdomain_fn = sd
            grid = sd.grid
            if grid.is_distributed:
                raise NotImplementedError(
                    "Functions on SubDomains of distributed grids")
            cls._origin_offset = tuple(b[0] for b in sd.bounds())
        cls._grid = grid
        if cls._subdomain_fn is not None:
            space_dims = cls._subdomain_fn.dimensions
            space_shape = cls._subdomain_fn.shape
            dtype = dtype or grid.dtype
        elif grid is not None:
            space_dims = grid.dimensions
            space_shape = grid.shape
            dtype = dtype or grid.dtype
        else:
            space_dims = as_tuple(dimensions)
            space_shape = as_tuple(shape)
            dtype = dtype or np.float32
        if dimensions is not None:
            space_dims = as_tuple(dimensions)
        if shape is not None:
            space_shape = as_tuple(shape)
        if len(space_dims) != len(space_shape):
            raise ValueError(
                f"{len(space_dims)} dimensions given but shape has "
                f"{len(space_shape)} entries — pass a matching shape= "
                f"(reference: Function._rebuild shape check)")
        cls._space_dimensions = space_dims
        cls._space_shape = space_shape
        cls._dtype = np.dtype(dtype)
        cls._space_order = space_order
        cls._staggered = cls._normalize_staggered(staggered, space_dims)
        cls._initializer = initializer
        cls._is_parameter = parameter
        cls._coefficients = coefficients
        # off-grid averaging mode (reference: basic.py:857 avg_mode)
        cls._avg_mode = avg_mode or 'arithmetic'
        cls._interp_order = 2
        # halo per space dim, each side (generous: space_order, as in the
        # reference's default halo sizing)
        cls._halo = tuple((space_order, space_order) for _ in space_dims)
        cls._dimensions = cls._make_dimensions()
        cls._constructor_kwargs = dict(
            name=name, grid=cls._subdomain_fn or grid, shape=shape,
            dimensions=dimensions,
            dtype=cls._dtype, space_order=space_order, staggered=staggered,
            parameter=parameter)
        # data buffers (host numpy padded, device jax, coherence state)
        cls._host_buf = None
        cls._dev_buf = None
        cls._coh = cls._HOST
        cls._halo_state = 'zero'
        # device-buffer layout: 'padded' = host layout (halo + lane-pad);
        # 'zcompact' = last (lane) dim holds the bare domain extent, the
        # z-halo being synthesized in-kernel (see Operator._decide_layouts)
        cls._dev_layout = 'padded'

    @staticmethod
    def _normalize_staggered(staggered, dims):
        if staggered is None or staggered == NODE:
            return None
        return staggered

    @classmethod
    def _make_dimensions(cls):
        return cls._space_dimensions

    # -- shapes -----------------------------------------------------------

    @property
    def time_dim(self):
        return getattr(type(self), '_time_dim_', None)

    @property
    def space_dimensions(self):
        return type(self)._space_dimensions

    @property
    def shape(self):
        return type(self)._space_shape

    @property
    def halo(self):
        return type(self)._halo

    @property
    def shape_with_halo(self):
        return tuple(n + l + r for n, (l, r)
                     in zip(self.shape, self.halo))

    def _allocated_space(self):
        """Allocated extent per space axis: halo'd; the innermost (TPU
        lane) axis rounds up to 128 (Mosaic requires 128-aligned last-dim
        windows for HBM DMA, and XLA lays the trailing pad out for free);
        under a distributed Grid every sharded axis additionally rounds
        up to its topology factor so GSPMD can shard it EVENLY — the TPU
        analog of the reference's uneven Decomposition
        (devito/data/decomposition.py:12): instead of per-rank extents,
        one dead pad tail that the slice lowering never addresses."""
        from math import gcd
        from ..utils import round_up
        s = tuple(n + l + r for n, (l, r) in zip(type(self)._space_shape,
                                                 type(self)._halo))
        if not s:
            return s
        s = s[:-1] + (round_up(s[-1], 128),)
        if len(s) >= 2:
            # sublane axis: a non-multiple-of-8 extent leaves every
            # (8, 128) tile row partial — XLA's layout assignment then
            # reshuffles minor-to-major orders across the whole step
            # graph (elastic at nbl=10: alloc y 188 = 23.5 tiles ran
            # 18.6 ms/step vs 11.6 at an aligned extent)
            s = s[:-2] + (round_up(s[-2], 8), s[-1])
        grid = type(self)._grid
        dist = grid.distributor if grid is not None else None
        if dist is not None and len(dist.topology) == len(s):
            out = []
            for j, (e, t) in enumerate(zip(s, dist.topology)):
                if t > 1:
                    q = t if j < len(s) - 1 else 128 * t // gcd(128, t)
                    e = round_up(e, q)
                out.append(e)
            s = tuple(out)
        return s

    @property
    def shape_allocated(self):
        """Halo'd shape, padded for lane alignment and even sharding
        (see _allocated_space)."""
        return self._allocated_space()

    @property
    def dev_halo(self):
        """Halo of the DEVICE buffer: equals ``halo`` in the padded layout;
        under the z-compact layout the last (TPU lane) dim carries no halo
        — shifted lane reads synthesize it with a cheap in-VMEM zero-pad
        instead of streaming `round_up(n+2h,128)`-lane rows from HBM
        (measured 1.9x on v5e at 256^3, experiments/stencil_probe8.py)."""
        h = self.halo
        if self.is_zcompact and h:
            return h[:-1] + ((0, 0),)
        return h

    @property
    def origin_offset(self):
        """Global domain index of this function's first interior point
        per space axis: nonzero only for Functions defined on a SubDomain
        (iteration regions stay in GLOBAL coordinates; the compiler
        subtracts this offset when slicing the local buffer)."""
        oo = getattr(type(self), '_origin_offset', None)
        if oo is None:
            return (0,) * len(self.space_dimensions)
        return oo

    @property
    def subdomain(self):
        """The SubDomain this function is defined on (None for whole-grid
        functions)."""
        return getattr(type(self), '_subdomain_fn', None)

    def _family_token(self):
        """Identity of this function's build family — same name AND same
        token means 'the same function' for layout purposes (unpickled
        clones, per-apply overrides); a mere name collision differs."""
        cls = type(self)
        return (tuple(getattr(cls, '_space_shape', ()) or ()),
                str(getattr(cls, '_dtype', '')),
                tuple(getattr(cls, '_halo', ()) or ()))

    @property
    def is_zcompact(self):
        return _registry_layout(self) == 'zcompact'

    @property
    def shape_device(self):
        """Shape of the device buffer under the current device layout.

        z-compact buffers lane-align too: the last (lane) extent rounds
        up to 128 and the sublane (y) extent to 8 — the tail lanes are
        DEAD (created zero, every full-z write masks them back to zero in
        the producing fusion, compiler/executor.py), so shifted taps read
        them as the zero halo.  This removes the old `z % 128 == 0`
        eligibility gate: a 192^3 grid stores 256-lane compact rows and
        keeps the fast layout (BENCH_r02's 3.6x cliff at 192^3)."""
        if not self.is_zcompact:
            return self.shape_allocated
        from ..utils import round_up
        lead = len(self._leading_slices())
        space = self._allocated_space()  # halo'd + aligned, host layout
        space = space[:-1] + (self._zdev_extent(),)
        return self.shape_with_halo[:lead] + space

    def _zdev_extent(self):
        """Lane extent of the z-compact device buffer: the bare domain
        extent rounded up to the 128-lane tile (the tail is dead)."""
        from ..utils import round_up
        return round_up(type(self)._space_shape[-1], 128)

    def set_device_layout(self, layout):
        """Switch the device-buffer layout, syncing any device-authoritative
        data through the host first."""
        cls = type(self)
        _layout_registry[self.name] = (layout, self._family_token())
        if cls._dev_layout == layout:
            return
        if cls._coh == self._DEV and cls._dev_buf is not None:
            self._ensure_host()
        cls._dev_buf = None
        if cls._coh == self._BOTH:
            cls._coh = self._HOST
        cls._dev_layout = layout

    @property
    def storage_dtype(self):
        """Dtype of the DEVICE buffer (may be narrower than ``dtype``;
        see _storage_registry)."""
        return _storage_registry.get(self.name, self.dtype)

    def set_storage_dtype(self, dt):
        """Switch the device-buffer storage dtype, syncing any
        device-authoritative data through the host first."""
        cls = type(self)
        try:
            dt = np.dtype(dt)
        except TypeError:
            import ml_dtypes  # 'bfloat16' etc: not a plain-numpy name
            dt = np.dtype(getattr(ml_dtypes, str(dt)))
        prev = _storage_registry.get(self.name, self.dtype)
        if dt == self.dtype:
            _storage_registry.pop(self.name, None)
        else:
            _storage_registry[self.name] = dt
        if prev == dt:
            return
        if cls._coh == self._DEV and cls._dev_buf is not None:
            self._ensure_host()
        cls._dev_buf = None
        if cls._coh == self._BOTH:
            cls._coh = self._HOST

    @property
    def is_parameter(self):
        return type(self)._is_parameter

    @property
    def symbolic_shape(self):
        return self.shape

    # -- data management --------------------------------------------------

    def _allocate(self):
        cls = type(self)
        if cls._host_buf is None:
            cls._host_buf = np.zeros(self.shape_allocated, dtype=self.dtype)
            # pristine: all-zero and never exposed to the user — lets the
            # device buffer be created as jnp.zeros without shipping zeros
            # over the host<->device link (fresh wavefields are the bulk
            # of per-apply transfer: 342 MB for a 192^3 TTI pair)
            cls._pristine_zero = cls._initializer is None
            if cls._initializer is not None:
                view = self._domain_view(cls._host_buf)
                cls._initializer(view)
        return cls._host_buf

    def _domain_view(self, buf):
        slices = self._leading_slices() + tuple(
            slice(l, l + n) for n, (l, r) in zip(self.shape, self.halo))
        return buf[slices]

    def _leading_slices(self):
        return ()

    def _ensure_host(self):
        cls = type(self)
        self._allocate()
        if cls._coh == self._DEV:
            dev = np.asarray(cls._dev_buf)
            if cls._dev_layout != 'zcompact':
                np.copyto(cls._host_buf, dev)
            else:  # z-compact device layout: re-insert into the halo'd host
                hl, _ = cls._halo[-1]
                n = cls._space_shape[-1]
                cls._host_buf[..., hl:hl + n] = dev[..., :n]
        cls._coh = self._HOST  # user may write through the view
        cls._pristine_zero = False
        cls._dev_buf = None
        return cls._host_buf

    def _device_array(self):
        """Device buffer (jax.Array) in the current device layout, pushing
        host data if needed."""
        import jax.numpy as jnp
        cls = type(self)
        # a fresh class of an existing family may not yet carry the
        # family's registered layout — sync it so the buffer built here
        # matches what dev_halo/is_zcompact (registry-resolved) describe
        self.set_device_layout(_registry_layout(self))
        self._allocate()
        if cls._coh == self._HOST or cls._dev_buf is None:
            buf = cls._host_buf
            pristine = getattr(cls, '_pristine_zero', False)
            if cls._dev_layout == 'zcompact':
                hl, _ = cls._halo[-1]
                n = cls._space_shape[-1]
                zext = self._zdev_extent()
                if zext == n or pristine:
                    buf = buf[..., hl:hl + n]
                    shape = buf.shape[:-1] + (zext,)
                else:
                    # lane-aligned compact row with a dead zero tail (the
                    # in-kernel halo synthesis reads the tail as the
                    # right z halo)
                    tmp = np.zeros(buf.shape[:-1] + (zext,),
                                   dtype=buf.dtype)
                    tmp[..., :n] = buf[..., hl:hl + n]
                    buf = tmp
                    shape = buf.shape
            else:
                shape = buf.shape
            sdt = self.storage_dtype
            if pristine:
                cls._dev_buf = jnp.zeros(shape, dtype=sdt)
            else:
                cls._dev_buf = jnp.asarray(buf, dtype=sdt)
            cls._coh = self._BOTH
        return cls._dev_buf

    def _set_device_array(self, arr):
        """Adopt ``arr`` as the authoritative (device) padded buffer."""
        cls = type(self)
        cls._dev_buf = arr
        cls._coh = self._DEV

    def _device_window(self, lo, hi):
        """Device-layout window of save rows ``[lo, hi)`` (rows outside
        ``[0, nt)`` zero-padded) — host-streaming support (the reference's
        buffering/Orchestrator analog; Operator._apply_streamed)."""
        import jax.numpy as jnp
        cls = type(self)
        self.set_device_layout(_registry_layout(self))
        host = self._ensure_host()
        nt = self.shape[0]
        rows = hi - lo
        a0, a1 = max(lo, 0), min(hi, nt)
        win = np.zeros((rows,) + host.shape[1:], dtype=self.dtype)
        if a1 > a0:
            win[a0 - lo:a1 - lo] = host[a0:a1]
        if cls._dev_layout == 'zcompact':
            hl, _ = cls._halo[-1]
            n = cls._space_shape[-1]
            zext = self._zdev_extent()
            if zext == n:
                win = win[..., hl:hl + n]
            else:
                tmp = np.zeros(win.shape[:-1] + (zext,), dtype=win.dtype)
                tmp[..., :n] = win[..., hl:hl + n]
                win = tmp
        return jnp.asarray(win, dtype=self.storage_dtype)

    def _absorb_window(self, arr, lo):
        """Write a device-layout window of save rows back into the host
        buffer starting at row ``lo`` (host becomes authoritative)."""
        cls = type(self)
        host = self._allocate()
        a = np.asarray(arr)
        nt = self.shape[0]
        a0, a1 = max(lo, 0), min(lo + a.shape[0], nt)
        if a1 > a0:
            src = a[a0 - lo:a1 - lo]
            if cls._dev_layout == 'zcompact':
                hl, _ = cls._halo[-1]
                n = cls._space_shape[-1]
                host[a0:a1, ..., hl:hl + n] = src[..., :n]
            else:
                host[a0:a1] = src
        cls._coh = self._HOST
        cls._dev_buf = None

    @property
    def data(self):
        """Writable view over the domain region.

        Host-authoritative (or single-device) data returns the plain
        numpy view. When the authoritative buffer is device-resident and
        sharded over multiple devices, returns a lazy global-indexing
        ``Data`` view (devito_tpu/data.py): windowed reads slice the
        sharded jax.Array (computation-follows-data) so only the
        requested window ever reaches the host — the reference's
        distributed ``Data`` global-indexing semantics without the full
        gather (reference: data/data.py:14)."""
        cls = type(self)
        if cls._coh == self._DEV and cls._dev_buf is not None:
            try:
                multi = len(cls._dev_buf.devices()) > 1
            except Exception:
                multi = False
            if multi:
                from ..data import Data
                return Data(self)
        return self._domain_view(self._ensure_host())

    @property
    def data_with_halo(self):
        buf = self._ensure_host()
        # user may write arbitrary halo content through this view: the
        # explicit multi-chip halo path can no longer reconstruct it from
        # exchange + edge rules (parallel/halo.py eligibility)
        type(self)._halo_state = 'dirty'
        # trim the lane-alignment tail pad
        sl = tuple(slice(0, n) for n in self.shape_with_halo)
        return buf[sl]

    @property
    def halo_state(self):
        """What the halo ring provably contains: 'zero' (never written),
        'edge' (pad_outer_halo edge replication), or 'dirty' (arbitrary
        user content). Drives parallel/halo.py shard-local halo
        reconstruction."""
        return type(self)._halo_state

    def pad_outer_halo(self):
        """Edge-replicate the domain data into the outer halo ring
        (reference: initialize_function's pad_halo — so shifted reads of
        physical parameters near the boundary see edge values, not
        zeros)."""
        buf = self._ensure_host()
        if type(self)._halo_state == 'zero':
            type(self)._halo_state = 'edge'
        lead = len(self._leading_slices())
        for j, (n, (hl, hr)) in enumerate(zip(
                type(self)._space_shape, type(self)._halo)):
            ax = lead + j
            sl_all = [slice(None)] * buf.ndim
            if hl:
                src = list(sl_all)
                src[ax] = slice(hl, hl + 1)
                dst = list(sl_all)
                dst[ax] = slice(0, hl)
                buf[tuple(dst)] = buf[tuple(src)]
            if hr:
                src = list(sl_all)
                src[ax] = slice(hl + n - 1, hl + n)
                dst = list(sl_all)
                dst[ax] = slice(hl + n, hl + n + hr)
                buf[tuple(dst)] = buf[tuple(src)]

    # Read-only accessors (reference API)
    @property
    def data_ro_domain(self):
        v = self.data
        v = v.view()
        v.flags.writeable = False
        return v

    @property
    def data_ro_with_halo(self):
        v = self.data_with_halo.view()
        v.flags.writeable = False
        return v


class Function(DiscreteFunction):
    """A space-varying discrete function ``f(x, y[, z])``.

    ``Function(name='f', grid=grid, space_order=so)``.
    """

    is_Function = True

    @property
    def _time_size(self):
        return None

    def avg(self, dims=None):
        """Arithmetic average over the 2^n neighboring points toward the
        staggered cell (reference: Function.avg, used by staggered-grid
        physics for material parameters)."""
        dims = as_tuple(dims) if dims is not None else self.space_dimensions
        from ..finite_differences.differentiable import Add, Mul
        shifts = [self]
        for d in dims:
            shifts = [s.subs(d, d + r) for s in shifts for r in (0, 1)]
        return Mul(sympy.Rational(1, len(shifts)), Add(*shifts))


class TimeFunction(Function):
    """A time- and space-varying function ``u(t, x, y[, z])``.

    ``TimeFunction(name='u', grid=grid, time_order=2, space_order=so,
    save=None)``. With ``save=None`` a rolling buffer of ``time_order + 1``
    slots is used (reference: SteppingDimension modulo buffering); with
    ``save=N`` the full time history is stored.
    """

    is_TimeFunction = True

    @classmethod
    def __init_metadata__(cls, time_order=1, save=None, time_dim=None,
                          **kwargs):
        cls._time_order = time_order
        cls._save = save
        dims = kwargs.get('dimensions')
        if time_dim is None and dims:
            # a leading time/stepping dim in `dimensions=` (the reference
            # rebuild convention: u.func(dimensions=(t, x1, y1))) becomes
            # the time dim; the rest are the space dims. A PLAIN leading
            # dimension also serves as the time axis when `shape=` covers
            # it (reference idiom: TimeFunction(shape=(50,),
            # dimensions=[time]) with time = Dimension('time') —
            # tests/test_dimension.py test_implicit_dims:1389)
            dims = as_tuple(dims)
            lead = dims[0]
            sh = kwargs.get('shape')
            covers_time = sh is not None and \
                len(as_tuple(sh)) == len(dims)
            if getattr(lead, 'is_Time', False) or \
                    getattr(lead, 'is_Stepping', False) or covers_time:
                time_dim = lead
                kwargs['dimensions'] = dims[1:]
                if covers_time:
                    sh = as_tuple(sh)
                    if save is None and not getattr(lead, 'is_Stepping',
                                                    False):
                        cls._save = save = sh[0]
                    kwargs['shape'] = sh[1:]
        cls._user_time_dim = time_dim
        super().__init_metadata__(**kwargs)
        cls._constructor_kwargs.update(time_order=time_order, save=save,
                                       time_dim=time_dim)

    @classmethod
    def _make_dimensions(cls):
        grid = cls._grid
        full_save = cls._save is not None and not isinstance(cls._save,
                                                            Buffer)
        if cls._user_time_dim is not None:
            tdim = cls._user_time_dim
        elif full_save:
            tdim = grid.time_dim if grid is not None else None
        else:
            tdim = grid.stepping_dim if grid is not None else None
        if tdim is None:
            from .dimension import TimeDimension, SteppingDimension
            time = TimeDimension('time')
            tdim = time if full_save else \
                SteppingDimension('t', parent=time)
        cls._time_dim_ = tdim
        return (tdim,) + cls._space_dimensions

    # position of the time axis in `shape` (reference:
    # TimeFunction._time_position)
    _time_position = 0

    @property
    def time_dim(self):
        return type(self)._time_dim_

    @property
    def save(self):
        return type(self)._save

    @property
    def _time_buffering(self):
        """True when time-stepping uses a modulo rolling buffer (save is
        None or a Buffer); False for full save (reference:
        TimeFunction._time_buffering)."""
        return type(self)._save is None or isinstance(type(self)._save,
                                                      Buffer)

    @property
    def _time_size(self):
        cls = type(self)
        if isinstance(cls._save, Buffer):
            return cls._save.size
        if cls._save is not None:
            return cls._save
        if isinstance(cls._time_dim_, ConditionalDimension):
            return None  # must be given via save
        return cls._time_order + 1

    @property
    def shape(self):
        return (self._time_size,) + type(self)._space_shape

    @property
    def shape_with_halo(self):
        return (self._time_size,) + tuple(
            n + l + r for n, (l, r) in zip(type(self)._space_shape,
                                           self.halo))

    @property
    def shape_allocated(self):
        return (self._time_size,) + self._allocated_space()

    @property
    def halo(self):
        return type(self)._halo  # space-only; callers index by space dim

    def _leading_slices(self):
        return (slice(None),)

    def _domain_view(self, buf):
        slices = (slice(None),) + tuple(
            slice(l, l + n) for n, (l, r) in zip(type(self)._space_shape,
                                                 type(self)._halo))
        return buf[slices]

    # -- time shifts ------------------------------------------------------

    @property
    def forward(self):
        """u at the next time slot (reference: TimeFunction.forward)."""
        return self._subs_index(0, 1)

    @property
    def backward(self):
        return self._subs_index(0, -1)
