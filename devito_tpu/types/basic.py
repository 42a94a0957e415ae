"""Symbol machinery: the AbstractFunction hierarchy.

Reference parity: devito/types/basic.py (AbstractFunction:647 with
halo/indexing machinery, caching via types/caching.py). Functions are
sympy applied functions — ``u(t, x, y)`` — whose *class* is created
dynamically per name (the sympy-idiomatic equivalent of the reference's
cached FunctionClass subclasses), so ``subs``/``xreplace``/rebuilds preserve
identity and metadata.

TPU-first deviations from the reference:
- No C-level metadata (``_C_ctype``/dataobj structs); data lives in a
  host(numpy)/device(jax.Array) coherent pair managed per Function
  (see dense.py), replacing the reference's ctypes allocators
  (devito/data/allocators.py) with XLA-managed device memory.
- Index expressions are in grid-point units (see types/dimension.py).
"""

import numpy as np
import sympy
from sympy import Rational

from .dimension import Dimension
from ..finite_differences.differentiable import Differentiable
from ..utils import as_tuple

__all__ = ['AbstractFunction', 'retrieve_functions', 'retrieve_dimensions',
           'NODE', 'CELL', '_symbol_cache']

# Stagger markers (reference: devito staggered grid API)
NODE = 'node'
CELL = 'cell'

_symbol_cache = {}


class AbstractFunction(Differentiable, sympy.Function):
    """Base class for all grid/sparse functions. Do not instantiate directly;
    use Function/TimeFunction/SparseFunction etc."""

    _metadata_set = False

    # Type flags (refined in subclasses)
    is_DiscreteFunction = True
    is_Function = False
    is_TimeFunction = False
    is_SparseFunction = False
    is_SparseTimeFunction = False
    is_Constant = False

    @classmethod
    def eval(cls, *args):
        return None

    def __new__(cls, *args, **kwargs):
        if cls._metadata_set:
            if kwargs and not set(kwargs) <= {'evaluate', 'simplify'}:
                # rebuild with overridden constructor kwargs (reference:
                # u.func(name='v'), tests/test_rebuild.py — sympy's .func
                # is this class, and sympy itself never re-applies with
                # kwargs, so a kwargs call unambiguously means rebuild)
                kw = dict(getattr(cls, '_constructor_kwargs', {}))
                kw.update(kwargs)
                try:
                    if cls._cache_key(**kw) == cls._cache_key(
                            **cls._constructor_kwargs):
                        # rebuild with unchanged parameters: same function
                        # (reference: tests/test_rebuild.py — f._rebuild(
                        # dimensions=f.dimensions).function is f)
                        return cls._canonical
                except Exception:
                    pass
                base = cls.__mro__[1]
                return base(**{k: v for k, v in kw.items()
                               if v is not None or k in kwargs})
            # Re-application by sympy (subs/xreplace/rebuild): args are index
            # expressions; metadata lives on the class.
            obj = sympy.Function.__new__(cls, *args)
            return obj

        # Fresh user-level construction. NB: like the reference (see
        # tests/test_caching.py:295 — "Devito doesn't cache
        # AbstractFunctions anymore"), every construction returns a NEW
        # function with freshly allocated (zero) data; shifted accesses of
        # the same function share its dynamically created class and hence
        # its data.
        name = kwargs.pop('name', None)
        if name is None:
            raise TypeError(f"{cls.__name__} requires a `name`")
        newcls = type(cls)(name, (cls,), {'_metadata_set': True,
                                          '__module__': cls.__module__})
        newcls.__init_metadata__(name=name, **kwargs)
        obj = sympy.Function.__new__(newcls, *newcls._dimensions)
        newcls._canonical = obj
        obj.__init_finalize__()
        return obj

    @classmethod
    def _cache_key(cls, **kwargs):
        def _h(v):
            if isinstance(v, (list, tuple)):
                return tuple(_h(i) for i in v)
            if isinstance(v, np.dtype):
                return str(v)
            if isinstance(v, np.ndarray):
                return (v.shape, v.dtype.str, v.tobytes()[:64])
            try:
                hash(v)
                return v
            except TypeError:
                return id(v)
        return tuple((k, _h(v)) for k, v in sorted(kwargs.items()))

    @classmethod
    def __init_metadata__(cls, **kwargs):
        """Populate class-level metadata. Subclasses extend."""
        raise NotImplementedError

    def __init_finalize__(self):
        pass

    def __init__(self, *args, **kwargs):
        pass

    # -- identity ---------------------------------------------------------

    @property
    def name(self):
        return type(self).__name__

    @property
    def function(self):
        """The canonical (unshifted) instance of this function."""
        return type(self)._canonical

    def _rebuild(self, **kwargs):
        """Reconstruct with overridden constructor kwargs (reference:
        CodeSymbol._rebuild; identical kwargs return this function)."""
        if not kwargs:
            return self.function
        return type(self)(**kwargs)

    @property
    def indices(self):
        return self.args

    @property
    def dimensions(self):
        return type(self)._dimensions

    @property
    def grid(self):
        return type(self)._grid

    @property
    def dtype(self):
        return type(self)._dtype

    @property
    def space_order(self):
        return getattr(type(self), '_space_order', None)

    @property
    def time_order(self):
        return getattr(type(self), '_time_order', None)

    @property
    def staggered(self):
        return getattr(type(self), '_staggered', None)

    def stagger_offset(self, dim):
        """Physical offset (0 or 1/2, in spacing units) of this function's
        samples along ``dim``."""
        stag = self.staggered
        if stag is None or stag == NODE:
            return Rational(0)
        if stag == CELL:
            return Rational(1, 2) if dim.is_Space else Rational(0)
        if dim in as_tuple(stag):
            return Rational(1, 2)
        return Rational(0)

    # -- low-level indexed access -----------------------------------------

    def __getitem__(self, indices):
        """Explicit-index access, e.g. ``u[t+1, 0, y]`` — the reference's
        low-level Indexed API used for boundary-condition equations
        (reference: types/basic.py Indexed:1851; notebook BC idiom
        ``Eq(u[t+1, 0, y], 0)``)."""
        indices = indices if isinstance(indices, tuple) else (indices,)
        if len(indices) != len(self.dimensions):
            raise IndexError(
                f"{self.name}: expected {len(self.dimensions)} indices, "
                f"got {len(indices)}")
        return type(self)(*[sympy.sympify(i) for i in indices])

    def indexify(self):
        """Integer-index form of this access: spacing-symbol offsets
        (``x + 1.0*h_x``) and staggered half-spacings reduce to plain
        integer shifts (reference: lower_exprs' indexification,
        devito/ir/equations/algorithms.py:99 and Indexed semantics —
        tests/test_symbolics.py test_float_indices:31)."""
        idx = []
        for d, a in zip(self.dimensions, self.args):
            e = sympy.sympify(a)
            sp = getattr(d, 'spacing', None)
            if sp is not None:
                e = e.subs(sp, 1)
            e = sympy.nsimplify(e, rational=True)
            # integral floats/rationals -> Integers (x + 1.0 -> x + 1)
            e = e.subs({f: int(f) for f in e.atoms(sympy.Float)
                        if float(f).is_integer()})
            e = e.subs({r: int(r) for r in e.atoms(sympy.Rational)
                        if r.q == 1})
            # staggered half-offsets are metadata, not array shifts
            off = self.function.stagger_offset(d)
            if off != 0 and sympy.simplify(e - d - off) == 0:
                e = d
            idx.append(e)
        return type(self)(*idx)

    # -- structural helpers ----------------------------------------------

    def _subs_index(self, position, delta):
        new_args = list(self.args)
        new_args[position] = new_args[position] + delta
        return type(self)(*new_args)

    def shift(self, dim, delta):
        """Shift the index along ``dim``'s root by ``delta`` grid points."""
        for i, (d, a) in enumerate(zip(self.dimensions, self.args)):
            if d.root == getattr(dim, 'root', dim) or d == dim:
                return self._subs_index(i, delta)
        raise ValueError(f"{self} has no dimension {dim}")

    def index_offsets(self):
        """Map dimension -> integer offset of this access (e.g.
        u(t+1, x-2, y) -> {t: 1, x: -2, y: 0}). Raises on non-affine
        accesses."""
        out = {}
        for d, a in zip(self.dimensions, self.args):
            off = sympy.simplify(a - d)
            out[d] = off
        return out

    # Pickling support for dynamically created classes
    def __reduce_ex__(self, protocol):
        import numpy as np
        meta = dict(type(self)._constructor_kwargs)
        cls = type(self)
        state = {}
        # carry the data with the pickle (reference semantics: pickled
        # Functions/Operators ship their buffers, tests/test_pickle.py)
        if getattr(cls, '_coh', None) == 'dev' and \
                getattr(cls, '_dev_buf', None) is not None:
            self._ensure_host()
        if getattr(cls, '_host_buf', None) is not None:
            state['host_buf'] = np.array(cls._host_buf)
            state['halo_state'] = getattr(cls, '_halo_state', 'zero')
        if getattr(cls, '_coords_host', None) is not None:
            state['coords'] = np.array(cls._coords_host)
        return (_reconstruct_function,
                (type(self).__bases__[0], meta, tuple(self.args)),
                state or None)

    def __setstate__(self, state):
        import numpy as np
        if not state:
            return
        cls = type(self)
        buf = state.get('host_buf')
        if buf is not None and hasattr(self, '_allocate'):
            self._allocate()
            if cls._host_buf.shape == buf.shape:
                np.copyto(cls._host_buf, buf)
                cls._coh = 'host'
                cls._dev_buf = None
                # the pickled payload is real data: without this, the
                # fresh-allocation zero-upload fast path would ignore the
                # restored host buffer until a `.data` access (caught by
                # test_pickle_matrix.py test_full_model: critical_dt=inf
                # because mmax(vp) read device zeros)
                cls._pristine_zero = False
        hs = state.get('halo_state')
        if hs is not None:
            cls._halo_state = hs
        coords = state.get('coords')
        if coords is not None and hasattr(cls, '_coords_host'):
            cls._coords_host = coords

    def __getnewargs_ex__(self):
        return (), {}


def _reconstruct_function(basecls, meta, args):
    fn = basecls(**meta)
    cls = type(fn)
    if tuple(args) == tuple(fn.args):
        return fn
    return cls(*args)


def retrieve_functions(expr):
    """All AbstractFunction accesses appearing in ``expr`` (recursing into
    unevaluated Derivative nodes)."""
    from ..finite_differences.derivative import Derivative
    out = []
    seen = set()

    def _walk(e):
        if not isinstance(e, sympy.Basic):
            return
        if isinstance(e, AbstractFunction):
            if e not in seen:
                seen.add(e)
                out.append(e)
            return
        if isinstance(e, Derivative):
            _walk(e.expr)
            return
        for a in e.args:
            _walk(a)

    _walk(sympy.sympify(expr))
    return out


def retrieve_dimensions(expr):
    """All Dimensions appearing in ``expr``."""
    dims = [d for d in sympy.sympify(expr).free_symbols
            if isinstance(d, Dimension)]
    for f in retrieve_functions(expr):
        dims.extend(f.function.dimensions)
    from ..utils import filter_ordered
    return filter_ordered(dims)
