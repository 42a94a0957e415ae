"""The Dimension zoo.

Reference parity: devito/types/dimension.py (Dimension:43, SpaceDimension:445,
TimeDimension:467, SteppingDimension:1712, SubDimension:688,
ConditionalDimension:849, DefaultDimension:405, StencilDimension:1587).

TPU-first design note: in the reference, index expressions are kept in units
of the spacing symbol (``x + h_x``) and later divided out during
indexification. Here indices are kept in *grid-point units* directly
(``x + 1``); spacing symbols only ever appear in finite-difference weights,
which keeps the lowering to static JAX slices trivial. Helpers accept
spacing-unit shifts (``x0=x + x.spacing/2``) for API parity and normalize
them to point units.
"""

import sympy
from sympy.core.cache import cacheit

__all__ = ['Dimension', 'SpaceDimension', 'TimeDimension', 'SteppingDimension',
           'SubDimension', 'ConditionalDimension', 'DefaultDimension',
           'StencilDimension', 'dimensions']


class Dimension(sympy.Symbol):
    """An iteration dimension; a sympy integer Symbol carrying spacing and
    min/max bound symbols."""

    is_Dimension = True
    is_Space = False
    is_Time = False
    is_Stepping = False
    is_Sub = False
    is_Conditional = False
    is_Default = False
    is_Stencil = False
    is_Derived = False

    __xnew_cached_ = staticmethod(cacheit(
        lambda cls, name: sympy.Symbol.__xnew__(cls, name, integer=True)))

    def __new__(cls, name, spacing=None, **kwargs):
        obj = cls.__xnew_cached_(cls, name)
        if spacing is not None:
            obj._spacing = spacing
        return obj

    @property
    def spacing(self):
        """The grid-spacing symbol of this dimension (``h_x``)."""
        try:
            return self._spacing
        except AttributeError:
            self._spacing = sympy.Symbol(f"h_{self.name}", positive=True)
            return self._spacing

    @property
    def symbolic_min(self):
        return sympy.Symbol(f"{self.name}_m", integer=True)

    @property
    def symbolic_max(self):
        return sympy.Symbol(f"{self.name}_M", integer=True)

    @property
    def symbolic_size(self):
        return sympy.Symbol(f"{self.name}_size", integer=True)

    @property
    def root(self):
        return self

    @property
    def parent(self):
        return None

    # Runtime-argument protocol (reference: _arg_names/_arg_defaults)
    @property
    def min_name(self):
        return f"{self.name}_m"

    @property
    def max_name(self):
        return f"{self.name}_M"

    def _hashable_content(self):
        return super()._hashable_content() + (type(self).__name__,)

    def _sympystr(self, printer):
        # NB: sympy's StrPrinter dispatches a `_print_Dimension` meant for
        # physics units, which would recurse on this class name.
        return self.name

    _sympyrepr = _sympystr


class SpaceDimension(Dimension):
    """A space dimension (drives spatial loops)."""
    is_Space = True


class TimeDimension(Dimension):
    """The time dimension (sequential)."""
    is_Time = True

    @property
    def spacing(self):
        """Time spacing symbol, named ``dt`` (reference convention)."""
        try:
            return self._spacing
        except AttributeError:
            self._spacing = sympy.Symbol("dt", positive=True)
            return self._spacing


class DefaultDimension(Dimension):
    """A dimension with a fixed default size (e.g. the points axis of a
    SparseFunction)."""

    is_Default = True

    def __new__(cls, name, default_value=None, **kwargs):
        obj = super().__new__(cls, name, **kwargs)
        obj._default_value = default_value
        return obj

    def __reduce__(self):
        return (DefaultDimension, (self.name, self._default_value))

    @property
    def default_value(self):
        return self._default_value


class DerivedDimension(Dimension):
    is_Derived = True

    def __new__(cls, name, *args, **kwargs):
        # NB: bypass the name-keyed symbol cache — two derived dimensions
        # with the same name but different metadata (thickness, factor)
        # must not share (and clobber) one symbol instance
        obj = sympy.Symbol.__xnew__(cls, name, integer=True)
        return obj

    @property
    def parent(self):
        return self._parent

    @property
    def root(self):
        return self._parent.root

    def _hashable_content(self):
        return super()._hashable_content() + (self._parent,)


def _rebuild_subdim(name, parent, lt, rt, local, side, width):
    obj = SubDimension(name, parent, lt, rt, local=local)
    obj._side = side
    obj._width = width
    return obj


class SteppingDimension(DerivedDimension):
    """Time-buffer dimension: iterates modulo the number of time slots kept
    alive (reference: SteppingDimension — modulo time buffering)."""

    is_Stepping = True
    is_Time = True

    def __new__(cls, name, parent=None, **kwargs):
        obj = super().__new__(cls, name, **kwargs)
        obj._parent = parent
        return obj

    def __reduce__(self):
        return (SteppingDimension, (self.name, self._parent))

    @property
    def spacing(self):
        return self.parent.spacing if self.parent is not None else super().spacing


class SubDimension(DerivedDimension):
    """A contiguous slice of a parent dimension, defined by left/right
    thicknesses. The only MPI/shard-safe way to express boundary regions
    (reference: types/dimension.py:688 and operator.py:119-123).

    ``thickness`` are (left, right) integers in grid points, relative to the
    parent's domain. ``local`` regions (pure-left/pure-right) mark BC strips.
    """

    is_Sub = True

    def __new__(cls, name, parent, lt, rt, local=False, **kwargs):
        obj = super().__new__(cls, name, **kwargs)
        obj._parent = parent
        obj._thickness = (lt, rt)
        obj._local = local
        return obj

    @classmethod
    def left(cls, name, parent, thickness):
        # region [0, thickness): left thickness 0, right = size - thickness
        return cls(name, parent, 0, None, local=True, side='left',
                   width=thickness) if False else \
            cls._make_side(name, parent, 'left', thickness)

    @classmethod
    def _make_side(cls, name, parent, side, thickness):
        obj = cls(name, parent, 0, 0, local=(side != 'middle'))
        obj._side = side
        obj._width = thickness
        return obj

    @classmethod
    def right(cls, name, parent, thickness):
        return cls._make_side(name, parent, 'right', thickness)

    @classmethod
    def middle(cls, name, parent, thickness_left, thickness_right):
        obj = cls(name, parent, thickness_left, thickness_right, local=False)
        obj._side = 'middle'
        obj._width = None
        return obj

    def __reduce__(self):
        return (_rebuild_subdim,
                (self.name, self._parent, self._thickness[0],
                 self._thickness[1], self._local, self.side,
                 getattr(self, '_width', None)))

    @property
    def side(self):
        return getattr(self, '_side', 'middle')

    @property
    def thickness(self):
        return self._thickness

    @property
    def local(self):
        return self._local

    @property
    def spacing(self):
        return self.parent.spacing

    def bounds(self, domain_size):
        """Return (start, stop) within the parent's domain [0, domain_size)."""
        side = self.side
        if side == 'left':
            return (0, self._width)
        elif side == 'right':
            return (domain_size - self._width, domain_size)
        else:
            lt, rt = self._thickness
            return (lt, domain_size - rt)

    def _hashable_content(self):
        return (sympy.Symbol._hashable_content(self) + (type(self).__name__,)
                + (self._parent, self.side, getattr(self, '_width', None),
                   self._thickness))


class ConditionalDimension(DerivedDimension):
    """A sub-sampled or guarded dimension (reference: dimension.py:849).

    With ``factor=k`` over a time parent: an equation indexed by this
    dimension executes every k-th parent iteration, writing to index
    ``parent // k`` (snapshot subsampling). With ``condition``, execution is
    masked by the (elementwise) condition.
    """

    is_Conditional = True

    def __new__(cls, name, parent=None, factor=None, condition=None,
                indirect=False, **kwargs):
        obj = super().__new__(cls, name, **kwargs)
        obj._parent = parent
        obj._factor = factor
        obj._condition = condition
        obj._indirect = indirect
        return obj

    def __reduce__(self):
        return (ConditionalDimension,
                (self.name, self._parent, self._factor, self._condition,
                 self._indirect))

    @property
    def factor(self):
        return self._factor

    @property
    def condition(self):
        return self._condition

    @property
    def spacing(self):
        if self._factor is not None and self.parent is not None:
            return self._factor * self.parent.spacing
        return super().spacing

    def _hashable_content(self):
        return (sympy.Symbol._hashable_content(self) + (type(self).__name__,)
                + (self._parent, self._factor,
                   sympy.sympify(self._condition) if self._condition is not None
                   else None))


class StencilDimension(Dimension):
    """Internal dimension spanning a stencil radius [lower, upper]
    (reference: dimension.py:1587); used by unexpanded IndexDerivatives."""

    is_Stencil = True

    def __new__(cls, name, lower, upper, **kwargs):
        obj = super().__new__(cls, name, **kwargs)
        obj._lower = int(lower)
        obj._upper = int(upper)
        return obj

    @property
    def range(self):
        return range(self._lower, self._upper + 1)

    def _hashable_content(self):
        return super()._hashable_content() + (self._lower, self._upper)


def dimensions(names):
    """Create a tuple of SpaceDimensions from a whitespace-separated string."""
    return tuple(SpaceDimension(n) for n in names.split())
