"""Dependence analysis over lowered schedules.

Reference parity: devito/ir/support/basic.py — TimedAccess:202 (direction-
aware access ordering), Dependence:660 (distance vectors, flow/anti/output
classification), Scope:870 (all dependences among a set of expressions).

Role in the TPU build: the executor evaluates each lowered equation as a
whole-array functional update, which is exactly the reference's "lifted"
schedule (every cluster in its own loop nest) — the conservatively correct
ordering.  What dependence analysis still must provide here:

- introspection: tests and passes can ask for flow/anti/output dependences
  (the reference's test_ir.py Scope assertions);
- validation: mixed forward/backward time-flow in one loop body is a
  scheduling error (the reference assigns per-dimension directions; a
  single fori_loop cannot run both ways);
- the permutation property: reordering *independent* equations must not
  change results (reference: clusterize toposort normalization).
"""

from ..types.basic import retrieve_functions
from .lowering import (LoweredEq, LoweredSparse, time_access_of,
                       space_offsets_of)
from ..exceptions import InvalidOperator

__all__ = ['TimedAccess', 'Dependence', 'Scope', 'validate_directions']


class TimedAccess:
    """One read or write access of a function inside a schedule item
    (reference: ir/support/basic.py TimedAccess:202)."""

    def __init__(self, fn, tk, toff, offsets, mode, item_index,
                 region=None):
        self.function = fn
        self.time_kind = tk
        self.time_off = toff if toff is not None else 0
        self.offsets = tuple(offsets or ())
        self.mode = mode            # 'R' | 'W'
        self.item_index = item_index
        # per-space-dim (start, stop) touched by this access in domain
        # coordinates, or None when unknown (reference: the iteration
        # intervals consumed by disjoint_test, ir/support/basic.py:1498)
        self.region = region

    def touches_disjoint(self, other):
        """True iff the two accesses provably touch non-intersecting
        index regions (reference disjoint_test:1498): some space axis
        has empty interval intersection. Writes to disjoint SubDomain
        strips (the BC idiom) then carry NO dependence, so scheduling
        and halo-eligibility may reorder/parallelize them."""
        ra, rb = self.region, other.region
        if ra is None or rb is None or len(ra) != len(rb):
            return False
        for (s1, e1), (s2, e2) in zip(ra, rb):
            if e1 <= s2 or e2 <= s1:
                return True
        return False

    @property
    def is_read(self):
        return self.mode == 'R'

    @property
    def is_write(self):
        return self.mode == 'W'

    @property
    def name(self):
        return self.function.name

    def distance(self, other):
        """Per-dim integer distance (time first): self - other."""
        t = self.time_off - other.time_off
        if len(self.offsets) != len(other.offsets):
            return (t,)
        return (t,) + tuple(a - b for a, b in zip(self.offsets,
                                                  other.offsets))

    def __repr__(self):
        return (f"{self.mode}<{self.name}[t{self.time_off:+d}, "
                f"{self.offsets}]@{self.item_index}>")


class Dependence:
    """A data dependence between two accesses of the same function
    (reference: ir/support/basic.py Dependence:660). ``source`` is the
    earlier access in program order."""

    def __init__(self, source, sink):
        self.source = source
        self.sink = sink

    @property
    def function(self):
        return self.source.function

    @property
    def is_flow(self):
        return self.source.is_write and self.sink.is_read

    @property
    def is_anti(self):
        return self.source.is_read and self.sink.is_write

    @property
    def is_output(self):
        return self.source.is_write and self.sink.is_write

    @property
    def distance(self):
        """source - sink, time first: a positive time component means the
        dependence is carried forward by the time loop (the sink reads
        what the source wrote that many iterations earlier); a negative
        space component means the sink touches points ahead of the
        source's write position."""
        return self.source.distance(self.sink)

    @property
    def is_carried(self):
        """Carried by the time loop (nonzero time distance)."""
        d = self.distance
        return bool(d and d[0] != 0)

    @property
    def is_independent(self):
        return not self.is_carried and all(x == 0 for x in self.distance)

    def __repr__(self):
        kind = ('flow' if self.is_flow else
                'anti' if self.is_anti else 'output')
        return (f"Dependence<{kind}, {self.function.name}, "
                f"dist={self.distance}>")


def _int_region(item):
    """The item's write region as concrete int intervals, or None."""
    try:
        return tuple((int(s), int(e)) for s, e in item.region)
    except (TypeError, ValueError):
        return None


def _item_accesses(item, idx):
    """All TimedAccesses of a schedule item."""
    out = []
    reg = _int_region(item) if isinstance(item, LoweredEq) else None
    tgt_dims = tuple(d.name for d in item.target.space_dimensions) \
        if isinstance(item, LoweredEq) else ()

    def reads_of(expr):
        for a in retrieve_functions(expr):
            fn = a.function
            rreg = None
            if fn.is_SparseFunction:
                tk, toff = ('sparse', 0)
                offs = ()
            else:
                tk, toff = time_access_of(a)
                offs = space_offsets_of(a, absolute='zero')
                if (reg is not None and len(offs) == len(reg)
                        and tuple(d.name for d in fn.space_dimensions)
                        == tgt_dims):
                    # read region = write region shifted by the taps
                    rreg = tuple((s + o, e + o)
                                 for (s, e), o in zip(reg, offs))
            out.append(TimedAccess(fn, tk, toff, offs, 'R', idx,
                                   region=rreg))

    if isinstance(item, LoweredEq):
        reads_of(item.rhs)
        if item.condition is not None:
            reads_of(item.condition)
        out.append(TimedAccess(item.target, item.time_kind, item.time_off,
                               (0,) * len(item.region), 'W', idx,
                               region=reg))
        if item.increment or item.reduction:
            out.append(TimedAccess(item.target, item.time_kind,
                                   item.time_off, (0,) * len(item.region),
                                   'R', idx, region=reg))
    elif isinstance(item, LoweredSparse):
        reads_of(item.expr)
        if item.kind == 'interp':
            out.append(TimedAccess(item.sparse, 'sparse',
                                   item.target_time_off, (), 'W', idx))
        else:
            fld = item.field
            out.append(TimedAccess(fld, item.field_time_kind,
                                   item.field_time_off, (), 'W', idx))
            out.append(TimedAccess(fld, item.field_time_kind,
                                   item.field_time_off, (), 'R', idx))
    return out


class Scope:
    """All data dependences among a list of schedule items (reference:
    ir/support/basic.py Scope:870)."""

    def __init__(self, items):
        self.items = list(items)
        self.accesses = []
        for i, it in enumerate(self.items):
            self.accesses.extend(_item_accesses(it, i))

        deps = []
        for a in self.accesses:
            for b in self.accesses:
                if a.function is not b.function:
                    continue
                if not (a.is_write or b.is_write):
                    continue  # input dep: irrelevant
                if a.touches_disjoint(b):
                    continue  # provably non-intersecting regions
                if a.item_index < b.item_index:
                    deps.append(Dependence(a, b))
                elif (a.item_index == b.item_index and a is not b
                      and a.is_write and b.is_read):
                    # within one statement: the write feeds the read of a
                    # *different* time/space point in a later iteration
                    # (loop-carried self dependence)
                    d = a.distance(b)
                    if any(d):
                        deps.append(Dependence(a, b))
        self._deps = deps

    @property
    def d_all(self):
        return list(self._deps)

    @property
    def d_flow(self):
        return [d for d in self._deps if d.is_flow]

    @property
    def d_anti(self):
        return [d for d in self._deps if d.is_anti]

    @property
    def d_output(self):
        return [d for d in self._deps if d.is_output]

    def independent(self, i, j):
        """True iff items i and j have no dependence between them (their
        relative order is semantically irrelevant — the toposort
        normalization property)."""
        lo, hi = min(i, j), max(i, j)
        for d in self._deps:
            if {d.source.item_index, d.sink.item_index} == {lo, hi}:
                return False
        return True


def validate_directions(schedule):
    """Reject schedules whose stepping writes imply both a forward and a
    backward time sweep (reference: Schedule direction detection,
    ir/clusters/algorithms.py — each dimension gets ONE direction)."""
    fwd, bwd = [], []
    for it in schedule.body:
        offs = []
        if isinstance(it, LoweredEq) and it.time_kind == 'stepping':
            offs = [it.time_off]
        elif isinstance(it, LoweredSparse) and \
                it.field_time_kind == 'stepping':
            offs = [it.field_time_off or 0]
        for o in offs:
            if o > 0:
                fwd.append(it)
            elif o < 0:
                bwd.append(it)
    if fwd and bwd:
        raise InvalidOperator(
            "Mixed time-flow: the loop body writes both future "
            f"({fwd[0]}) and past ({bwd[0]}) rolling-buffer rows; a "
            "single time loop cannot run forward and backward at once")
    return schedule
