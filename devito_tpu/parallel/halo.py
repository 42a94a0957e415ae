"""Explicit multi-chip halo exchange: shard_map + per-axis ppermute.

Reference parity: devito/mpi/halo_scheme.py (HaloScheme.classify:571 — which
function/dimension/side needs exchange) + devito/mpi/routines.py (the six
generated MPI exchange schemes, incl. the comm/compute-overlap
``overlap2`` scheme routines.py:778).  The TPU-native design replaces
generated MPI code with a `shard_map`-wrapped time loop over the device
mesh:

- every grid buffer enters as its *interior* (domain-only) view, sharded
  over the mesh axes; inside the shard each buffer is re-padded to the
  standard halo layout, so the executor runs unchanged per shard;
- halo refresh is `jax.lax.ppermute` per sharded axis (corners compose
  from sequential axis exchanges, exactly like the reference's
  diagonal-free schemes) — no all-gathers, ever: a test asserts the
  compiled HLO contains none;
- a dataflow *halo plan* (`plan_halos`) decides WHEN each row's halo is
  refreshed: same-step producer→consumer chains (CIRE temporaries, 2-eq
  stepping chains) are resolved by *ghost zones* — the producer's write
  region is extended into its allocated halo and the upstream step-top
  margins widened accordingly, so every exchange hoists to the top of
  the step (one ppermute batch, overlappable).  Chains the ghost-zone
  budget cannot cover get synchronous mid-step refresh markers instead;
- comm/compute overlap (reference overlap2): the step's dense updates
  are split into interior regions (which never read a halo) and
  boundary frames; the ppermute batch rides between them with no data
  dependence on the interior fusions, so XLA's async collective
  scheduler runs the exchange concurrently with the interior compute;
- sparse injection/interpolation localizes corner indices per shard and
  masks foreign contributions; interpolation partial sums are `psum`-ed.

The GSPMD path (operator._maybe_shard) remains the fallback for schedules
this path cannot prove safe (sub-domain writes, space-dependent
conditionals, dirty user halos, non-divisible shards).
"""

from functools import partial

import numpy as np

from ..ir.lowering import LoweredEq, LoweredSparse, time_access_of
from ..types.basic import retrieve_functions
from ..ir.lowering import space_offsets_of
from ..logger import warning, perf as log_perf

__all__ = ['halo_scheme', 'plan_halos', 'explicit_halo_eligible',
           'ShardedRunner', 'LoweredExchange']


def halo_scheme(schedule):
    """Which (function, time_kind, toff) reads need valid halos, and how
    wide per space dim — the analog of HaloScheme.classify (reference
    mpi/halo_scheme.py:571)."""
    needs = {}

    def scan_expr(expr):
        for a in retrieve_functions(expr):
            fn = a.function
            if fn.is_SparseFunction or fn.grid is None:
                continue
            offs = space_offsets_of(a, absolute='zero')
            if not any(offs):
                continue
            tk, toff = time_access_of(a)
            key = (fn.name, tk, toff)
            cur = needs.setdefault(key, [0] * len(offs))
            for j, o in enumerate(offs):
                cur[j] = max(cur[j], abs(o))

    # prologue/epilogue included: hoisted invariants (e.g. a lifted
    # parameter derivative) read their operands at offsets outside the
    # time loop and need filled halos just the same
    for it in schedule.all_items:
        if isinstance(it, LoweredEq):
            scan_expr(it.rhs)
            if it.condition is not None:
                scan_expr(it.condition)
        else:
            scan_expr(it.expr)
    return needs


def _canon_row(fn, tk, toff):
    """Canonical row key: stepping offsets alias modulo the slot count."""
    if tk == 'stepping':
        toff = int(toff) % fn._time_size
    return (fn.name, tk, toff)


def item_reads(item):
    """All grid-function row reads of a schedule item with their per-axis
    tap margins: {rowkey: [margin per grid axis]} (zero-margin reads
    included — taint propagation needs them)."""
    out = {}

    def scan(expr, extra=0):
        for a in retrieve_functions(expr):
            fn = a.function
            if fn.is_SparseFunction or fn.grid is None:
                continue
            offs = space_offsets_of(a, absolute='zero')
            tk, toff = time_access_of(a)
            key = _canon_row(fn, tk, toff)
            cur = out.setdefault(key, [0] * len(offs))
            for j, o in enumerate(offs):
                cur[j] = max(cur[j], abs(o) + extra)

    if isinstance(item, LoweredEq):
        scan(item.rhs)
        if item.condition is not None:
            scan(item.condition)
        if item.increment or item.reduction:
            # read-modify-write of the target's current content
            fn = item.target
            key = _canon_row(fn, item.time_kind, item.time_off or 0)
            out.setdefault(key, [0] * len(fn.space_dimensions))
    elif isinstance(item, LoweredSparse):
        # corner gathers read at clipped in-domain indices plus any
        # symbolic offsets of the sampled expression; an offset read of
        # a point owned right at the shard edge lands in the halo
        scan(item.expr)
    return out


def item_writes(item):
    """Row keys written by a schedule item (dense targets and sparse
    injection fields)."""
    if isinstance(item, LoweredEq):
        fn = item.target
        if fn.grid is None or fn.is_SparseFunction:
            return []
        return [_canon_row(fn, item.time_kind, item.time_off or 0)]
    if isinstance(item, LoweredSparse) and item.kind == 'inject':
        fn = item.field
        return [_canon_row(fn, item.field_time_kind,
                           item.field_time_off or 0)]
    return []


class HaloPlan:
    """WHERE and HOW each halo gets refreshed on the explicit path.

    - ``static``: {rowkey: margins} — rows whose content never changes
      before their reads (params, read-only save buffers): halos filled
      once at shard-entry pad time.
    - ``after_prologue``: {rowkey: margins} — rows written in the
      prologue and tap-read later: one ppermute batch before the loop.
    - ``top``: {rowkey: margins} — per-step batch at the top of the
      step (carry rows, plus pre-write refreshes of increment targets
      with ghost-zone extensions).
    - ``ext``: {id(body eq): [e per axis]} — ghost zones: the eq's write
      region is extended ``e`` into its allocated halo so same-step
      consumers read locally-computed values (deep-halo scheme; the
      upstream margins in ``top`` are widened by the backward dataflow).
    - ``mid``: {body index: {rowkey: margins}} — synchronous refresh
      markers before specific body items, for chains the ghost-zone
      budget cannot cover.
    - ``epi``: {rowkey: margins} — one batch before the epilogue.
    - ``overlap_ok``: every per-step exchange sits in the top batch, so
      the interior/frame overlap split applies.
    """

    def __init__(self):
        self.static = {}
        self.after_prologue = {}
        self.top = {}
        self.ext = {}
        self.mid = {}
        self.epi = {}
        self.overlap_ok = True
        self.notes = []

    def _bump(self, table, key, margins):
        cur = table.setdefault(key, [0] * len(margins))
        for j, m in enumerate(margins):
            cur[j] = max(cur[j], m)


def plan_halos(schedule, reads):
    """Dataflow pass assigning every halo-needing read a refresh point.

    ``reads``: {name: fn} for every function in the operator.  Returns a
    HaloPlan, or None when the schedule cannot be planned (a row written
    more than once per step and tap-read — ambiguous single-pass
    dataflow; the GSPMD fallback handles it)."""
    body = schedule.body
    plan = HaloPlan()

    written_body = {}
    for i, it in enumerate(body):
        for w in item_writes(it):
            written_body.setdefault(w, []).append(i)
    written_pro = set()
    for it in schedule.prologue:
        written_pro.update(item_writes(it))

    # --- backward pass over the body: ghost-zone extensions ---------------
    need = {}          # row -> margins required valid at read time
    sync_rows = set()  # rows needing synchronous mid-step refresh
    for i in reversed(range(len(body))):
        it = body[i]
        bump = None
        for w in item_writes(it):
            e = need.pop(w, None)
            if e is None or not any(e):
                continue
            fn = (it.target if isinstance(it, LoweredEq) else it.field)
            cap = [min(hl, hr) for (hl, hr) in fn.halo]
            ok = (isinstance(it, LoweredEq)
                  and len(written_body.get(w, ())) == 1
                  and all(ej <= cj for ej, cj in zip(e, cap)))
            if ok:
                sshape = (fn.shape[1:] if fn.is_TimeFunction
                          else fn.shape)
                ok = tuple(it.region) == tuple((0, n) for n in sshape)
            if ok:
                plan.ext[id(it)] = list(e)
                if (it.increment or it.reduction is not None
                        or it.condition is not None):
                    # the extended region's pre-update content must be
                    # fresh before the read-modify-write
                    plan._bump(plan.top, w, e)
                bump = list(e)
            else:
                sync_rows.add(w)
                plan.overlap_ok = False
        if isinstance(it, LoweredEq) or isinstance(it, LoweredSparse):
            for r, m in item_reads(it).items():
                mm = ([x + b for x, b in zip(m, bump)] if bump else m)
                plan._bump(need, r, mm)

    # rows never written in the body: where does their content come from?
    for r, m in need.items():
        if r in written_body:
            continue  # resolved above (ghost/sync)
        if not any(m):
            continue
        if r in written_pro:
            plan._bump(plan.after_prologue, r, m)
        elif r[1] in ('save', 'cond') or r[1] is None:
            plan._bump(plan.static, r, m)
        else:
            plan._bump(plan.top, r, m)
    # carry rows written in the body and read with taps at the NEXT step
    # (their need was popped by the backward pass only for same-step
    # chains): a forward walk catches reads occurring before the write
    pending = set(written_body)
    for it in body:
        for r, m in item_reads(it).items():
            if r in pending and any(m):
                plan._bump(plan.top, r, m)
                pending.discard(r)
        for w in item_writes(it):
            pending.discard(w)

    # --- forward pass: mid-step markers for sync rows ---------------------
    if sync_rows:
        stale = set(sync_rows)
        for i, it in enumerate(body):
            for r, m in item_reads(it).items():
                if r in stale and any(m):
                    plan._bump(plan.mid.setdefault(i, {}), r, m)
                    stale.discard(r)
            for w in item_writes(it):
                if w in sync_rows:
                    stale.add(w)

    # --- epilogue: refresh rows changed during the run --------------------
    changed = set(written_body) | written_pro
    for it in schedule.epilogue:
        for r, m in item_reads(it).items():
            if not any(m):
                continue
            if r in changed:
                plan._bump(plan.epi, r, m)
            else:
                plan._bump(plan.static, r, m)
        changed.update(item_writes(it))

    # prologue-internal chains: a prologue item tap-reading a row written
    # by an earlier prologue item — rare; refresh inline is not yet
    # supported, signal no-plan
    seen = set()
    for it in schedule.prologue:
        for r, m in item_reads(it).items():
            if any(m) and r in seen:
                return None
            if any(m) and r not in seen and r not in plan.static:
                plan._bump(plan.static, r, m)
        seen.update(item_writes(it))

    # double-written tap-read rows are ambiguous for the single-pass
    # dataflow — bail to GSPMD
    for r in sync_rows:
        if len(written_body.get(r, ())) > 1:
            return None
    return plan


def explicit_halo_eligible(op):
    """True iff the operator's schedule can run on the explicit
    shard_map halo path (else: GSPMD fallback)."""
    grid = op._grid
    if grid is None or grid.distributor is None:
        return False
    dist = grid.distributor
    schedule = op._schedule

    # shards must divide the domain evenly
    for n, t in zip(grid.shape, dist.topology):
        if n % t != 0:
            warning(f"explicit halo path disabled: extent {n} not "
                    f"divisible by topology factor {t}; falling back to "
                    f"GSPMD (axis replicated)")
            return False

    for it in schedule.all_items:
        if isinstance(it, LoweredEq):
            fn = it.target
            sshape = fn.shape[1:] if fn.is_TimeFunction else fn.shape
            # only full-domain rectangular writes (sub-domain regions are
            # global-coordinate dependent; masks NYI on this path)
            if tuple(it.region) != tuple((0, n) for n in sshape):
                return False
            if it.condition is not None or it.reduction is not None:
                return False
            if it.time_kind == 'cond':
                return False
        elif isinstance(it, LoweredSparse):
            if getattr(type(it.sparse), '_matrix', None) is not None:
                return False

    # per-step exchanged buffers must have reconstructible halos
    needs = halo_scheme(schedule)
    for (name, tk, toff) in needs:
        fn = op._reads.get(name)
        if fn is None:
            return False
        state = getattr(fn, 'halo_state', 'dirty')
        if tk in ('save', 'cond'):
            return False  # shifted reads of save buffers: NYI
        if tk == 'stepping' and state != 'zero':
            return False
        if tk is None and state not in ('zero', 'edge'):
            return False
    if op._errctl is not None:
        return False
    return True


def _exchange_axis(row, ax, width, axis_name, nparts, hl, lext, jnp, lax):
    """Refresh the ``width``-wide halo slabs of ``row`` along space axis
    ``ax`` from the two neighbours (non-periodic: outermost shards keep
    zeros, matching the global zero halo)."""
    def take(lo, hi):
        idx = [slice(None)] * row.ndim
        idx[ax] = slice(lo, hi)
        return row[tuple(idx)]

    def put(lo, hi, val):
        idx = [slice(None)] * row.ndim
        idx[ax] = slice(lo, hi)
        return row.at[tuple(idx)].set(val)

    fwd = [(i, i + 1) for i in range(nparts - 1)]
    bwd = [(i + 1, i) for i in range(nparts - 1)]
    # right edge -> right neighbour's left halo
    recv_l = lax.ppermute(take(hl + lext - width, hl + lext), axis_name, fwd)
    # left edge -> left neighbour's right halo
    recv_r = lax.ppermute(take(hl, hl + width), axis_name, bwd)
    row = put(hl - width, hl, recv_l)
    row = put(hl + lext, hl + lext + width, recv_r)
    return row


def _edge_replicate(row, ax, axis_name, nparts, hl, hr, lext, jnp, lax):
    """Emulate pad_outer_halo on the outermost shards: the global-edge
    halo carries edge-replicated values (reference: initialize_function's
    pad mode)."""
    idx = lax.axis_index(axis_name)

    def take_row(i):
        s = [slice(None)] * row.ndim
        s[ax] = slice(i, i + 1)
        return row[tuple(s)]

    if hl:
        s = [slice(None)] * row.ndim
        s[ax] = slice(0, hl)
        first = jnp.broadcast_to(take_row(hl), row[tuple(s)].shape)
        row = row.at[tuple(s)].set(jnp.where(idx == 0, first, row[tuple(s)]))
    if hr:
        s = [slice(None)] * row.ndim
        s[ax] = slice(hl + lext, hl + lext + hr)
        last = jnp.broadcast_to(take_row(hl + lext - 1), row[tuple(s)].shape)
        row = row.at[tuple(s)].set(
            jnp.where(idx == nparts - 1, last, row[tuple(s)]))
    return row


class ShardedRunner:
    """shard_map-wrapped executor for one Operator on a distributed Grid.

    Buffers cross the shard_map boundary as interior (domain-only) views
    sharded with PartitionSpec over the mesh axes; inside, each shard
    re-pads to the canonical halo layout and the standard executor runs
    with a per-step ppermute halo-refresh hook.
    """

    def __init__(self, op):
        from ..compiler.executor import build_runner

        self.op = op
        grid = op._grid
        dist = grid.distributor
        self.dist = dist
        self.grid = grid
        self.needs = halo_scheme(op._schedule)

        # mesh axes actually partitioned
        self.parts = {}   # dim name -> (axis_name, nparts, local extent)
        for d, axn, t, n in zip(grid.dimensions, dist.axis_names,
                                dist.topology, grid.shape):
            if t > 1:
                self.parts[d.name] = (axn, t, n // t)
        self.local_shape = tuple(n // t for n, t in zip(grid.shape,
                                                        dist.topology))

        # localized schedule: same eqs over the per-shard domain
        sched = op._schedule
        self.local_schedule = type(sched)(
            [self._localize(it) for it in sched.prologue],
            [self._localize(it) for it in sched.body],
            [self._localize(it) for it in sched.epilogue],
            sched.direction)

        self.runner = build_runner(
            self.local_schedule, tuple(op._writes),
            stepping_info=op._stepping_info, errctl=None,
            exchange=self._make_exchange(),
            shard_spec=self.parts)

    def _localize(self, it):
        if isinstance(it, LoweredSparse):
            return it
        region = tuple((0, n) for n in self.local_shape)
        return LoweredEq(it.target, it.time_off, it.time_kind, region,
                         it.rhs, increment=it.increment,
                         reduction=it.reduction, condition=it.condition,
                         time_dep=it.time_dep, cond_factor=it.cond_factor,
                         lhs_access=it.lhs_access)

    # -- halo machinery ----------------------------------------------------

    def _axes_of(self, fn):
        """[(array axis, dim name)] for fn's partitioned space dims."""
        lead = 1 if fn.is_TimeFunction else 0
        out = []
        for j, d in enumerate(fn.space_dimensions):
            if d.name in self.parts:
                out.append((lead + j, d.name))
        return out

    def _make_exchange(self):
        import jax
        import jax.numpy as jnp
        from jax import lax
        from ..compiler.executor import step_row

        # per-step refreshes: stepping rows read with nonzero offsets
        stepping_needs = [(name, toff, margins)
                          for (name, tk, toff), margins in self.needs.items()
                          if tk == 'stepping']
        reads = self.op._reads

        def exchange(bufs, t):
            out = dict(bufs)
            for name, toff, margins in stepping_needs:
                fn = reads[name]
                m = fn._time_size
                row_i = step_row(t, toff, m)
                row = jax.lax.dynamic_index_in_dim(out[name], row_i, 0,
                                                   keepdims=False)
                for j, d in enumerate(fn.space_dimensions):
                    part = self.parts.get(d.name)
                    w = margins[j]
                    if part is None or w == 0:
                        continue
                    axn, nparts, lext = part
                    hl, hr = fn.halo[j]
                    row = _exchange_axis(row, j, w, axn, nparts, hl, lext,
                                         jnp, lax)
                out[name] = jax.lax.dynamic_update_index_in_dim(
                    out[name], row, row_i, 0)
            return out

        return exchange

    # -- boundary-crossing layout ------------------------------------------

    def _interior_slices(self, fn):
        lead = (slice(None),) if fn.is_TimeFunction or \
            getattr(fn, '_time_size', None) else ()
        if fn.is_TimeFunction:
            lead = (slice(None),)
        else:
            lead = ()
        return lead + tuple(slice(hl, hl + n) for n, (hl, hr) in
                            zip(type(fn)._space_shape, fn.halo))

    def _spec(self, fn):
        from jax.sharding import PartitionSpec
        names = []
        if fn.is_TimeFunction:
            names.append(None)
        for d in fn.space_dimensions:
            part = self.parts.get(d.name)
            names.append(part[0] if part else None)
        return PartitionSpec(*names)

    def _pad_local(self, fn, arr, jnp):
        """Zero-pad a local interior block to the canonical halo+lane
        layout and reconstruct the halo content per its provenance."""
        import jax
        from jax import lax
        lead = 1 if fn.is_TimeFunction else 0
        pads = [(0, 0)] * lead
        lz = None
        for j, ((hl, hr), n, t) in enumerate(zip(
                fn.halo, type(fn)._space_shape, self.dist.topology)):
            ln = n // t
            pad_r = hr
            if j == len(fn.halo) - 1:
                # lane-align the local allocation like shape_allocated
                from ..utils import round_up
                total = round_up(ln + hl + hr, 128)
                pad_r = total - ln - hl
            pads.append((hl, pad_r))
        arr = jnp.pad(arr, pads)
        # read-only params: fill halos once (exchange + edge replication)
        state = getattr(fn, 'halo_state', 'zero')
        needed = None
        for (name, tk, toff), margins in self.needs.items():
            if name == fn.name and tk is None:
                needed = margins
        if needed is not None:
            for j, d in enumerate(fn.space_dimensions):
                part = self.parts.get(d.name)
                if part is None:
                    continue
                axn, nparts, lext = part
                hl, hr = fn.halo[j]
                w = needed[j]
                if w:
                    arr = _exchange_axis(arr, lead + j, w, axn, nparts, hl,
                                         lext, jnp, lax)
                if state == 'edge':
                    arr = _edge_replicate(arr, lead + j, axn, nparts, hl,
                                          hr, lext, jnp, lax)
        return arr

    # -- the sharded callable ------------------------------------------------

    def build(self):
        import jax
        import jax.numpy as jnp
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        op = self.op
        mesh = self.dist.mesh
        reads = op._reads
        writes = set(op._writes)

        in_specs_w = {}
        in_specs_r = {}
        from jax.sharding import PartitionSpec
        P0 = PartitionSpec()

        def classify(name):
            fn = reads.get(name)
            if fn is None or fn.is_SparseFunction or fn.grid is None:
                return None, P0
            return fn, self._spec(fn)

        def run_local(wbufs, rbufs, params, tm, tM):
            # re-pad every grid buffer to the canonical local halo layout
            wpad, rpad = {}, {}
            for name, arr in wbufs.items():
                fn = reads[name]
                if fn.is_SparseFunction or fn.grid is None:
                    wpad[name] = arr
                else:
                    wpad[name] = self._pad_local(fn, arr, jnp)
            for name, arr in rbufs.items():
                fn = reads.get(name)
                if fn is None or fn.is_SparseFunction or fn.grid is None:
                    rpad[name] = arr
                else:
                    rpad[name] = self._pad_local(fn, arr, jnp)
            out = self.runner(wpad, rpad, params, tm, tM)
            # return interior views
            res = {}
            for name, arr in out.items():
                fn = reads[name]
                if fn.is_SparseFunction or fn.grid is None:
                    res[name] = arr
                else:
                    lead = (slice(None),) if fn.is_TimeFunction else ()
                    sl = lead + tuple(
                        slice(hl, hl + n // t) for (hl, hr), n, t in zip(
                            fn.halo, type(fn)._space_shape,
                            self.dist.topology))
                    res[name] = arr[sl]
            return res

        def make(wnames, rnames, pnames):
            wspecs = {n: classify(n)[1] for n in wnames}
            rspecs = {n: (P0 if n.endswith('_coords') and
                          n[:-7] in op._sparse else classify(n)[1])
                      for n in rnames}
            kw = dict(mesh=mesh,
                      in_specs=(wspecs, rspecs,
                                {n: P0 for n in pnames}, P0, P0),
                      out_specs={n: classify(n)[1] for n in wnames})
            try:
                f = shard_map(run_local, check_rep=False, **kw)
            except TypeError:  # jax>=0.8: check_vma replaces check_rep
                f = shard_map(run_local, check_vma=False, **kw)
            return jax.jit(f, donate_argnums=(0,))

        self._make = make
        return self

    def prepare_buffers(self, wbufs, rbufs):
        """Global padded buffers -> sharded interior views."""
        import jax
        import jax.numpy as jnp
        reads = self.op._reads
        mesh = self.dist.mesh
        from jax.sharding import NamedSharding, PartitionSpec

        def conv(name, arr):
            fn = reads.get(name)
            if fn is None or fn.is_SparseFunction or fn.grid is None:
                return jax.device_put(
                    arr, NamedSharding(mesh, PartitionSpec()))
            interior = arr[self._interior_slices(fn)]
            return jax.device_put(
                interior, NamedSharding(mesh, self._spec(fn)))

        return ({k: conv(k, v) for k, v in wbufs.items()},
                {k: conv(k, v) for k, v in rbufs.items()})

    def restore(self, name, arr, jnp):
        """Sharded interior output -> canonical padded global array (halo
        re-zeroed; eligibility guarantees it was zero)."""
        fn = self.op._reads[name]
        if fn.is_SparseFunction or fn.grid is None:
            return arr
        lead = 1 if fn.is_TimeFunction else 0
        pads = [(0, 0)] * lead
        for j, ((hl, hr), n) in enumerate(zip(fn.halo,
                                              type(fn)._space_shape)):
            pad_r = hr
            if j == len(fn.halo) - 1:
                from ..utils import round_up
                total = round_up(n + hl + hr, 128)
                pad_r = total - n - hl
            pads.append((hl, pad_r))
        return jnp.pad(arr, pads)
