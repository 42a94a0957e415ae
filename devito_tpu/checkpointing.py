"""Checkpoint/recompute for adjoint gradients.

Reference parity: devito/checkpointing/checkpoint.py (DevitoCheckpoint:49,
CheckpointOperator:7) + the pyrevolve Revolver. The TPU build implements a
sqrt-segmented store/recompute schedule natively (no C++ backend): one
forward pass stores ``n_checkpoints`` rolling-buffer snapshots; the reverse
pass reloads the nearest snapshot and re-advances to each timestep before
applying the reverse operator — memory O(sqrt(nt)) snapshots for ~2x
forward recompute, the same asymptotics pyrevolve's Griewank-Walther
schedule optimizes.
"""

import math

import numpy as np

from .utils import as_tuple

__all__ = ['CheckpointOperator', 'DevitoCheckpoint', 'Revolver']


class CheckpointOperator:
    """Adapt ``op.apply(t_start, t_end)`` segment execution (reference:
    checkpointing/checkpoint.py:7)."""

    def __init__(self, op, **kwargs):
        self.op = op
        self.kwargs = kwargs

    def apply(self, t_start, t_end):
        if t_end < t_start:
            return
        kw = dict(self.kwargs)
        kw.pop('time_m', None)
        kw.pop('time_M', None)
        self.op.apply(time_m=int(t_start), time_M=int(t_end), **kw)


class DevitoCheckpoint:
    """Snapshot container for a set of (rolling-buffer) TimeFunctions
    (reference: checkpointing/checkpoint.py:49)."""

    def __init__(self, objects):
        self.objects = as_tuple(objects)

    @property
    def size(self):
        return sum(int(np.prod(o.shape_allocated)) for o in self.objects)

    def save(self):
        return [np.array(o.data_with_halo, copy=True) for o in self.objects]

    def load(self, state):
        for o, s in zip(self.objects, state):
            o.data_with_halo[:] = s


class Revolver:
    """Segmented store/recompute driver.

    ``Revolver(checkpoint, wrap_fw, wrap_rev, n_checkpoints, nt)`` —
    ``wrap_fw``/``wrap_rev`` are CheckpointOperators for the forward and
    reverse (gradient) operators; ``nt`` is the number of forward steps.
    """

    def __init__(self, checkpoint, wrap_fw, wrap_rev, n_checkpoints, nt,
                 t_min=0):
        self.cp = checkpoint
        self.fwd = wrap_fw
        self.rev = wrap_rev
        self.nt = int(nt)
        self.t_min = int(t_min)
        if not n_checkpoints:
            n_checkpoints = max(1, int(math.sqrt(self.nt)))
        self.n_checkpoints = int(n_checkpoints)
        # checkpoint positions (time indices at segment starts)
        nseg = self.n_checkpoints
        bounds = np.linspace(self.t_min, self.t_min + self.nt,
                             nseg + 1).astype(int)
        self._segments = [(int(a), int(b)) for a, b in
                          zip(bounds[:-1], bounds[1:]) if b > a]
        self._stored = {}

    def apply_forward(self):
        """Forward sweep, storing a snapshot at each segment start."""
        for (a, b) in self._segments:
            self._stored[a] = self.cp.save()
            self.fwd.apply(a, b - 1)

    def apply_reverse(self):
        """Reverse sweep: per segment (last to first), reload the snapshot
        and re-advance to each timestep before the reverse step."""
        for (a, b) in reversed(self._segments):
            for t in range(b - 1, a - 1, -1):
                self.cp.load(self._stored[a])
                if t - 1 >= a:
                    self.fwd.apply(a, t - 1)
                self.rev.apply(t, t)
        self._stored.clear()
