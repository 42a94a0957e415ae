"""Global configuration.

Reference parity: devito/parameters.py (``configuration`` dict with
accepted-value validation, env-var init from ``DEVITO_*``, ``switchconfig``
context manager). The TPU build reads ``DEVITO_TPU_*`` env vars and keeps
the same accessor API; keys that only make sense for the C/MPI backend
(compiler sniffing, jit-backdoor, ...) are consciously dropped
(SURVEY.md anti-goals).
"""

import os
from contextlib import contextmanager

from .exceptions import InvalidArgument
from .logger import set_log_level

__all__ = ['configuration', 'switchconfig']


class Parameters(dict):
    """A dictionary with accepted-value validation and update callbacks."""

    def __init__(self):
        super().__init__()
        self._accepted = {}
        self._callbacks = {}
        self._defaults = {}

    def add(self, key, default, accepted=None, callback=None):
        self._accepted[key] = accepted
        self._defaults[key] = default
        if callback is not None:
            self._callbacks[key] = callback
        self[key] = default

    def __setitem__(self, key, value):
        accepted = self._accepted.get(key)
        if accepted is not None and value not in accepted:
            raise InvalidArgument(
                f"Illegal configuration value {value!r} for key {key!r}; "
                f"accepted: {accepted}")
        super().__setitem__(key, value)
        cb = self._callbacks.get(key)
        if cb is not None:
            cb(value)


configuration = Parameters()

configuration.add('log-level', 'INFO',
                  accepted=['DEBUG', 'PERF', 'INFO', 'WARNING', 'ERROR'],
                  callback=set_log_level)
# Lowering/backend mode: 'advanced' = fused XLA/Pallas pipeline,
# 'noop' = plain per-equation XLA slices (oracle/fallback), mirroring
# the reference's opt-mode registry (devito/operator/registry.py).
configuration.add('opt', 'advanced', accepted=['noop', 'advanced', 'xla', 'pallas'])
# Compute backend for stencil kernels inside the jitted step.
configuration.add('backend', 'auto', accepted=['auto', 'xla', 'pallas'])
# multi-chip halo exchange: 'auto' uses the explicit shard_map+ppermute
# path (parallel/halo.py) when the schedule is eligible, else GSPMD;
# 'gspmd' forces the XLA SPMD partitioner; 'explicit' errors if ineligible
configuration.add('halo', 'auto', accepted=['auto', 'explicit', 'gspmd'])
# XLA backend compiler options, 'k=v,k2=v2' (the analog of the
# reference's compiler-flags registry, arch/compiler.py): passed to every
# executable compile, e.g. 'xla_tpu_msa_use_minimalloc=true'
configuration.add('xla-options', '')
configuration.add('cire', True, accepted=[True, False])
# save=nt wavefield host streaming (the reference's buffering + tasking
# + Orchestrator analog, devito/passes/clusters/buffering.py:27): 'auto'
# streams when the save buffers exceed `save-budget` bytes of device
# memory, 'on' always streams, 'off' keeps full device residency.
configuration.add('save-streaming', 'auto', accepted=['auto', 'on', 'off'])
configuration.add('save-budget', 4 << 30)
configuration.add('develop-mode', False, accepted=[True, False])
configuration.add('safe-math', False, accepted=[True, False])
configuration.add('autotuning', 'off', accepted=['off', 'basic', 'aggressive'])
configuration.add('profiling', 'basic',
                  accepted=['basic', 'advanced', 'measured'])
# when set to a directory path, Operator.apply wraps execution in
# jax.profiler.trace(dir) (TensorBoard/Perfetto timeline)
configuration.add('profile-dir', None)
configuration.add('ignore-unknowns', False, accepted=[True, False])
# Default floating dtype name used when a Grid does not specify one.
configuration.add('dtype', 'float32', accepted=['float32', 'float64', 'bfloat16'])
configuration.add('jit-cache', True, accepted=[True, False])

_ENV_MAP = {
    'DEVITO_TPU_LOG_LEVEL': 'log-level',
    'DEVITO_LOGGING': 'log-level',
    'DEVITO_TPU_OPT': 'opt',
    'DEVITO_TPU_BACKEND': 'backend',
    'DEVITO_TPU_HALO': 'halo',
    'DEVITO_TPU_XLA_OPTIONS': 'xla-options',
    'DEVITO_TPU_CIRE': 'cire',
    'DEVITO_TPU_DEVELOP': 'develop-mode',
    'DEVITO_TPU_SAFE_MATH': 'safe-math',
    'DEVITO_TPU_AUTOTUNING': 'autotuning',
    'DEVITO_TPU_PROFILE_DIR': 'profile-dir',
    'DEVITO_TPU_DTYPE': 'dtype',
}


def init_configuration():
    for env, key in _ENV_MAP.items():
        if env in os.environ:
            val = os.environ[env]
            if val in ('0', 'False', 'false'):
                val = False
            elif val in ('1', 'True', 'true'):
                val = True
            configuration[key] = val


init_configuration()


class switchconfig:
    """Context manager/decorator to temporarily override configuration.

    Keys may be given with '_' in place of '-' (reference behavior).
    """

    def __init__(self, **params):
        self.params = {k.replace('_', '-'): v for k, v in params.items()}

    def __enter__(self):
        self.previous = {k: configuration[k] for k in self.params}
        for k, v in self.params.items():
            configuration[k] = v
        return self

    def __exit__(self, *args):
        for k, v in self.previous.items():
            configuration[k] = v

    def __call__(self, func):
        from functools import wraps

        @wraps(func)
        def wrapper(*args, **kwargs):
            with self:
                return func(*args, **kwargs)
        return wrapper
