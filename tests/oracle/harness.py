"""Run the reference Devito checkout (/root/reference) as a numerical
oracle, in-process, using clean-room stand-ins for its absent third-party
codegen deps (cgen/codepy/anytree/cpuinfo — see ``_stubs/``).

The reference generates C, we compile it with the system gcc and run it
via ctypes — its own execution model — so oracle numbers are the real
thing, not a reimplementation.

Both this repo and the reference have a top-level ``examples`` package, so
the harness keeps the reference's directory on ``sys.path`` only inside
``use()`` blocks and swaps the conflicting ``examples*`` entries in
``sys.modules`` on entry/exit. The reference's ``devito`` module itself
stays cached across uses (it holds global state).

Usage (tests):

    ref = reference()            # skips the test if unavailable
    with ref.use():
        import devito as dv
        mod = ref.import_examples('seismic.acoustic.acoustic_example')
"""

import importlib
import os
import sys
from contextlib import contextmanager

import pytest

REFERENCE_DIR = os.environ.get('DEVITO_TPU_REFERENCE', '/root/reference')
_STUBS = os.path.join(os.path.dirname(os.path.abspath(__file__)), '_stubs')

_state = {'checked': None, 'ours_examples': {}, 'ref_examples': {}}


def available():
    """True if the reference checkout can be imported and can JIT."""
    if _state['checked'] is None:
        _state['checked'] = _probe()
    return _state['checked']


def _probe():
    if not os.path.isdir(os.path.join(REFERENCE_DIR, 'devito')):
        return False
    try:
        with _pathctx():
            devito = importlib.import_module('devito')
            # smoke: build + run a trivial operator through the C JIT
            g = devito.Grid(shape=(4, 4))
            f = devito.Function(name='oracle_probe', grid=g)
            devito.Operator(devito.Eq(f, 1))()
            return bool((f.data == 1).all())
    except Exception:
        return False


def _is_ref_mod(mod):
    f = getattr(mod, '__file__', None) or ''
    paths = list(getattr(mod, '__path__', ())) if hasattr(mod, '__path__') \
        else []
    return f.startswith(REFERENCE_DIR) or \
        any(p.startswith(REFERENCE_DIR) for p in paths)


def _stash_examples(into, keep_ref):
    """Move ``examples*`` modules out of sys.modules into ``into``;
    ``keep_ref`` selects which side to stash (True: stash non-reference
    modules, False: stash reference modules)."""
    for k in [k for k in sys.modules
              if k == 'examples' or k.startswith('examples.')]:
        mod = sys.modules[k]
        if _is_ref_mod(mod) != keep_ref:
            into[k] = sys.modules.pop(k)


@contextmanager
def _pathctx():
    if _STUBS not in sys.path:
        sys.path.insert(0, _STUBS)
    added_ref = REFERENCE_DIR not in sys.path
    if added_ref:
        sys.path.insert(0, REFERENCE_DIR)
    # our examples out, previously-imported reference examples back in
    _stash_examples(_state['ours_examples'], keep_ref=True)
    sys.modules.update(_state['ref_examples'])
    _state['ref_examples'].clear()
    try:
        yield
    finally:
        if added_ref and REFERENCE_DIR in sys.path:
            sys.path.remove(REFERENCE_DIR)
        # reference examples out, ours back in
        _stash_examples(_state['ref_examples'], keep_ref=False)
        sys.modules.update(_state['ours_examples'])
        _state['ours_examples'].clear()


class _Oracle:
    @contextmanager
    def use(self):
        with _pathctx():
            yield

    def devito(self):
        with _pathctx():
            return importlib.import_module('devito')

    def import_examples(self, name):
        """Import ``examples.<name>`` from the reference checkout. Only
        valid inside a ``use()`` block."""
        assert REFERENCE_DIR in sys.path, \
            "import_examples() must be called inside reference().use()"
        return importlib.import_module(f'examples.{name}')


def reference():
    """Return the oracle handle, or skip the calling test."""
    if not available():
        pytest.skip("reference Devito checkout not available as oracle")
    return _Oracle()
