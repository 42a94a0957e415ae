"""Run doctests across devito_tpu subpackages (reference:
tests/test_docstrings.py — ``doctest.testmod`` parametrized over every
devito subpackage)."""

import doctest
import importlib
import pkgutil

import pytest

import devito_tpu

MODULES = []
for m in pkgutil.walk_packages(devito_tpu.__path__,
                               prefix='devito_tpu.'):
    if any(part.startswith('_') for part in m.name.split('.')):
        continue
    MODULES.append(m.name)


@pytest.mark.parametrize('modname', MODULES)
def test_docstrings(modname):
    mod = importlib.import_module(modname)
    res = doctest.testmod(mod, verbose=False)
    assert res.failed == 0, f"{res.failed} doctest failures in {modname}"
