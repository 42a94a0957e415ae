"""Reduction builtins: norm, inner, mmin, mmax, sum.

Reference parity: devito/builtins/arithmetic.py:11-209 (norm, sumall,
inner, mmin, mmax — built as small Operators with DistReduce for MPI).
TPU-native: computed directly with jnp on the device buffer (a jit-fused
reduction; under a sharded mesh XLA inserts the psum — the DistReduce
analog)."""

import numpy as np

__all__ = ['norm', 'inner', 'mmin', 'mmax', 'mmax_abs', 'sumall', 'sum_all']


def _domain_dev(f):
    """Device view of the domain region (drop halo)."""
    import jax.numpy as jnp
    arr = f._device_array()
    if f.is_SparseFunction:
        return arr
    slices = f._leading_slices() + tuple(
        slice(l, l + n) for n, (l, r) in zip(
            f.shape if not f.is_TimeFunction else f.shape[1:], f.dev_halo))
    return arr[slices]


def norm(f, order=2):
    """lp-norm of a function over its domain."""
    import jax.numpy as jnp
    v = _domain_dev(f)
    if order == 2:
        return float(jnp.sqrt(jnp.sum(v * v)))
    return float(jnp.sum(jnp.abs(v) ** order) ** (1.0 / order))


def inner(f, g):
    """Inner product <f, g> over the domain."""
    import jax.numpy as jnp
    return float(jnp.sum(_domain_dev(f) * _domain_dev(g)))


def mmin(f):
    import jax.numpy as jnp
    return float(jnp.min(_domain_dev(f)))


def mmax(f):
    import jax.numpy as jnp
    return float(jnp.max(_domain_dev(f)))


def mmax_abs(f):
    import jax.numpy as jnp
    return float(jnp.max(jnp.abs(_domain_dev(f))))


def sumall(f):
    import jax.numpy as jnp
    return float(jnp.sum(_domain_dev(f)))


sum_all = sumall
