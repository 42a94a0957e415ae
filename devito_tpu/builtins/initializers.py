"""Initialization builtins: assign, initialize_function, gaussian_smooth.

Reference parity: devito/builtins/initializers.py (assign:12,
gaussian_smooth:121 — iterated-convolution Operator, initialize_function:283
— pad model data into the ABC halo with 'constant'/'reflect' modes).
"""

import numpy as np

from ..utils import as_tuple

__all__ = ['assign', 'initialize_function', 'gaussian_smooth', 'smooth']


def assign(f, rhs=0, options=None, **kwargs):
    """Assign a value (or one value per function) to function data.

    ``options``: per-function dicts of Eq options (reference:
    builtins/initializers.py assign — ``options=[None, {'subdomain':
    sd}]`` restricts that function's assignment to a SubDomain)."""
    # NB: not as_tuple(f) — sympy iterates a bare Function access into
    # its (empty) args, silently no-op'ing assign(f, v)
    fns = [f] if hasattr(f, 'data') else list(as_tuple(f))
    vals = as_tuple(rhs, len(fns))
    opts = as_tuple(options, len(fns)) if options is not None else \
        (None,) * len(fns)
    for fn, v, o in zip(fns, vals, opts):
        if o:
            from ..types.equation import Eq
            from ..operator import Operator
            Operator(Eq(fn, v, **o), **kwargs).apply()
        elif np.isscalar(v):
            fn.data[:] = v
        else:
            fn.data[:] = np.asarray(v)


def initialize_function(function, data, nbl, mapper=None, mode='constant',
                        name=None, pad_halo=True, **kwargs):
    """Initialize ``function`` with ``data`` padded by ``nbl`` absorbing-
    boundary points on each side (reference: initializers.py:283).

    mode 'constant': edge-replicate; 'reflect': mirror."""
    data = np.asarray(data)
    nbl_pairs = []
    nbl = as_tuple(nbl, data.ndim) if not isinstance(nbl, tuple) or \
        not isinstance(nbl[0], tuple) else nbl
    for n in nbl:
        nbl_pairs.append(n if isinstance(n, tuple) else (n, n))
    # reference semantics: 'constant' replicates the edge sample;
    # 'reflect' mirrors INCLUDING the edge (numpy 'symmetric' — verified
    # against the executed reference)
    np_mode = 'edge' if mode == 'constant' else 'symmetric'
    padded = np.pad(data, nbl_pairs, mode=np_mode)
    if padded.shape != function.data.shape:
        raise ValueError(f"Padded shape {padded.shape} != function shape "
                         f"{function.data.shape}")
    function.data[:] = padded.astype(function.dtype)
    if pad_halo:
        # also edge-fill the outer (stencil) halo so shifted parameter
        # reads near the boundary are well-defined (reference behavior)
        function.pad_outer_halo()


def gaussian_smooth(f, sigma=1, truncate=4.0, mode='reflect'):
    """Gaussian smoothing of function data (reference: iterated-convolution
    Operator; here a separable convolution evaluated with jnp)."""
    import jax.numpy as jnp

    is_fn = hasattr(f, 'data') and not isinstance(f, np.ndarray)
    data = f.data if is_fn else np.asarray(f)
    arr = jnp.asarray(np.asarray(data, dtype=np.float64))
    sigmas = as_tuple(sigma, arr.ndim)
    for axis, s in enumerate(sigmas):
        if s <= 0:
            continue
        radius = int(truncate * float(s) + 0.5)
        x = np.arange(-radius, radius + 1)
        kernel = np.exp(-0.5 * (x / float(s)) ** 2)
        kernel /= kernel.sum()
        pad = [(0, 0)] * arr.ndim
        pad[axis] = (radius, radius)
        padded = jnp.pad(arr, pad, mode='symmetric'
                         if mode == 'reflect' else 'edge')
        out = jnp.zeros_like(arr)
        for i, w in enumerate(kernel):
            idx = [slice(None)] * arr.ndim
            idx[axis] = slice(i, i + arr.shape[axis])
            out = out + w * padded[tuple(idx)]
        arr = out
    result = np.asarray(arr).astype(data.dtype if hasattr(data, 'dtype')
                                    else np.float32)
    if is_fn:
        f.data[:] = result
        return f
    return result


def smooth(f, g, axis=None):
    """Simple moving average of ``g`` into ``f`` along one dimension
    (reference: builtins/initializers.py smooth:91 — Eq(f, g.avg(dims=axis))
    built as an Operator; here applied the same way)."""
    from ..types import Eq
    from ..operator import Operator
    if getattr(g, 'is_Constant', False):
        f.data[:] = .9 * g.data
        return
    if axis is None:
        axis = g.dimensions[-1]
    Operator(Eq(f, g.avg(dims=axis)), name='smoother')()
