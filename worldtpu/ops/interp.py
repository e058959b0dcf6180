"""Interpolation primitives with MATLAB-replica edge semantics.

These are batched-first jnp re-implementations of the reference's
`interp1` / `interp1Q` / `histc` trio
(/root/reference/src/world_matlabfunctions.cpp:136-241).

The reference's interp1 clamps queries through `histc`: a query left of
``x[0]`` extrapolates with the first segment, a query at or beyond ``x[-1]``
extrapolates with the last segment, and a query exactly equal to an interior
knot takes the segment to its *right*.  That is exactly
``k = clip(searchsorted(x, xi, side='right'), 1, len(x)-1)`` followed by
linear evaluation on segment ``[x[k-1], x[k]]`` — verified against the C++
in tests/test_ops.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def interp1(x, y, xi, n_valid=None):
    """Linear interpolation with histc edge semantics.

    Args:
        x: [N] knot positions, increasing. May be padded past ``n_valid``
           (pad with +inf so searchsorted ignores the tail).
        y: [N] knot values.
        xi: [...] query positions.
        n_valid: optional scalar count of valid knots (dynamic). When given,
           the segment index is clamped to ``[1, n_valid-1]``.

    Returns:
        [...] interpolated values (same dtype as y).
    """
    k = jnp.searchsorted(x, xi, side="right")
    hi = (jnp.asarray(n_valid) if n_valid is not None else x.shape[0]) - 1
    k = jnp.clip(k, 1, hi)
    x0 = jnp.take(x, k - 1)
    x1 = jnp.take(x, k)
    y0 = jnp.take(y, k - 1)
    y1 = jnp.take(y, k)
    s = (xi - x0) / (x1 - x0)
    return y0 + s * (y1 - y0)


def interp1q(x0, dx, y, xi, delta_clamp_last=True):
    """Uniform-grid linear interpolation (reference interp1Q).

    ``base = int((xi - x0)/dx)`` truncates toward zero like the C cast
    (/root/reference/src/world_matlabfunctions.cpp:228), and the final
    segment's slope is zeroed (``delta_y[x_length-1] = 0``, :232).

    Args:
        x0: scalar grid origin.
        dx: scalar grid step (may be negative, as DCCorrection uses).
        y: [N] values on the uniform grid.
        xi: [...] query positions.

    Returns:
        [...] interpolated values.
    """
    pos = (xi - x0) / dx
    base = pos.astype(jnp.int32)  # truncation toward zero, like C int cast
    frac = pos - base.astype(pos.dtype)
    n = y.shape[-1]
    base_c = jnp.clip(base, 0, n - 1)
    y0 = jnp.take(y, base_c)
    y1 = jnp.take(y, jnp.clip(base_c + 1, 0, n - 1))
    delta = y1 - y0
    if delta_clamp_last:
        delta = jnp.where(base_c >= n - 1, 0.0, delta)
    return y0 + delta * frac
