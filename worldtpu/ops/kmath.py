"""Polynomial trig for Pallas TPU kernels.

Mosaic lowers jnp.cos/sin through the full-precision libm-style expansion;
the refine kernel's per-group seeds (ops/refine_kernel.py) evaluate 14
[8, 128] transcendental tiles per candidate group, which is a large share
of its per-group fixed cost.  The f32 production path only needs ~1e-6
absolute accuracy there (the in-kernel rotation chains already tolerate
1e-6 drift, and the jnp-parity tests gate at rtol 2e-3), so a range-
reduced minimax polynomial — ~16 VPU ops for a cos/sin pair — replaces
them.

Coefficients are least-squares fits on dense Chebyshev nodes over
[-pi, pi]; max abs error 7.9e-7 (cos, degree 10) / 9.7e-8 (sin, degree
11).  Range reduction subtracts round(x / 2pi) * 2pi, adding |x|*eps_f32
phase error (~4e-6 rad at the refine kernel's largest window angles).

Pure jnp ops, so the same code runs under the Pallas interpreter and
inside compiled kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

_TWO_PI = 6.283185307179586
_INV_TWO_PI = 0.15915494309189535

_COS_C = (9.99999211e-01, -4.99994213e-01, 4.16597776e-02,
          -1.38587892e-03, 2.42029321e-05, -2.19729219e-07)
_SIN_C = (9.99999600e-01, -1.66665526e-01, 8.33240296e-03,
          -1.98086326e-04, 2.69971383e-06, -2.03622121e-08)


def _reduce(x):
    return x - _TWO_PI * jnp.round(x * _INV_TWO_PI)


def _poly_even(x2, coeffs):
    acc = jnp.full_like(x2, coeffs[-1])
    for c in coeffs[-2::-1]:
        acc = acc * x2 + c
    return acc


def fast_cos(x):
    r = _reduce(x)
    return _poly_even(r * r, _COS_C)


def fast_sin(x):
    r = _reduce(x)
    return r * _poly_even(r * r, _SIN_C)


def fast_cossin(x):
    """cos(x), sin(x) sharing one range reduction and square."""
    r = _reduce(x)
    r2 = r * r
    return _poly_even(r2, _COS_C), r * _poly_even(r2, _SIN_C)
