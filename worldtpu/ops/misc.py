"""Remaining MATLAB-replica utilities from the reference's public surface.

Reference: fast_fftfilt and matlab_std
(/root/reference/src/world_matlabfunctions.cpp:266-313).  Neither is called
by the reference pipeline itself, but both are exported API.
"""

from __future__ import annotations

import jax.numpy as jnp


def fast_fftfilt(x, h, fft_size):
    """FFT convolution (reference fast_fftfilt :266-301).

    The reference divides both inputs by fft_size and applies its x2-scaled
    unnormalized c2r, so the net output equals the first fft_size samples of
    the circular convolution scaled by 1/fft_size.

    Args:
        x: [N] signal (N <= fft_size).
        h: [M] filter (M <= fft_size).
    Returns:
        [fft_size] filtered signal.
    """
    X = jnp.fft.rfft(x / fft_size, n=fft_size)
    Hs = jnp.fft.rfft(h / fft_size, n=fft_size)
    # reference: product of conj-convention spectra through its c2r
    # == fft_size * standard irfft of the standard product
    return jnp.fft.irfft(X * Hs, n=fft_size) * fft_size


def matlab_std(x):
    """Sample standard deviation with N-1 normalization (reference :303-313)."""
    x = jnp.asarray(x)
    mean = jnp.mean(x)
    return jnp.sqrt(jnp.sum((x - mean) ** 2) / (x.shape[-1] - 1))


def matlab_round(x):
    """Half-away-from-zero rounding (reference matlab_round :212-214)."""
    return jnp.where(x > 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5)).astype(jnp.int32)


def fftshift(x):
    """Even-length fftshift (reference :129-134)."""
    n = x.shape[-1]
    return jnp.roll(x, n // 2, axis=-1)


def diff(x):
    """First difference, length N-1 (reference diff :216-218)."""
    x = jnp.asarray(x)
    return x[..., 1:] - x[..., :-1]


def histc(x, edges):
    """MATLAB histc bin indices (1-based segment count like the reference's
    helper, /root/reference/src/world_matlabfunctions.cpp:136-155)."""
    k = jnp.searchsorted(x, edges, side="right")
    return jnp.clip(k, 1, x.shape[-1] - 1)
