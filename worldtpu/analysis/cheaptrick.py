"""CheapTrick spectral-envelope estimation, batched over frames.

Reference: /root/reference/src/cheaptrick.cpp.  The reference runs one frame
per OpenMP iteration (:64-88); here every frame is one row of a batched
tensor program: gather the F0-adaptive window -> rfft -> |.|^2 -> DC
correction -> linear smoothing -> cepstral liftering -> exp, with two batched
real FFTs per utterance total.

Ragged detail: the window length 2*round(1.5*fs/f0)+1 varies per frame; rows
are padded to the f0_floor worst case with zero window weights.  The power
spectrum is invariant to where the window sits in the FFT buffer, so padding
does not perturb parity (verified against C++ fixtures).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from worldtpu import constants as C
from worldtpu.ops import dft, filters, trig
from worldtpu.ops.fftutil import fft_size_for_cheaptrick, f0_floor_for_cheaptrick


def _matlab_round(x):
    """Half-away-from-zero rounding like the reference's matlab_round."""
    return jnp.where(x > 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5)).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("fs", "fft_size", "max_half_window"))
def cheaptrick_frames(x, f0, temporal_positions, *, fs, fft_size,
                      max_half_window, q1=-0.15, f0_floor=None,
                      window_dither=None, spectrum_dither=None):
    """Spectral envelope for all frames at once.

    Args:
        x: [T] waveform.
        f0: [F] F0 contour (0 = unvoiced).
        temporal_positions: [F] frame times in seconds.
        fs: sample rate (static).
        fft_size: static FFT size (getFFTSizeForCheapTrick).
        max_half_window: static bound round(1.5*fs/effective_floor).
        q1: liftering coefficient.
        f0_floor: effective floor; f0 <= floor uses kDefaultF0
            (reference :76).  Defaults to getF0FloorForCheapTrick(fs, fft_size).
        window_dither: optional [F, 2*max_half_window+1] parity dither added
            to the windowed waveform (the reference's randn()*1e-15, :153).
        spectrum_dither: optional [F, K] parity noise floor (|randn()|*kEps,
            :227).  When None, a deterministic kEps floor is added instead.

    Returns:
        [F, K] spectral envelope (power), K = fft_size//2 + 1.
    """
    if f0_floor is None:
        f0_floor = f0_floor_for_cheaptrick(fs, fft_size)
    dt = x.dtype
    f0 = f0.astype(dt)
    K = fft_size // 2 + 1
    W = 2 * max_half_window + 1

    cf0 = jnp.where(f0 <= f0_floor, C.DEFAULT_F0, f0)  # [F]

    # ---- F0-adaptive windowing (reference :137-196) ----
    half = _matlab_round(1.5 * fs / cf0)                      # [F]
    offs = jnp.arange(W, dtype=jnp.int32) - max_half_window   # [W]
    in_win = jnp.abs(offs)[None, :] <= half[:, None]          # [F, W]
    origin = _matlab_round(temporal_positions.astype(dt) * fs + 0.001)
    if dt == jnp.float64:  # parity path: the literal clipped gather
        safe = jnp.clip(origin[:, None] + offs[None, :], 0, x.shape[0] - 1)
        seg = x[safe]                                         # [F, W]
    else:
        # contiguous rows via edge-padded dynamic_slice — bitwise equal to
        # the clipped gather (only window tails clip) at ~W fewer gather
        # descriptors per frame (same trick as d4c/refine_kernel)
        xpad = jnp.pad(x, (max_half_window, max_half_window), mode="edge")
        seg = jax.vmap(
            lambda s: jax.lax.dynamic_slice(xpad, (s,), (W,)))(
                jnp.clip(origin, 0, x.shape[0] - 1))

    if dt != jnp.float64:
        # seed-and-rotate Hanning (ops/trig.py): f32-round-off exact with
        # ~15x fewer transcendentals; the f64 parity path stays literal
        alpha = (C.PI / 1.5 / fs) * cf0
        win = 0.5 * trig.cos_affine(alpha, -alpha * max_half_window, W) + 0.5
    else:
        position = offs.astype(dt)[None, :] / 1.5 / fs
        win = 0.5 * jnp.cos(C.PI * position * cf0[:, None]) + 0.5
    win = jnp.where(in_win, win, 0.0)
    win = win / jnp.sqrt(jnp.sum(win * win, -1, keepdims=True))

    wave = seg * win
    if window_dither is not None:
        wave = wave + jnp.where(in_win, window_dither.astype(dt), 0.0)
    weight = jnp.sum(wave, -1, keepdims=True) / jnp.sum(win, -1, keepdims=True)
    wave = wave - win * weight
    wave = jnp.where(in_win, wave, 0.0)

    # ---- power spectrum + DC correction (:198-218) ----
    spec = dft.rfft(wave, n=fft_size)
    power = (spec.real * spec.real + spec.imag * spec.imag).astype(dt)
    if dt == jnp.float64:   # parity path: literal per-frame rounding
        power = jax.vmap(
            lambda p, f: filters.dc_correction(p, f, fs, fft_size))(
                power, cf0)
    else:
        power = filters.dc_correction_frames(
            power, cf0, fs, fft_size, 1.2 * C.CEIL_F0)

    # ---- linear smoothing, width 2*f0/3 (:126) ----
    max_b = int(2.0 * 1.2 * C.CEIL_F0 / 3.0 * fft_size / fs) + 2
    power = filters.linear_smoothing_frames(
        power, cf0 * 2.0 / 3.0, fs, fft_size, max_b)

    # ---- infinitesimal noise floor (:220-228) ----
    if dt != jnp.float64:
        # float32 smoothing can leave tiny negative residuals; clamp before
        # the log (the f64 parity path matches the reference exactly instead)
        power = jnp.maximum(power, 0.0)
    if spectrum_dither is not None:
        power = power + jnp.abs(spectrum_dither.astype(dt)) * C.EPS
    else:
        power = power + C.EPS

    # ---- cepstral liftering with recovery (:230-276) ----
    i = jnp.arange(K, dtype=dt)
    quef = i / fs
    pfq = C.PI * cf0[:, None] * quef[None, :]
    if dt != jnp.float64:
        # sin via the cos seed shifted -pi/2; cos(2x) = 1 - 2 sin(x)^2
        alpha_q = C.PI * cf0 / fs
        sin_pf = trig.cos_affine(alpha_q, jnp.full_like(alpha_q,
                                                        -0.5 * C.PI), K)
        smoothing = jnp.where(i[None, :] == 0, 1.0, sin_pf / pfq)
        cos2 = 1.0 - 2.0 * sin_pf * sin_pf
    else:
        smoothing = jnp.where(i[None, :] == 0, 1.0, jnp.sin(pfq) / pfq)
        cos2 = jnp.cos(2.0 * pfq)
    compensation = (1.0 - 2.0 * q1) + 2.0 * q1 * cos2
    lifter = smoothing * compensation

    logp = jnp.log(power)
    # mirror indices 1..fft/2-1 reversed into the upper half (reference :258)
    mirrored = jnp.concatenate([logp, logp[:, 1:-1][:, ::-1]], -1)
    ceps = dft.rfft_real(mirrored)   # real-even input: transform is real
    env = dft.irfft(ceps * lifter, n=fft_size)[:, :K]
    return jnp.exp(env)


class CheapTrickKernel:
    """Convenience wrapper holding static geometry for one (fs, fft_size)."""

    def __init__(self, fs, fft_size=None, f0_floor=71.0, q1=-0.15):
        self.fs = fs
        self.fft_size = fft_size or fft_size_for_cheaptrick(fs, f0_floor)
        self.f0_floor = f0_floor_for_cheaptrick(fs, self.fft_size)
        self.q1 = q1
        # worst-case half window from the effective floor (ctor geometry,
        # reference /root/reference/src/harvest.cpp:85 analog)
        self.max_half_window = int(1.5 * fs / self.f0_floor + 0.5)

    def __call__(self, x, f0, temporal_positions, **kw):
        return cheaptrick_frames(
            x, f0, temporal_positions, fs=self.fs, fft_size=self.fft_size,
            max_half_window=self.max_half_window, q1=self.q1,
            f0_floor=self.f0_floor, **kw)
