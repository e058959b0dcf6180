"""FFT helpers: size rules and batched minimum-phase spectrum.

Reference: GetSuitableFFTSize (/root/reference/src/world_common.cpp:56-59) and
MinimumPhaseAnalysis::compute (/root/reference/src/world_common.cpp:196-233).

Convention note: the reference's Ooura-backed FFT stores the CONJUGATE of the
numpy/FFTW forward spectrum and its c2r inverse is ``n * irfft(conj(S))``
(probed empirically against the C++ in tests/test_ops.py).  All worldtpu code
uses the standard numpy convention; the conjugations cancel everywhere a
spectrum round-trips, and the one visible effect — the reference's
minimum-phase spectrum being conj(standard) — cancels against its c2r.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def get_suitable_fft_size(sample: int) -> int:
    """2**(int(log2(sample)) + 1) — reference GetSuitableFFTSize."""
    return int(2 ** (int(math.log(sample) / math.log(2.0)) + 1))


def fft_size_for_cheaptrick(fs: int, f0_floor: float) -> int:
    """Reference CheapTrick::getFFTSizeForCheapTrick
    (/root/reference/src/cheaptrick.cpp:97-100)."""
    return int(2 ** (1 + int(math.log(3.0 * fs / f0_floor + 1) / math.log(2.0))))


def f0_floor_for_cheaptrick(fs: int, fft_size: int) -> float:
    """Reference CheapTrick::getF0FloorForCheapTrick
    (/root/reference/src/cheaptrick.cpp:102-105)."""
    return 3.0 * fs / (fft_size - 3.0)


def minimum_phase(log_amplitude):
    """Minimum-phase complex spectrum from a half log-amplitude spectrum.

    Standard cepstral construction (equal to the reference's
    MinimumPhaseAnalysis::compute up to its internal conjugate convention):
    mirror the log spectrum, take the (real) cepstrum, causalize (double the
    positive quefrencies, zero the negative), and exponentiate the complex
    spectrum of the folded cepstrum.

    Args:
        log_amplitude: [..., K] half spectrum of log-amplitudes,
            K = fft_size//2 + 1 (power-of-two fft_size).

    Returns:
        [..., K] complex minimum-phase spectrum.
    """
    k = log_amplitude.shape[-1]
    n = 2 * (k - 1)
    # the mirrored log spectrum is real and even, so its cepstrum is real:
    # irfft(half) == ifft(mirror(half)), and after causal folding the
    # spectrum is rfft(folded) — two REAL transforms instead of two complex
    from worldtpu.ops import dft
    cep = dft.irfft(log_amplitude, n=n)
    scale = jnp.concatenate([
        jnp.ones((1,)), 2.0 * jnp.ones((n // 2 - 1,)),
        jnp.ones((1,)), jnp.zeros((n // 2 - 1,))]).astype(cep.dtype)
    return jnp.exp(dft.rfft(cep * scale))
