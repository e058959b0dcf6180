"""Parameter codec: mel-cepstral spectral-envelope compression and coarse
band-aperiodicity compression, batched over frames as matmul/FFT programs.

Reference: /root/reference/src/codec.cpp.  The reference codes one frame at a
time through a half-size real FFT (DCT via even-odd repack, :72-114); here
all frames go through one batched rfft / fft.  The reference's conjugate FFT
convention is folded into the weight application (signs verified against the
C++ codec fixtures in tests/test_codec.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from worldtpu import constants as C
from worldtpu.ops.interp import interp1


def get_number_of_aperiodicities(fs: int) -> int:
    """Reference GetNumberOfAperiodicities (/root/reference/src/codec.cpp:211)."""
    return int(min(C.UPPER_LIMIT, fs / 2.0 - C.FREQUENCY_INTERVAL)
               / C.FREQUENCY_INTERVAL)


def _freq_to_mel(f):
    return C.M0 * jnp.log(f / C.F0_MEL + 1.0)


def _mel_to_freq(m):
    return C.F0_MEL * (jnp.exp(m / C.M0) - 1.0)


@functools.partial(jax.jit, static_argnames=("fs", "fft_size"))
def code_aperiodicity(aperiodicity, *, fs, fft_size):
    """[F, K] -> [F, n_ap] coarse dB aperiodicity (reference :216-235)."""
    dt = aperiodicity.dtype
    n_ap = get_number_of_aperiodicities(fs)
    log_ap = 20.0 * jnp.log10(aperiodicity)
    coarse_axis = C.FREQUENCY_INTERVAL * (jnp.arange(n_ap, dtype=dt) + 1.0)
    # interp1Q(0, fs/fft, log_ap, coarse_axis)
    pos = coarse_axis * fft_size / fs
    base = pos.astype(jnp.int32)
    frac = (pos - base.astype(dt))[None, :]
    k = aperiodicity.shape[-1]
    base = jnp.clip(base, 0, k - 1)
    y0 = log_ap[:, base]
    y1 = log_ap[:, jnp.clip(base + 1, 0, k - 1)]
    delta = jnp.where(base >= k - 1, 0.0, y1 - y0)
    return y0 + delta * frac


@functools.partial(jax.jit, static_argnames=("fs", "fft_size"))
def decode_aperiodicity(coded, *, fs, fft_size):
    """[F, n_ap] -> [F, K] (reference :237-265): rows whose mean coarse
    aperiodicity exceeds -0.5 dB are deemed unvoiced and left at the
    1 - 1e-12 default."""
    dt = coded.dtype
    F, n_ap = coded.shape
    K = fft_size // 2 + 1
    unvoiced = jnp.mean(coded, axis=-1) > -0.5

    coarse_axis = jnp.concatenate([
        C.FREQUENCY_INTERVAL * jnp.arange(n_ap + 1, dtype=dt),
        jnp.asarray([fs / 2.0], dt)])
    vals = jnp.concatenate([
        jnp.full((F, 1), -60.0, dt), coded,
        jnp.full((F, 1), -C.MY_SAFE_GUARD_MINIMUM, dt)], axis=-1)
    freq = jnp.arange(K, dtype=dt) * fs / fft_size
    ap_db = jax.vmap(lambda v: interp1(coarse_axis, v, freq))(vals)
    ap = 10.0 ** (ap_db / 20.0)
    return jnp.where(unvoiced[:, None], 1.0 - C.MY_SAFE_GUARD_MINIMUM, ap)


@functools.partial(jax.jit, static_argnames=("fs", "fft_size", "n_dims"))
def code_spectral_envelope(spectrogram, *, fs, fft_size, n_dims):
    """[F, K] -> [F, n_dims] mel-cepstrum (reference :267-296)."""
    dt = spectrogram.dtype
    max_dim = fft_size // 2
    floor_mel = _freq_to_mel(jnp.asarray(C.FLOOR_FREQUENCY, dt))
    ceil_mel = _freq_to_mel(jnp.asarray(min(fs / 2.0, C.CEIL_FREQUENCY), dt))

    mel_axis = ((ceil_mel - floor_mel) * jnp.arange(max_dim, dtype=dt)
                / max_dim + floor_mel)
    freq_mel = _freq_to_mel(jnp.arange(fft_size // 2 + 1, dtype=dt)
                            * fs / fft_size)
    logsp = jnp.log(spectrogram)
    mel_sp = jax.vmap(lambda v: interp1(freq_mel, v, mel_axis))(logsp)

    # even-odd repack + rfft = DCT (reference DCTForCodec :72-87)
    even = mel_sp[:, 0::2]                                  # mel[2i]
    odd = mel_sp[:, 1::2][:, ::-1]                          # mel[max-1-2i]
    packed = jnp.concatenate([even, odd], axis=-1)          # [F, max_dim]
    S = jnp.fft.rfft(packed, axis=-1)                       # [F, max/2+1]

    i = jnp.arange(n_dims, dtype=dt)
    w0 = 2.0 * jnp.cos(i * C.PI / fft_size) / math.sqrt(fft_size)
    w1 = 2.0 * jnp.sin(i * C.PI / fft_size) / math.sqrt(fft_size)
    w0 = w0.at[0].divide(math.sqrt(2.0))
    # reference spectrum is conj(numpy): Re_ref*w0 - Im_ref*w1
    #   = Re*w0 + Im*w1 in numpy convention
    Sd = S[:, :n_dims]
    return (Sd.real * w0 + Sd.imag * w1) / math.sqrt(max_dim)


@functools.partial(jax.jit, static_argnames=("fs", "fft_size", "n_dims"))
def decode_spectral_envelope(coded, *, fs, fft_size, n_dims):
    """[F, n_dims] -> [F, K] (reference :298-325)."""
    dt = coded.dtype
    F = coded.shape[0]
    max_dim = fft_size // 2
    K = fft_size // 2 + 1

    i = jnp.arange(n_dims, dtype=dt)
    w0 = jnp.cos(i * C.PI / fft_size) * math.sqrt(fft_size)
    w1 = jnp.sin(i * C.PI / fft_size) * math.sqrt(fft_size)
    w0 = w0.at[0].divide(math.sqrt(2.0))
    norm = math.sqrt(max_dim)
    inp = jnp.zeros((F, max_dim), jnp.complex128 if dt == jnp.float64
                    else jnp.complex64)
    inp = inp.at[:, :n_dims].set(
        (coded * w0 * norm) - 1j * (coded * w1 * norm))
    # the reference's BACKWARD c2c == numpy forward fft (probed)
    out = jnp.fft.fft(inp, axis=-1)

    half = max_dim // 2
    mel_sp = jnp.zeros((F, max_dim), dt)
    mel_sp = mel_sp.at[:, 0::2].set(out[:, :half].real)
    mel_sp = mel_sp.at[:, 1::2].set(out[:, max_dim - 1:half - 1:-1].real)
    # edge-duplicate padding (reference DecodeOneFrame :146-147)
    mel_pad = jnp.concatenate(
        [mel_sp[:, :1], mel_sp, mel_sp[:, -1:]], axis=-1)   # [F, max+2]

    floor_mel = _freq_to_mel(jnp.asarray(C.FLOOR_FREQUENCY, dt))
    ceil_mel = _freq_to_mel(jnp.asarray(min(fs / 2.0, C.CEIL_FREQUENCY), dt))
    mel_axis = jnp.concatenate([
        jnp.zeros((1,), dt),
        _mel_to_freq((ceil_mel - floor_mel) * jnp.arange(max_dim, dtype=dt)
                     / max_dim + floor_mel),
        jnp.asarray([fs / 2.0], dt)])
    freq = jnp.arange(K, dtype=dt) * fs / fft_size
    env = jax.vmap(lambda v: interp1(mel_axis, v, freq))(mel_pad)
    return jnp.exp(env / max_dim)
