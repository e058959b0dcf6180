"""Tests for the remaining public-surface utilities (ops.misc, params header)."""

import numpy as np
import jax.numpy as jnp

from conftest import FIXTURES
from worldtpu.ops import misc
from worldtpu.io import params


def test_fast_fftfilt_matches_convolution():
    rng = np.random.RandomState(0)
    x = rng.randn(100)
    h = rng.randn(31)
    fft_size = 256
    got = np.asarray(misc.fast_fftfilt(jnp.asarray(x), jnp.asarray(h), fft_size))
    want = np.convolve(x, h)
    np.testing.assert_allclose(got[:len(want)], want / fft_size,
                               rtol=1e-9, atol=1e-12)


def test_matlab_std():
    x = np.array([1.0, 2.0, 4.0, 7.0])
    got = float(misc.matlab_std(jnp.asarray(x)))
    np.testing.assert_allclose(got, np.std(x, ddof=1), rtol=1e-12)


def test_matlab_round():
    x = jnp.asarray([1.4, 1.5, -1.5, -1.4, 0.5, -0.5, 2.49])
    got = np.asarray(misc.matlab_round(x))
    np.testing.assert_array_equal(got, [1, 2, -2, -1, 1, -1, 2])


def test_fftshift():
    x = jnp.asarray([0.0, 1, 2, 3, 4, 5])
    np.testing.assert_array_equal(np.asarray(misc.fftshift(x)),
                                  [3, 4, 5, 0, 1, 2])


def test_diff():
    from worldtpu.ops.misc import diff
    np.testing.assert_array_equal(
        np.asarray(diff(jnp.asarray([1.0, 4.0, 2.0]))), [3.0, -2.0])


def test_get_audio_length():
    from worldtpu.io.wav import get_audio_length, wavread
    n = get_audio_length(FIXTURES / "t22.wav")
    x, _, _ = wavread(FIXTURES / "t22.wav")
    assert n == len(x)


def test_write_f0_text(tmp_path):
    p = tmp_path / "f0.txt"
    params.write_f0(p, np.array([100.0, 0.0]), 5.0, text=True)
    lines = p.read_bytes().split(b"\r\n")
    assert lines[0] == b"0.00000 100.00000"
    assert lines[1] == b"0.00500 0.00000"


def test_get_header_information():
    assert params.get_header_information(
        FIXTURES / "t16.spec.gz", "FFT ") == 1024.0
    assert params.get_header_information(
        FIXTURES / "t16.spec.gz", "FS  ") == 16000.0
    assert params.get_header_information(
        FIXTURES / "t16.spec.gz", "FP  ") == 5.0
    assert params.get_header_information(
        FIXTURES / "t16.f0.gz", "NOF ") == 601.0
