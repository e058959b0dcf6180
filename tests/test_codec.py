"""Codec parity vs C++ fixtures (codec round-trip dumps)."""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import load_fixture
from worldtpu import codec


@pytest.mark.parametrize("name", ["t16", "t48", "t22"])
def test_aperiodicity_codec(name):
    f = load_fixture(name)
    assert codec.get_number_of_aperiodicities(f.fs) == f.n_ap
    coded = np.asarray(codec.code_aperiodicity(
        jnp.asarray(f.ap), fs=f.fs, fft_size=f.fft_size))
    np.testing.assert_allclose(coded, f.coded_ap, rtol=1e-10, atol=1e-10)
    dec = np.asarray(codec.decode_aperiodicity(
        jnp.asarray(f.coded_ap), fs=f.fs, fft_size=f.fft_size))
    np.testing.assert_allclose(dec, f.decoded_ap, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("name", ["t16", "t48", "t22"])
def test_spectral_envelope_codec(name):
    f = load_fixture(name)
    coded = np.asarray(codec.code_spectral_envelope(
        jnp.asarray(f.spec), fs=f.fs, fft_size=f.fft_size,
        n_dims=f.ndim_se))
    np.testing.assert_allclose(coded, f.coded_spec, rtol=1e-9, atol=1e-10)
    dec = np.asarray(codec.decode_spectral_envelope(
        jnp.asarray(f.coded_spec), fs=f.fs, fft_size=f.fft_size,
        n_dims=f.ndim_se))
    rel = np.abs(dec - f.decoded_spec) / (np.abs(f.decoded_spec) + 1e-20)
    assert rel.max() < 1e-8, f"max rel err {rel.max()}"
