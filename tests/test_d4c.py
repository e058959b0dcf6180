"""D4C parity vs the C++ reference fixtures."""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import load_fixture
from worldtpu.analysis.d4c import d4c_frames


@pytest.mark.parametrize("name", ["t16", "t48", "t22"])
def test_d4c_parity(name):
    f = load_fixture(name)
    got = np.asarray(d4c_frames(
        jnp.asarray(f.x), jnp.asarray(f.f0), jnp.asarray(f.tpos),
        fs=f.fs, fft_size_out=f.fft_size))
    want = f.ap
    err = np.abs(got - want)
    # the reference injects ~1e-12 randn dither into its windowed waveforms;
    # aperiodicity is bounded in (0,1], so absolute error is the right gauge
    assert np.quantile(err, 0.999) < 1e-6, (
        f"q999={np.quantile(err, 0.999)}, max={err.max()}")
    assert err.max() < 1e-3, f"max err {err.max()}"
