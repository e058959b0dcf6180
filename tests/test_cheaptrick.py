"""CheapTrick parity vs the C++ reference fixtures."""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import load_fixture
from worldtpu.analysis.cheaptrick import CheapTrickKernel


@pytest.mark.parametrize("name", ["t16", "t48", "t22"])
def test_cheaptrick_parity(name):
    f = load_fixture(name)
    kern = CheapTrickKernel(f.fs, f0_floor=71.0)
    assert kern.fft_size == f.fft_size
    got = np.asarray(kern(
        jnp.asarray(f.x), jnp.asarray(f.f0), jnp.asarray(f.tpos)))
    want = f.spec
    # production path (no parity dither): the reference injects ~1e-15 randn
    # dither into the windowed waveform; agreement is limited by that
    rel = np.abs(got - want) / (np.abs(want) + 1e-20)
    assert np.quantile(rel, 0.999) < 1e-6, (
        f"rel err q999={np.quantile(rel, 0.999)}, max={rel.max()}")
    assert rel.max() < 1e-3, f"max rel err {rel.max()}"


@pytest.mark.parametrize("name", ["t16", "t48", "t22"])
def test_cheaptrick_dithered_parity(name):
    """With the exact xorshift dither stream wired through, parity is
    FFT-backend-limited (~1e-12), not dither-limited.  The stream starts at
    the fresh-process seed because Harvest draws nothing
    (/root/reference/src/cheaptrick.cpp:153,227; dump.cpp runs the pipeline
    single-threaded in reference call order)."""
    from worldtpu.analysis.dither import cheaptrick_dither

    f = load_fixture(name)
    kern = CheapTrickKernel(f.fs, f0_floor=71.0)
    wd, sd, _ = cheaptrick_dither(
        f.f0, f.fs, kern.fft_size, kern.max_half_window)
    got = np.asarray(kern(
        jnp.asarray(f.x), jnp.asarray(f.f0), jnp.asarray(f.tpos),
        window_dither=jnp.asarray(wd), spectrum_dither=jnp.asarray(sd)))
    rel = np.abs(got - f.spec) / (np.abs(f.spec) + 1e-300)
    assert np.quantile(rel, 0.999) < 5e-12, (
        f"rel err q999={np.quantile(rel, 0.999)}")
    assert rel.max() < 2e-8, f"max rel err {rel.max()}"
