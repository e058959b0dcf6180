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
    # the reference injects ~1e-15 randn dither into the windowed waveform;
    # agreement is limited by that, not by the math
    rel = np.abs(got - want) / (np.abs(want) + 1e-20)
    assert np.quantile(rel, 0.999) < 1e-6, (
        f"rel err q999={np.quantile(rel, 0.999)}, max={rel.max()}")
    assert rel.max() < 1e-3, f"max rel err {rel.max()}"
