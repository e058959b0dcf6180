"""api.World fused one-dispatch pipeline vs the per-stage facades."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import load_fixture
from worldtpu import api

pytestmark = pytest.mark.slow


def test_world_analyze_matches_stages():
    f = load_fixture("t16")
    fs = f.fs
    x = np.asarray(f.x, np.float32)
    world = api.World(fs, f0_floor=40.0)
    tpos, f0, spec, ap = world.analyze(x)

    # per-stage facades on the SAME F0 (Harvest parity is its own test)
    ct = api.CheapTrick(fs)
    spec2 = np.asarray(ct.compute(x, tpos, f0, dtype=jnp.float32))
    ap2 = np.asarray(api.D4C(fs).compute(x, tpos, f0, ct.fft_size,
                                         dtype=jnp.float32))
    assert spec.shape == spec2.shape == ap.shape == ap2.shape
    # the fused program runs under vmap (B=1) — XLA fuses/rounds slightly
    # differently from the unbatched per-stage calls
    np.testing.assert_allclose(spec, spec2, rtol=1e-3, atol=1e-9)
    np.testing.assert_allclose(ap, ap2, rtol=5e-3, atol=2e-5)
    # F0 stays close to the golden contour
    n = min(len(f0), len(f.f0))
    v = (f.f0[:n] > 0) & (f0[:n] > 0)
    assert np.sqrt(np.mean((f0[:n][v] - f.f0[:n][v]) ** 2)) < 1.0


def test_world_copy_synthesis_runs():
    f = load_fixture("t16")
    x = np.asarray(f.x, np.float32)
    world = api.World(f.fs, f0_floor=40.0)
    y, f0 = world.copy_synthesis(x, pitch_scale=1.2, duration_scale=1.25,
                                 key=jax.random.PRNGKey(2))
    F = len(f0)
    assert len(y) == int((F - 1) * 0.005 * 1.25 * f.fs) + 1
    assert np.isfinite(y).all()
    assert np.sqrt(np.mean(y ** 2)) > 0.01
