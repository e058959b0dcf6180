"""Synthesis parity vs the C++ reference (fresh xorshift noise stream).

The un-jitted float64 path is bitwise-parity with the single-threaded C++
(max abs err ~1e-15 of full scale).  The jitted path can flip 1-ulp knife
edges at V/UV transitions (moving one pulse by one sample, which re-aligns
the noise stream differently — equally valid audio); it is validated at
short-time-energy level instead.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import load_fixture
from worldtpu.native import XorshiftRandn
from worldtpu.synthesis import synthesis as S


def _setup(f):
    fp_s = f.frame_period / 1000.0
    out_length = int((len(f.f0) - 1) * fp_s * f.fs) + 1
    max_pulses = S.default_max_pulses(out_length, f.fs)
    f0 = jnp.asarray(f.f0)
    idx, shift, n_pulses, vuv_at, valid = S._time_base(
        f0, f.fs, fp_s, out_length, f.fs / f.fft_size + 1.0, max_pulses)
    idx = np.asarray(idx)
    valid = np.asarray(valid)
    n = int(n_pulses)
    nxt = np.minimum(np.arange(max_pulses) + 1, n - 1)
    ns = np.where(valid, idx[nxt] - idx, 0)
    # reproduce the reference's sequential randn() stream: pulse ii draws
    # noise_size[ii] values (getNoiseSpectrum, synthesis.cpp:514-530)
    gen = XorshiftRandn()
    noise = np.zeros((max_pulses, f.fft_size))
    for i in range(n):
        m = int(ns[i])
        if m > 0:
            noise[i, :m] = gen.draw(m)
    kw = dict(fs=f.fs, fft_size=f.fft_size, frame_period_s=fp_s,
              out_length=out_length, max_pulses=max_pulses)
    return f0, jnp.asarray(noise), kw


@pytest.mark.parametrize("name", ["t16", "t48", "t22"])
def test_synthesis_bitwise_parity(name):
    f = load_fixture(name)
    f0, noise, kw = _setup(f)
    y = np.asarray(S.synthesis_frames_impl(
        f0, jnp.asarray(f.spec), jnp.asarray(f.ap), noise, **kw))
    scale = np.abs(f.syn2).max()
    err = np.abs(y - f.syn2).max()
    assert err < 1e-10 * scale, f"max abs err {err} (scale {scale})"


@pytest.mark.parametrize("name", ["t16"])
def test_synthesis_jit_envelope_match(name):
    f = load_fixture(name)
    f0, noise, kw = _setup(f)
    y = np.asarray(S.synthesis_frames(
        f0, jnp.asarray(f.spec), jnp.asarray(f.ap), noise, **kw))
    ref = f.syn2
    # short-time RMS over 10 ms windows must track the reference closely
    w = int(0.010 * f.fs)
    n = len(ref) // w
    rms = lambda x: np.sqrt(np.mean(
        x[:n * w].reshape(n, w) ** 2, axis=1) + 1e-12)
    a, b = rms(y), rms(ref)
    assert np.max(np.abs(a - b) / (b + 1e-6)) < 0.35
    assert np.median(np.abs(a - b) / (b + 1e-6)) < 0.01


@pytest.mark.parametrize("name", ["t16", "t48", "t22"])
def test_synthesis_jit_structural_match(name):
    """Structural jit-vs-unjit contract, much tighter than RMS alone:
    XLA fusion may flip 1-ulp V/UV knife edges in the pulse extraction,
    inserting/removing at most a few pulses (which re-aligns the per-slot
    noise rows for every later pulse).  Before the first flipped pulse the
    two waveforms must agree to f64 reassociation noise; the pulse SETS may
    differ only by a handful of samples."""
    f = load_fixture(name)
    f0, noise, kw = _setup(f)
    args = (f0, jnp.asarray(f.spec), jnp.asarray(f.ap), noise)
    y_impl = np.asarray(S.synthesis_frames_impl(*args, **kw))
    y_jit = np.asarray(S.synthesis_frames(*args, **kw))

    lowest = f.fs / kw["fft_size"] + 1.0
    tb = lambda fn: fn(f0, f.fs, kw["frame_period_s"], kw["out_length"],
                       lowest, kw["max_pulses"])
    a = tb(S._time_base)
    b = tb(jax.jit(S._time_base, static_argnums=(1, 3, 5)))
    n1, n2 = int(a[2]), int(b[2])
    assert n1 == n2, f"pulse count {n1} vs {n2}"
    i1, i2 = np.asarray(a[0])[:n1], np.asarray(b[0])[:n1]
    sh1, sh2 = np.asarray(a[1])[:n1], np.asarray(b[1])[:n1]
    # every pulse must stay within a few samples of its sequential position
    # (cumulative phase reassociation moves wrap crossings slightly)
    assert np.abs(i1 - i2).max() <= 4, f"max didx {np.abs(i1-i2).max()}"
    assert np.abs(sh1 - sh2).max() < 1e-3

    if np.array_equal(i1, i2):
        clean = kw["out_length"]
    else:
        first = int(min(i1[np.argmax(i1 != i2)], i2[np.argmax(i1 != i2)]))
        clean = max(0, first - kw["fft_size"])
    scale = np.abs(y_impl).max()
    pre = np.abs(y_jit[:clean] - y_impl[:clean])
    assert pre.size == 0 or pre.max() < 1e-10 * scale, (
        f"pre-divergence max {pre.max()} at scale {scale}")


def test_pulse_metadata_vs_cpp():
    """Pulse index/shift/vuv sets must match the instrumented reference
    (getTimeBase dump) exactly in the f64 path."""
    import pathlib
    dump = pathlib.Path(__file__).parent / "fixtures" / "t16.pulses"
    f = load_fixture("t16")
    fp_s = f.frame_period / 1000.0
    out_length = int((len(f.f0) - 1) * fp_s * f.fs) + 1
    max_pulses = S.default_max_pulses(out_length, f.fs)
    idx, shift, n_pulses, vuv_at, valid = S._time_base(
        jnp.asarray(f.f0), f.fs, fp_s, out_length,
        f.fs / f.fft_size + 1.0, max_pulses)
    raw = dump.read_bytes()
    cn = int(np.frombuffer(raw[:4], "<i4")[0])
    cidx = np.frombuffer(raw[4:4 + 4 * cn], "<i4")
    cshift = np.frombuffer(raw[4 + 4 * cn:4 + 12 * cn], "<f8")
    n = int(n_pulses)
    assert n == cn
    np.testing.assert_array_equal(np.asarray(idx)[:n], cidx)
    np.testing.assert_allclose(np.asarray(shift)[:n], cshift, atol=1e-17)
