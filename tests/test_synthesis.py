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
    idx, shift, n_pulses, vuv_at, valid, _ovf = S._time_base(
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
    idx, shift, n_pulses, vuv_at, valid, _ovf = S._time_base(
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


def test_max_pulses_overflow_detected():
    """An aggressive pitch_scale applied AFTER estimate_max_pulses (the
    round-2 hazard: the estimate budgeted the unscaled contour) must
    (a) clamp n_pulses to max_pulses with no spurious fill pulses marked
    valid, (b) surface the overflow flag, and (c) be covered when the scale
    is passed to estimate_max_pulses (VERDICT r2 item 3)."""
    fs = 16000
    fp_s = 0.005
    F = 601  # 3 s
    f0 = np.linspace(300.0, 500.0, F)  # fully voiced
    out_length = int((F - 1) * fp_s * fs) + 1
    fft_size = 1024
    pitch_scale = 1.5
    # estimate on the UNSCALED contour, synthesize the scaled one
    mp_est = S.estimate_max_pulses(f0, fs, fft_size, out_length)
    f0s = f0 * pitch_scale
    idx, shift, n_pulses, vuv_at, valid, ovf = S._time_base(
        jnp.asarray(f0s), fs, fp_s, out_length, fs / fft_size + 1.0, mp_est)
    assert bool(ovf), "expected the unscaled estimate to undershoot"
    assert int(n_pulses) == mp_est
    assert int(np.sum(np.asarray(valid))) == mp_est
    # no slot past the clamp may be valid (round-2 bug: fill slots at T-1
    # were all marked valid on overflow)
    assert not np.any(np.asarray(valid)[int(n_pulses):])
    # pitch_scale-aware estimate and the hard bound both cover it
    mp_ok = S.estimate_max_pulses(f0, fs, fft_size, out_length,
                                  pitch_scale=pitch_scale)
    *_, ovf2 = S._time_base(
        jnp.asarray(f0s), fs, fp_s, out_length, fs / fft_size + 1.0, mp_ok)
    assert not bool(ovf2)
    # batch form covers the worst utterance
    mp_b = S.estimate_max_pulses(np.stack([f0 * 0.5, f0]), fs, fft_size,
                                 out_length, pitch_scale=pitch_scale)
    assert mp_b >= mp_ok

    # synthesis surfaces the flag
    K = fft_size // 2 + 1
    spec = jnp.ones((F, K)) * 1e-4
    ap = jnp.ones((F, K)) * 0.5
    noise = jnp.zeros((mp_est, fft_size))
    y, ovf3 = S.synthesis_frames_impl(
        jnp.asarray(f0s), spec, ap, noise, fs=fs, fft_size=fft_size,
        frame_period_s=fp_s, out_length=out_length, max_pulses=mp_est,
        use_ola=False, return_overflow=True)
    assert bool(ovf3)
    assert np.all(np.isfinite(np.asarray(y)))


def test_api_synthesis_regrows_on_overflow():
    """api.Synthesis.compute must detect the overflow and regrow
    max_pulses instead of silently dropping pulses."""
    from worldtpu.api import Synthesis
    fs = 16000
    F = 601
    f0 = np.zeros(F)
    f0[F // 2:] = np.linspace(400.0, 790.0, F - F // 2)
    fft_size = 1024
    K = fft_size // 2 + 1
    out_length = int((F - 1) * 0.005 * fs) + 1
    spec = np.full((F, K), 1e-4)
    ap = np.full((F, K), 0.5)
    syn = Synthesis(fs, fft_size, 5.0)
    under = 512  # deliberately below the true pulse count (~1642)
    y = syn.compute(f0, spec, ap, out_length, dtype=jnp.float64,
                    max_pulses=under)
    assert np.all(np.isfinite(np.asarray(y)))
    # cross-check: explicit generous bound gives the same pulse count
    hard = S.default_max_pulses(out_length, fs)
    *_, n_ref, _, _, ovf = S._time_base(
        jnp.asarray(f0), fs, 0.005, out_length, fs / fft_size + 1.0, hard)
    assert not bool(ovf)


def test_capacity_max_pulses_static_bound():
    """The data-independent capacity bound (production streams on unseen
    audio) must cover any speech-range contour — voiced runs <= f0_cap AND
    unvoiced runs pulsing at kDefaultF0=500 Hz — and flag (not silently
    drop) a sustained beyond-cap pathology."""
    fs = 16000
    fp_s = 0.005
    F = 601  # 3 s
    fft_size = 1024
    out_length = int((F - 1) * fp_s * fs) + 1
    mp = S.capacity_max_pulses(out_length, fs)
    assert mp % 256 == 0
    assert mp <= S.default_max_pulses(out_length, fs)

    def n_true(f0):
        *_, n, _, _, ovf = S._time_base(
            jnp.asarray(f0), fs, fp_s, out_length,
            fs / fft_size + 1.0, mp)
        return int(n), bool(ovf)

    # worst legitimate case: fully unvoiced = the 500 Hz default rate
    _, ovf_uv = n_true(np.zeros(F))
    assert not ovf_uv
    # speech-shaped: alternating voiced (<= 400 Hz) and unvoiced
    f0 = np.zeros(F)
    f0[::2] = np.linspace(120.0, 400.0, (F + 1) // 2)
    _, ovf_sp = n_true(f0)
    assert not ovf_sp
    # pathology: sustained voicing above the cap must FLAG
    _, ovf_hi = n_true(np.full(F, 780.0))
    assert ovf_hi
