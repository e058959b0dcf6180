"""Pallas kernel parity vs the jnp production formulations (interpret mode).

The compiled kernels are exercised on real TPU by bench.py; here each kernel
runs in the Pallas interpreter against the jnp path it replaces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _vowel(fs, dur, f0_base, seed):
    rng = np.random.RandomState(seed)
    T = int(fs * dur)
    t = np.arange(T) / fs
    f0t = f0_base * 2 ** (0.2 * np.sin(2 * np.pi * 3 * t))
    x = np.sin(2 * np.pi * np.cumsum(f0t) / fs)
    x += 0.4 * np.sin(4 * np.pi * np.cumsum(f0t) / fs)
    x[int(0.2 * T):int(0.3 * T)] = 0.0
    return (x * 0.5 + 0.003 * rng.randn(T)).astype(np.float32)


@pytest.mark.parametrize("fs,f0b", [(16000, 180.0), (22050, 120.0)])
def test_zc_kernel_matches_jnp_path(fs, f0b):
    from worldtpu.analysis import harvest as H
    from worldtpu.ops import zc_kernel as Z

    x = _vowel(fs, 0.5, f0b, 0)
    geo = H.HarvestGeometry(fs, len(x))
    dt = jnp.float32
    y = H.decimate_stage(jnp.asarray(x, dt), ratio=geo.ratio,
                         y_length=geo.y_length)
    tpos1 = jnp.arange(geo.f0_length, dtype=dt) / 1000.0
    Lmax = geo.max_filter_half
    kern = H._bandpass_kernels(geo, dt)
    ypad = jnp.pad(y, (Lmax - 1, Lmax + 1))
    filt = jax.lax.conv_general_dilated(
        ypad[None, None, :], kern[:, None, :],
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"),
        precision=jax.lax.Precision.HIGHEST)[0]
    bounds = jnp.asarray(geo.boundary_f0, dt)
    raw_ref = np.asarray(jax.vmap(
        lambda fi, b: H._band_candidates(fi, b, geo, tpos1))(filt, bounds))

    raw_ker = np.asarray(Z.band_candidates_pallas(filt, geo, interpret=True))

    rel = np.abs(raw_ker - raw_ref) / np.maximum(np.abs(raw_ref), 1e-3)
    assert rel.max() < 1e-4
    assert (raw_ker > 0).sum() == (raw_ref > 0).sum()


def test_zc_kernel_silence():
    """All-zero input: no events, all candidates zero (usable gate)."""
    from worldtpu.analysis import harvest as H
    from worldtpu.ops import zc_kernel as Z

    fs = 16000
    geo = H.HarvestGeometry(fs, 4000)
    filt = jnp.zeros((geo.n_channels, geo.y_length), jnp.float32)
    raw = np.asarray(Z.band_candidates_pallas(filt, geo, interpret=True))
    assert raw.shape == (geo.n_channels, geo.f0_length)
    assert np.all(raw == 0.0)


def test_ola_kernel_matches_scatter():
    from worldtpu.ops.ola_kernel import overlap_add

    rng = np.random.RandomState(1)
    P, fft, T = 61, 1024, 12007
    resp = rng.randn(P, fft).astype(np.float32)
    starts = rng.randint(-(fft - 1), T - 1, size=P).astype(np.int32)
    j = np.arange(fft)
    target = starts[:, None] + j[None, :]
    ok = (target >= 0) & (target < T)
    ref = np.zeros(T + 1, np.float32)
    np.add.at(ref, np.where(ok, target, T), np.where(ok, resp, 0.0))
    out = np.asarray(overlap_add(
        jnp.asarray(resp), jnp.asarray(starts), T, interpret=True))
    np.testing.assert_allclose(out, ref[:T], rtol=1e-5, atol=1e-5)


def test_synthesis_ola_kernel_path(fix):
    """Full f32 synthesis with the Pallas OLA (interpret) vs the scatter."""
    from worldtpu.synthesis import synthesis as S

    dt = jnp.float32
    fs, fft_size = fix.fs, fix.fft_size
    fp_s = fix.frame_period / 1000.0
    out_len = int((len(fix.f0) - 1) * fp_s * fs) + 1
    mp = S.default_max_pulses(out_len, fs)
    noise = S.make_noise(jax.random.PRNGKey(0), mp, fft_size, dt)
    args = (jnp.asarray(fix.f0, dt), jnp.asarray(fix.spec, dt),
            jnp.asarray(fix.ap, dt), noise)
    kw = dict(fs=fs, fft_size=fft_size, frame_period_s=fp_s,
              out_length=out_len, max_pulses=mp)
    y_scatter = np.asarray(
        S.synthesis_frames_impl(*args, use_ola=False, **kw))
    y_kernel = np.asarray(
        S.synthesis_frames_impl(*args, use_ola="interpret", **kw))
    np.testing.assert_allclose(y_kernel, y_scatter, rtol=2e-4, atol=1e-5)
