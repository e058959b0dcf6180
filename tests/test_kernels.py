"""Pallas kernel parity vs the jnp production formulations (interpret mode).

The compiled kernels are exercised on real TPU by bench.py; here each kernel
runs in the Pallas interpreter against the jnp path it replaces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow


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


@pytest.mark.parametrize("fs,f0b", [(16000, 180.0), (22050, 120.0)])
def test_refine_kernel_matches_jnp_path(fs, f0b):
    """Adaptive Pallas refine (interpret) vs the dense jnp refine: same
    active candidate sets per frame (compacted order differs by design),
    values to f32 rounding."""
    from worldtpu.analysis import harvest as H
    from worldtpu.ops.refine_kernel import refine_stage_pallas

    x = _vowel(fs, 0.5, f0b, 1)
    geo = H.HarvestGeometry(fs, len(x))
    y = H.decimate_stage(jnp.asarray(x), ratio=geo.ratio,
                         y_length=geo.y_length)
    ym = y - jnp.mean(y)
    tpos = jnp.arange(geo.f0_length, dtype=jnp.float32) / 1000.0
    cand, _, _ = H.candidates_stage(y, jnp.mean(y), tpos, geo=geo,
                                    use_zc=False)
    r0, s0 = H.refine_stage(ym, cand, tpos, geo=geo)
    r1, s1 = refine_stage_pallas(ym, cand, tpos, geo=geo, interpret=True)
    r0, s0 = np.asarray(r0), np.asarray(s0)
    r1, s1 = np.asarray(r1), np.asarray(s1)
    mismatch = 0
    for f in range(r0.shape[0]):
        a, b = np.sort(r0[f][r0[f] > 0]), np.sort(r1[f][r1[f] > 0])
        if len(a) != len(b):
            mismatch += 1   # knife-edge score-2.5 / floor-ceil flips
            continue
        if len(a):
            np.testing.assert_allclose(b, a, rtol=2e-3)
    assert mismatch <= max(2, r0.shape[0] // 200)

    # scores travel with their candidates: check the (f0, score) pairing
    f = int(np.argmax((r0 > 0).sum(axis=1)))
    a = np.argsort(r0[f][r0[f] > 0])
    b = np.argsort(r1[f][r1[f] > 0])
    if len(a) == len(b) and len(a) > 0:
        np.testing.assert_allclose(
            np.sort(s1[f][r1[f] > 0]), np.sort(s0[f][r0[f] > 0]), rtol=0.2)


@pytest.mark.parametrize("knob", [dict(gp=2), dict(gf=4)])
def test_refine_kernel_fused_groups_bitwise(knob):
    """gp=2 fuses two independent group chains per loop iteration; the
    per-group math is untouched, so results are BITWISE equal to gp=1."""
    from worldtpu.analysis import harvest as H
    from worldtpu.ops.refine_kernel import refine_stage_pallas

    fs, f0b = 16000, 180.0
    x = _vowel(fs, 0.4, f0b, 1)
    geo = H.HarvestGeometry(fs, len(x))
    y = H.decimate_stage(jnp.asarray(x), ratio=geo.ratio,
                         y_length=geo.y_length)
    ym = y - jnp.mean(y)
    tpos = jnp.arange(geo.f0_length, dtype=jnp.float32) / 1000.0
    cand, _, _ = H.candidates_stage(y, jnp.mean(y), tpos, geo=geo,
                                    use_zc=False)
    r0, s0 = refine_stage_pallas(ym, cand, tpos, geo=geo, interpret=True)
    r1, s1 = refine_stage_pallas(ym, cand, tpos, geo=geo, interpret=True,
                                 **knob)
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))


@pytest.mark.parametrize("fs,f0b", [(16000, 180.0), (22050, 120.0)])
def test_zc_adaptive_frame_tiles_bitwise(fs, f0b):
    """The group-adaptive frame-tile width (ft*128 frames per merge-sweep
    tile, sized so low-frequency groups amortize the fixed window slack)
    only changes the tiling of the sweep loop — the selected segment row
    and the interp formula per frame are identical, so results are
    BITWISE equal to the ft=1 tiling."""
    from worldtpu.analysis import harvest as H
    from worldtpu.ops import zc_kernel as Z

    x = _vowel(fs, 0.5, f0b, 3)
    geo = H.HarvestGeometry(fs, len(x))
    dt = jnp.float32
    y = H.decimate_stage(jnp.asarray(x, dt), ratio=geo.ratio,
                         y_length=geo.y_length)
    Lmax = geo.max_filter_half
    kern = H._bandpass_kernels(geo, dt)
    ypad = jnp.pad(y, (Lmax - 1, Lmax + 1))
    filt = jax.lax.conv_general_dilated(
        ypad[None, None, :], kern[:, None, :],
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"),
        precision=jax.lax.Precision.HIGHEST)[0]
    a = np.asarray(Z.band_candidates_pallas(filt, geo, interpret=True))
    b = np.asarray(Z.band_candidates_pallas(
        filt, geo, interpret=True,
        groups=Z.make_groups(geo, ft=1, win_round=64)))
    np.testing.assert_array_equal(a, b)


def test_zc_events_kernel_counts_match_dense():
    """The phase-1 measurement hook (_zc_events_call) must stay honest:
    its per-column event counts equal the dense crossing-mask counts."""
    from worldtpu.analysis import harvest as H
    from worldtpu.ops import zc_kernel as Z

    fs = 16000
    x = _vowel(fs, 0.4, 170.0, 7)
    geo = H.HarvestGeometry(fs, len(x))
    dt = jnp.float32
    y = H.decimate_stage(jnp.asarray(x, dt), ratio=geo.ratio,
                         y_length=geo.y_length)
    Lmax = geo.max_filter_half
    kern = H._bandpass_kernels(geo, dt)
    ypad = jnp.pad(y, (Lmax - 1, Lmax + 1))
    filt = np.asarray(jax.lax.conv_general_dilated(
        ypad[None, None, :], kern[:, None, :],
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"),
        precision=jax.lax.Precision.HIGHEST)[0])
    groups = Z.make_groups(geo)
    g = groups[-1]
    y_len = geo.y_length
    stot = -(-y_len // 128)
    fp = np.pad(filt.astype(np.float32),
                ((0, 0), (0, stot * 128 - y_len)))
    filt_T = jnp.asarray(fp.reshape(-1, stot, 128).transpose(0, 2, 1))
    ev, ccol = Z._zc_events_call(
        filt_T[g.lo:g.hi], y_length=y_len, stot=stot, e_cap=g.e_cap,
        c_row=g.c_row, interpret=True, rb=2)
    # dense oracle: negative-going crossings of (s, -s, ds, -ds)
    s = filt[g.lo:g.hi].astype(np.float32)
    d = s[:, 1:] - s[:, :-1]
    for t, (sig, n_eff) in enumerate(
            [(s, y_len), (-s, y_len), (d, y_len - 1), (-d, y_len - 1)]):
        i = np.arange(sig.shape[1] - 1)
        m = (sig[:, :-1] > 0.0) & (sig[:, 1:] <= 0.0) & (i < n_eff - 1)
        np.testing.assert_array_equal(
            np.asarray(jnp.sum(ccol[:, t, :], axis=1), np.int64),
            m.sum(axis=1))
        # events are sorted ascending with inf-fill
        evt = np.asarray(ev[:, :, t])
        for b in range(evt.shape[0]):
            n = int(m[b].sum())
            assert np.all(np.diff(evt[b, :n]) > 0)
            assert np.all(np.isinf(evt[b, n:]))
