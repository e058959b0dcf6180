"""Matmul-DFT (ops/dft.py) parity vs jnp.fft and engine-level mm-mode check."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from worldtpu.ops import dft


def test_rfft_irfft_parity():
    rng = np.random.RandomState(0)
    for n, L in [(1024, 1024), (2048, 1500), (4096, 4096)]:
        x = jnp.asarray(rng.randn(7, L).astype(np.float32))
        a = np.asarray(dft.rfft(x, n=n, mode="mm"))
        b = np.asarray(jnp.fft.rfft(x, n=n, axis=-1))
        assert np.abs(a - b).max() / np.abs(b).max() < 1e-5
        ar = np.asarray(dft.rfft_real(x, n=n, mode="mm"))
        assert np.abs(ar - b.real).max() / np.abs(b.real).max() < 1e-5
    for n in (1024, 2048):
        K = n // 2 + 1
        X = jnp.asarray((rng.randn(5, K) + 1j * rng.randn(5, K))
                        .astype(np.complex64))
        a = np.asarray(dft.irfft(X, n=n, mode="mm"))
        b = np.asarray(jnp.fft.irfft(X, n=n, axis=-1))
        assert np.abs(a - b).max() / np.abs(b).max() < 1e-5


def test_f64_falls_back_to_fft():
    """The parity (x64) path must route through jnp.fft bit-exactly even
    in mm mode."""
    if not jax.config.jax_enable_x64:
        pytest.skip("x64 disabled")
    x64 = jnp.asarray(np.random.RandomState(1).randn(4, 256), jnp.float64)
    out = dft.rfft(x64, mode="mm")
    ref = jnp.fft.rfft(x64, axis=-1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    X = ref
    np.testing.assert_array_equal(
        np.asarray(dft.irfft(X, n=256, mode="mm")),
        np.asarray(jnp.fft.irfft(X, n=256, axis=-1)))


def test_engines_mm_mode_parity():
    """CheapTrick/D4C/synthesis with dft.MODE="mm" match the fft mode
    within f32 noise (full fixture pipeline)."""
    from worldtpu.io import wav, params
    import worldtpu.analysis.cheaptrick as CTK
    import worldtpu.analysis.d4c as D4
    import worldtpu.synthesis.synthesis as S
    x, fs, _ = wav.wavread("tests/fixtures/t16.wav")
    f0, tpos, fp = params.read_f0("tests/fixtures/t16.f0.gz")
    x32 = jnp.asarray(np.asarray(x, np.float32))
    f032 = jnp.asarray(np.asarray(f0, np.float32))
    tp32 = jnp.asarray(np.asarray(tpos, np.float32))
    ck = CTK.CheapTrickKernel(fs)

    def run_all():
        spec = CTK.cheaptrick_frames(
            x32, f032, tp32, fs=fs, fft_size=ck.fft_size,
            max_half_window=ck.max_half_window)
        ap = D4.d4c_frames(x32, f032, tp32, fs=fs, fft_size_out=ck.fft_size)
        out_len = int((len(f0) - 1) * fp / 1000.0 * fs) + 1
        mp = S.default_max_pulses(out_len, fs)
        noise = S.make_noise(jax.random.PRNGKey(0), mp, ck.fft_size,
                             jnp.float32)
        y = S.synthesis_frames(
            f032, spec, ap, noise, fs=fs, fft_size=ck.fft_size,
            frame_period_s=fp / 1000.0, out_length=out_len, max_pulses=mp)
        return np.asarray(spec), np.asarray(ap), np.asarray(y)

    old = dft.MODE
    try:
        dft.MODE = "fft"
        jax.clear_caches()
        s1, a1, y1 = run_all()
        dft.MODE = "mm"
        jax.clear_caches()
        s2, a2, y2 = run_all()
    finally:
        dft.MODE = old
        jax.clear_caches()
    assert np.abs(s1 - s2).max() / np.abs(s1).max() < 1e-4
    assert np.abs(a1 - a2).max() < 1e-3
    rms = np.sqrt(np.mean(y1 ** 2))
    assert np.sqrt(np.mean((y1 - y2) ** 2)) / rms < 1e-4
