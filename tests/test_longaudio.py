"""Streaming long-audio pipeline (worldtpu.longaudio) vs the unchunked
batched programs.

Like test_longform.py this is slow (a 60 s utterance through both paths);
WORLDTPU_LONG_TEST_SECONDS overrides the duration for local iteration.

Tolerances: see _assert_waveforms_match — the chunked synthesis places
pulses via the same Q32 accumulator with the SAME global f32 segment
formula (r5 fix), so the only legitimate divergence left is +-1-sample
pulse wobble from cross-compilation-context float contraction
(--xla_allow_excess_precision), gated by envelope + median-alignment
criteria that still catch every real desync class.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from worldtpu.analysis.cheaptrick import CheapTrickKernel, cheaptrick_frames
from worldtpu.analysis.d4c import d4c_frames
from worldtpu.longaudio import LongPipeline
from worldtpu.synthesis import synthesis as S

pytestmark = pytest.mark.slow

DUR = float(os.environ.get("WORLDTPU_LONG_TEST_SECONDS", "60"))


def _long_utterance(fs, dur, seed=0):
    n = int(fs * dur)
    t = np.arange(n) / fs
    f0 = 170 * 2 ** ((40 / 1200) * np.sin(2 * np.pi * 0.35 * t))
    phase = 2 * np.pi * np.cumsum(f0) / fs
    rng = np.random.RandomState(seed)
    x = np.zeros(n)
    for k in range(1, 12):
        x += np.sin(k * phase) / k
    x /= np.abs(x).max() * 1.4
    g0, g1 = int(0.42 * n), int(0.47 * n)
    x[g0:g1] = 0.003 * rng.randn(g1 - g0)
    x += 0.002 * rng.randn(n)
    x[-int(0.4 * fs):] = 0.0
    return x.astype(np.float32)


def test_long_pipeline_matches_unchunked():
    fs = 16000
    x = _long_utterance(fs, DUR)
    key = jax.random.PRNGKey(7)

    lp = LongPipeline(fs, f0_floor=40.0, chunk_frames=1000,
                      harvest_chunk_ms=12000)
    yc, f0c = lp.copy_synthesis(x, key=key)

    # unchunked reference on the same F0 contour (LongHarvest-vs-unchunked
    # F0 parity is test_longform's job) and the same counter-based noise
    F = len(f0c)
    ck = CheapTrickKernel(fs)
    tpos = jnp.asarray((np.arange(F) * 0.005).astype(np.float32))
    f0j = jnp.asarray(f0c, jnp.float32)
    xj = jnp.asarray(x)
    spec = cheaptrick_frames(xj, f0j, tpos, fs=fs, fft_size=ck.fft_size,
                             max_half_window=ck.max_half_window)
    ap = d4c_frames(xj, f0j, tpos, fs=fs, fft_size_out=ck.fft_size)
    out_len = int((F - 1) * 0.005 * fs) + 1
    mp = S.estimate_max_pulses(f0c.astype(np.float32), fs, ck.fft_size,
                               out_len)
    noise = S.indexed_noise(key, 0, mp, ck.fft_size, jnp.float32)
    yu = np.asarray(S.synthesis_frames_impl(
        f0j, spec, ap, noise, fs=fs, fft_size=ck.fft_size,
        frame_period_s=0.005, out_length=out_len, max_pulses=mp))

    assert len(yc) == len(yu) == out_len
    assert np.isfinite(yc).all()
    _assert_waveforms_match(yc, yu)


def _assert_waveforms_match(yc, yu, fs=16000):
    """Chunked-vs-reference waveform comparison that is robust to the ONE
    legitimate divergence class: +-1-sample pulse-timing wobble between
    SEPARATELY-COMPILED programs.  XLA under --xla_allow_excess_precision
    may contract the same f32 step formula differently per compilation
    context (standalone jit vs inside lax.scan — verified by recovering
    the Q32 steps from both), so a Q32 knife-edge wrap can land one sample
    apart.  In voiced audio that is inaudible and sample-aligned; in
    NOISE-dominated spans a 1-sample shift decorrelates the waveform
    (rel ~ sqrt(2)) while leaving its envelope identical.  So:

      - median windowed sample-aligned rel error < 5%: each wobbled
        pulse (~1-2% of pulses) spreads a localized diff over its
        fft-length response, so the wobble floor measures ~0.03; a real
        desync (noise-ordinal shift decorrelates the aperiodic component
        everywhere downstream) measures 0.2-0.4 — 4x above the gate
        (measured on the r5 pre-fix bug),
      - the short-time ENERGY envelope must match < 2% at p95 (catches
        dropped/duplicated pulses; measured wobble floor 0.0005),
      - total energy ratio within 1%.
    """
    yc = yc.astype(np.float64)
    yu = yu.astype(np.float64)
    w = int(0.1 * fs)
    n = (len(yu) // w) * w
    dw = np.sqrt(((yc[:n] - yu[:n]).reshape(-1, w) ** 2).mean(axis=1))
    uw = np.sqrt((yu[:n].reshape(-1, w) ** 2).mean(axis=1))
    cw = np.sqrt((yc[:n].reshape(-1, w) ** 2).mean(axis=1))
    floor = np.median(uw) * 1e-3
    rel_w = dw / np.maximum(uw, floor)
    med = float(np.median(rel_w))
    assert med < 0.05, f"median windowed rel {med}"
    env = np.abs(cw - uw) / np.maximum(uw, floor)
    p95 = float(np.quantile(env, 0.95))
    assert p95 < 0.02, f"energy-envelope p95 rel {p95}"
    assert abs(float(np.sqrt((yc ** 2).mean()))
               / float(np.sqrt((yu ** 2).mean())) - 1.0) < 0.01


def test_long_pipeline_chunk_size_invariance():
    """The waveform must not depend on the chunk size (counter-based noise
    + carried Q32 phase), up to the same f32 interpolation jitter."""
    fs = 16000
    x = _long_utterance(fs, min(DUR, 10.0), seed=3)
    key = jax.random.PRNGKey(1)
    ya, _ = LongPipeline(fs, f0_floor=40.0, chunk_frames=400,
                         harvest_chunk_ms=6000).copy_synthesis(x, key=key)
    yb, _ = LongPipeline(fs, f0_floor=40.0, chunk_frames=900,
                         harvest_chunk_ms=6000).copy_synthesis(x, key=key)
    assert len(ya) == len(yb)
    _assert_waveforms_match(ya, yb)


def test_long_pipeline_duration_and_pitch():
    fs = 16000
    x = _long_utterance(fs, min(DUR, 8.0), seed=5)
    lp = LongPipeline(fs, f0_floor=40.0, chunk_frames=300,
                      harvest_chunk_ms=6000)
    y, f0 = lp.copy_synthesis(x, pitch_scale=1.2, duration_scale=1.25)
    F = len(f0)
    assert len(y) == int((F - 1) * 0.005 * 1.25 * fs) + 1
    assert np.isfinite(y).all()
    assert np.abs(y).max() > 0.01


def _rel_rms(a, b):
    d = a.astype(np.float64) - b.astype(np.float64)
    rms = float(np.sqrt((b.astype(np.float64) ** 2).mean()))
    return float(np.sqrt((d ** 2).mean())) / rms


def test_long_pipeline_parallel_matches_sequential():
    """parallel=True (prescan + one lax.map dispatch) vs the sequential
    carried-phase path.  Entry states (carry, ord0) are identical by
    construction (the prescan reuses _timebase_core), but XLA fuses the
    chunk program differently inside lax.map, so f32 reassociation can
    flip a knife-edge pulse boundary by one sample — the same class of
    residual as the chunked-vs-unchunked tolerance in this module's
    docstring."""
    fs = 16000
    x = _long_utterance(fs, min(DUR, 20.0))
    key = jax.random.PRNGKey(7)
    lp = LongPipeline(fs, f0_floor=40.0, chunk_frames=700,
                      harvest_chunk_ms=9000)
    ys, f0s = lp.copy_synthesis(x, key=key)
    yp, f0p = lp.copy_synthesis(x, key=key, parallel=True)
    np.testing.assert_array_equal(f0s, f0p)
    assert _rel_rms(yp, ys) < 0.01


def test_long_pipeline_mesh_sharded_chunks():
    """Chunk axis sharded over a virtual device mesh == sequential (same
    f32-reassociation tolerance as the lax.map path)."""
    if jax.device_count() < 2:
        pytest.skip("needs a multi-device (virtual CPU) mesh")
    from jax.sharding import Mesh
    nd = jax.device_count()
    fs = 16000
    x = _long_utterance(fs, min(DUR, 20.0))
    key = jax.random.PRNGKey(7)
    lp = LongPipeline(fs, f0_floor=40.0, chunk_frames=700,
                      harvest_chunk_ms=9000)
    ys, _ = lp.copy_synthesis(x, key=key)
    mesh = Mesh(np.asarray(jax.devices()).reshape(nd), ("chunks",))
    ym, _ = lp.copy_synthesis(x, key=key, mesh=mesh)
    assert _rel_rms(ym, ys) < 0.01
