"""CLI surface tests: analyze -> parameter files -> synthesize round trip."""

import pathlib
import subprocess
import sys

import numpy as np

FIXTURES = pathlib.Path(__file__).parent / "fixtures"
REPO = pathlib.Path(__file__).parent.parent


def _run(args):
    return subprocess.run(
        [sys.executable, "-m", "worldtpu.cli"] + args,
        cwd=REPO, capture_output=True, text=True, timeout=600,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/root",
             "PYTHONPATH": str(REPO)})


def test_cli_analyze_synthesize_roundtrip(tmp_path):
    pre = str(tmp_path / "p")
    r = _run(["analyze", str(FIXTURES / "t22.wav"), pre, "--f32",
              "--platform", "cpu"])
    assert r.returncode == 0, r.stderr[-2000:]
    for ext in (".f0", ".spec", ".ap"):
        assert (tmp_path / ("p" + ext)).exists()

    out = str(tmp_path / "out.wav")
    r = _run(["synthesize", pre, out, "--f32", "--platform", "cpu",
              "--f0-scale", "1.2"])
    assert r.returncode == 0, r.stderr[-2000:]
    from worldtpu.io import wav
    y, fs, _ = wav.wavread(out)
    assert fs == 22050
    assert np.isfinite(y).all()
    assert 0.01 < np.sqrt(np.mean(y ** 2)) < 1.0


def test_npz_checkpoint_roundtrip(tmp_path):
    """Native .npz parameter checkpoint (SURVEY §5 checkpoint/resume)."""
    from worldtpu.io import params

    rng = np.random.RandomState(0)
    f0 = np.abs(rng.randn(7)) * 100
    sp = np.abs(rng.randn(7, 9))
    ap = np.clip(np.abs(rng.randn(7, 9)), 0, 1)
    p = tmp_path / "chk.npz"
    params.save_npz(p, f0=f0, spectrogram=sp, aperiodicity=ap,
                    fs=16000, frame_period=5.0, fft_size=1024)
    z = params.load_npz(p)
    np.testing.assert_array_equal(z["f0"], f0)
    np.testing.assert_array_equal(z["spectrogram"], sp)
    np.testing.assert_array_equal(z["aperiodicity"], ap)
    assert z["fs"] == 16000 and z["fft_size"] == 1024
    assert z["frame_period"] == 5.0


def test_metrics_recorder():
    """Structured per-stage metrics (SURVEY §5 metrics/logging row)."""
    import json
    import time as _time

    from worldtpu.metrics import MetricsRecorder

    rec = MetricsRecorder(audio_s=2.0)
    with rec.stage("harvest", frames=401):
        _time.sleep(0.01)
    rec.add("synthesis", 0.05, pulses=123)
    d = rec.as_dict()
    assert [s["stage"] for s in d["stages"]] == ["harvest", "synthesis"]
    assert d["stages"][0]["frames"] == 401
    assert d["stages"][1]["pulses"] == 123
    assert d["rtf"] > 0
    json.loads(rec.emit_json())
