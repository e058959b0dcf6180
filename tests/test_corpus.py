"""Corpus loader: directory of wavs -> padded static-shape batches."""

import pathlib

import numpy as np
import pytest

from worldtpu.io import corpus, wav


@pytest.fixture()
def wav_dir(tmp_path):
    rng = np.random.RandomState(0)
    fs = 16000
    lengths = [5000, 12000, 8000, 20001, 3000]
    for i, n in enumerate(lengths):
        x = np.clip(0.3 * rng.randn(n), -0.9, 0.9)
        wav.wavwrite(tmp_path / f"utt{i}.wav", x, fs)
    return tmp_path, fs, lengths


def test_iter_corpus_shapes_and_lengths(wav_dir):
    root, fs, lengths = wav_dir
    batches = corpus.load_corpus(root, batch_size=2, pad_to=1024,
                                 frames_to=16)
    assert len(batches) == 3
    seen = {}
    for b in batches:
        assert b.fs == fs
        assert b.x.shape[0] == 2
        assert b.x.shape[1] % 1024 == 0
        assert b.F % 16 == 0
        assert b.x.dtype == np.float32
        for i in range(2):
            if not b.valid[i]:
                continue
            n = int(b.lengths[i])
            assert b.x.shape[1] >= n
            assert np.all(b.x[i, n:] == 0.0)
            seen[b.names[i]] = n
    # every utterance appears exactly once with its true length
    assert seen == {f"utt{i}": n for i, n in enumerate(lengths)}


def test_fill_batch_marks_invalid(wav_dir):
    root, fs, lengths = wav_dir
    batches = corpus.load_corpus(root, batch_size=4)
    assert len(batches) == 2
    last = batches[-1]
    assert int(last.valid.sum()) == 1  # 5 utts -> 4 + 1(+3 fill)
    assert all(n == "" for n, v in zip(last.names, last.valid) if not v)


def test_sorted_batching_minimizes_padding(wav_dir):
    root, fs, lengths = wav_dir
    batches = corpus.load_corpus(root, batch_size=2, pad_to=1,
                                 sort_by_length=True, fill_batch=False)
    # sorted by length: [3000,5000], [8000,12000], [20001]
    assert [b.x.shape[1] for b in batches] == [5000, 12000, 20001]


def test_slice_outputs_roundtrip(wav_dir):
    root, fs, lengths = wav_dir
    (b,) = [x for x in corpus.iter_corpus(root, batch_size=5)]
    y = np.tile(np.arange(b.out_length, dtype=np.float32), (5, 1))
    outs = b.slice_outputs(y)
    assert len(outs) == 5
    for o, n in zip(outs, sorted(lengths)):
        expect = int((int(1000.0 * n / fs / 5.0) + 1 - 1) * 5.0 / 1000.0
                     * fs) + 1
        assert len(o) == expect


def test_rate_mismatch_raises(tmp_path):
    wav.wavwrite(tmp_path / "a.wav", np.zeros(100), 16000)
    wav.wavwrite(tmp_path / "b.wav", np.zeros(100), 22050)
    with pytest.raises(ValueError, match="sample rate"):
        corpus.load_corpus(tmp_path, batch_size=2)


def test_wav_info_matches_wavread(wav_dir):
    root, fs, lengths = wav_dir
    for p in corpus.scan_corpus(root):
        n, r, nbit = wav.wav_info(p)
        x, r2, nbit2 = wav.wavread(p)
        assert (n, r, nbit) == (len(x), r2, nbit2)


def test_native_batch_loader_matches_python():
    """C++ threaded batch WAV reader == per-file Python reads, all depths."""
    import tempfile

    from worldtpu import native
    from worldtpu.io import wav as wav_io

    lib = native._build_and_load_cpp()
    if lib is None:
        import pytest
        pytest.skip("no C++ toolchain")

    rng = np.random.RandomState(7)
    with tempfile.TemporaryDirectory() as d:
        d = pathlib.Path(d)
        paths = []
        for i, n in enumerate([1000, 2300, 777]):
            x = np.clip(rng.randn(n) * 0.3, -0.99, 0.99)
            wav_io.wavwrite(d / f"u{i}.wav", x, 16000)
            paths.append(d / f"u{i}.wav")
        T = 4096
        out = native.load_wavs_batch(paths, T)
        assert out is not None
        xb, lengths, rates, bits = out
        assert list(lengths) == [1000, 2300, 777]
        assert list(rates) == [16000] * 3 and list(bits) == [16] * 3
        for i, p in enumerate(paths):
            xi, fs, _ = wav_io.wavread(p)
            np.testing.assert_array_equal(
                xb[i, :len(xi)], xi.astype(np.float32))
            assert np.all(xb[i, len(xi):] == 0.0)
