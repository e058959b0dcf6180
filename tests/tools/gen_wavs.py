"""Generate synthetic vowel-like test utterances for parity fixtures."""
import numpy as np
import struct


def vowel(fs, dur, f0_base=220.0, vib_hz=5.0, vib_cents=30.0, seed=0):
    rng = np.random.RandomState(seed)
    n = int(fs * dur)
    t = np.arange(n) / fs
    # F0 contour: vibrato + slow drift, with an unvoiced gap in the middle
    f0 = f0_base * 2 ** ((vib_cents / 1200) * np.sin(2 * np.pi * vib_hz * t)
                         + 0.1 * np.sin(2 * np.pi * 0.5 * t))
    phase = 2 * np.pi * np.cumsum(f0) / fs
    x = np.zeros(n)
    # formants ~ /a/: 700, 1220, 2600 Hz
    formants = [(700, 130), (1220, 70), (2600, 160)]
    nharm = int(min(fs / 2 - 100, 8000) / f0_base * 0.9)
    for k in range(1, nharm + 1):
        fk = k * f0
        amp = sum(bw**2 / ((fk - fc) ** 2 + bw**2) for fc, bw in formants)
        amp = amp / k**0.5
        x += amp * np.sin(k * phase)
    x /= np.max(np.abs(x)) * 1.35
    # windowed voicing envelope with an unvoiced noise gap
    env = np.ones(n)
    g0, g1 = int(0.45 * n), int(0.55 * n)
    env[g0:g1] = 0.0
    fade = int(0.01 * fs)
    env = np.convolve(env, np.hanning(2 * fade + 1) / np.hanning(2 * fade + 1).sum(), 'same')
    x = x * env + 0.02 * rng.randn(n) * (1 - env) + 0.001 * rng.randn(n)
    # attack/decay
    r = int(0.02 * fs)
    x[:r] *= np.linspace(0, 1, r)
    x[-r:] *= np.linspace(1, 0, r)
    return np.clip(x, -0.99, 0.99)


def wavwrite16(fn, x, fs):
    q = np.clip((x * 32767).astype(np.int64), -32768, 32767).astype('<i2')
    with open(fn, 'wb') as f:
        f.write(b'RIFF' + struct.pack('<I', 36 + 2 * len(q)) + b'WAVE')
        f.write(b'fmt ' + struct.pack('<IHHIIHH', 16, 1, 1, fs, fs * 2, 2, 16))
        f.write(b'data' + struct.pack('<I', 2 * len(q)))
        f.write(q.tobytes())


if __name__ == '__main__':
    wavwrite16('t16.wav', vowel(16000, 3.0), 16000)
    wavwrite16('t48.wav', vowel(48000, 1.0, f0_base=180.0, seed=1), 48000)
    wavwrite16('t22.wav', vowel(22050, 0.7, f0_base=300.0, seed=2), 22050)
    print('wavs written')
