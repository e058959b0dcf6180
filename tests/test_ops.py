"""Unit tests for worldtpu.ops against op-level C++ golden dumps."""

import gzip
import pathlib

import numpy as np
import jax.numpy as jnp

from worldtpu import ops

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


class ProbeOps:
    """Parses probe_ops.bin (see /tmp build tool probe_ops.cpp layout)."""

    _cache = None

    @classmethod
    def load(cls):
        if cls._cache is not None:
            return cls._cache
        raw = gzip.open(FIXTURES / "probe_ops.bin.gz").read()
        o = [0]

        def f64(n):
            v = np.frombuffer(raw[o[0]:o[0] + 8 * n], "<f8").copy()
            o[0] += 8 * n
            return v

        def i32():
            v = int(np.frombuffer(raw[o[0]:o[0] + 4], "<i4")[0])
            o[0] += 4
            return v

        d = {}
        N = 1000
        d["x"] = f64(N)
        d["decimate"] = {}
        for r in range(2, 13):
            cnt = i32()
            d["decimate"][r] = f64(cnt)
        NK, NQ = 17, 300
        d["xk"] = f64(NK)
        d["yk"] = f64(NK)
        d["xq"] = f64(NQ)
        d["yq"] = f64(NQ)
        d["yi_q"] = f64(NQ)
        d["nuttall"] = f64(129)
        K = 512 // 2 + 1
        d["dc_corr"] = f64(K)
        d["lin_smooth"] = f64(K)
        d["chain"] = f64(K)
        cls._cache = d
        return d


def test_interp1_matches_reference():
    d = ProbeOps.load()
    got = np.asarray(ops.interp1(
        jnp.asarray(d["xk"]), jnp.asarray(d["yk"]), jnp.asarray(d["xq"])))
    np.testing.assert_allclose(got, d["yq"], rtol=1e-10, atol=1e-13)


def test_interp1q_matches_reference():
    d = ProbeOps.load()
    got = np.asarray(ops.interp1q(
        -1.0, 0.37, jnp.asarray(d["yk"]), jnp.asarray(d["xq"])))
    # the reference's interp1Q reads y[base] out of bounds for queries past
    # the grid end (UB); compare only in-range queries (base <= len(y)-1)
    ok = ((d["xq"] + 1.0) / 0.37).astype(int) <= len(d["yk"]) - 1
    np.testing.assert_allclose(got[ok], d["yi_q"][ok], rtol=1e-10, atol=1e-13)


def test_nuttall_window():
    d = ProbeOps.load()
    got = np.asarray(ops.nuttall_window(129))
    np.testing.assert_allclose(got, d["nuttall"], rtol=1e-12, atol=1e-15)
    ragged = np.asarray(ops.nuttall_window_ragged(129, 200))
    np.testing.assert_allclose(ragged[:129], d["nuttall"], rtol=1e-12, atol=1e-15)
    assert np.all(ragged[129:] == 0.0)


def test_decimate_all_ratios():
    d = ProbeOps.load()
    x = jnp.asarray(d["x"])
    for r in range(2, 13):
        got = np.asarray(ops.decimate(x, r))
        want = d["decimate"][r]
        assert got.shape[0] == want.shape[0], (r, got.shape, want.shape)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12,
                                   err_msg=f"ratio {r}")


def test_dc_correction():
    d = ProbeOps.load()
    K = 257
    ps = _probe_power_spectrum(K)
    got = np.asarray(ops.dc_correction(jnp.asarray(ps), 160.0, 16000, 512))
    # the C++ writes only bins < upper_limit-1; the probe's buffer beyond
    # that is uninitialized, so compare the written prefix (the full-array
    # in-place semantics are covered by test_dc_then_smooth_chain)
    upper = 2 + int(160.0 * 512 / 16000)
    np.testing.assert_allclose(got[:upper - 1], d["dc_corr"][:upper - 1],
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(got[upper - 1:], ps[upper - 1:], rtol=0)


def test_linear_smoothing():
    d = ProbeOps.load()
    K = 257
    ps = _probe_power_spectrum(K)
    width = 160.0 * 2.0 / 3.0
    max_b = int(width * 512 / 16000) + 1
    got = np.asarray(ops.linear_smoothing(
        jnp.asarray(ps), width, 16000, 512, max_boundary=max_b))
    np.testing.assert_allclose(got, d["lin_smooth"], rtol=1e-10, atol=1e-13)


def test_dc_then_smooth_chain():
    d = ProbeOps.load()
    K = 257
    ps = jnp.asarray(_probe_power_spectrum(K))
    c = ops.dc_correction(ps, 123.4, 16000, 512)
    width = 123.4 * 2.0 / 3.0
    c = ops.linear_smoothing(c, width, 16000, 512,
                             max_boundary=int(width * 512 / 16000) + 1)
    np.testing.assert_allclose(np.asarray(c), d["chain"], rtol=1e-10, atol=1e-13)


def _probe_power_spectrum(K):
    i = np.arange(K, dtype=np.float64)
    return (1e-3 + np.exp(-0.5 * ((i - 40.0) / 15.0) ** 2)
            + 0.3 * np.exp(-0.5 * ((i - 130.0) / 30.0) ** 2))


def test_minimum_phase_roundtrip():
    # |minphase| must equal exp(log-amplitude); phase must be causal
    rng = np.random.RandomState(0)
    K = 65
    la = rng.randn(3, K) * 0.3 - 1.0
    mp = np.asarray(ops.minimum_phase(jnp.asarray(la)))
    np.testing.assert_allclose(np.abs(mp), np.exp(la), rtol=1e-9)
    # causality: irfft of minphase spectrum should have (near-)zero energy
    # in the anticausal half relative to the causal half
    h = np.fft.irfft(mp, axis=-1)
    n = h.shape[-1]
    causal = np.sum(h[:, : n // 2] ** 2)
    anti = np.sum(h[:, n // 2:] ** 2)
    assert anti < 1e-2 * causal


def test_minimum_phase_matches_cpp_probe():
    # Values from probe.cpp run against the C++ MinimumPhaseAnalysis:
    # reference output is conj(standard) — so compare against conj.
    m = 32
    ls = -0.5 + 0.1 * np.sin(0.4 * np.arange(m // 2 + 1))
    mp = np.asarray(ops.minimum_phase(jnp.asarray(ls)))
    # reproduce the standard construction independently
    full = np.concatenate([ls, ls[-2:0:-1]])
    cep = np.fft.ifft(full)
    cep[1:m // 2] *= 2
    cep[m // 2 + 1:] = 0
    want = np.exp(np.fft.fft(cep))[:m // 2 + 1]
    np.testing.assert_allclose(mp, want, rtol=1e-12)


def test_iir_affine_scan_matches_direct():
    # against a literal sequential implementation of the reference recurrence
    rng = np.random.RandomState(1)
    x = rng.randn(500)
    a = (1.4499664446880227, -0.98943497080950582, 0.24578252340690215)
    b = (0.036710750339322612, 0.11013225101796784)
    w = [0.0, 0.0, 0.0]
    y_ref = np.empty_like(x)
    for i in range(len(x)):
        wt = x[i] + a[0] * w[0] + a[1] * w[1] + a[2] * w[2]
        y_ref[i] = b[0] * wt + b[1] * w[0] + b[1] * w[1] + b[0] * w[2]
        w = [wt, w[0], w[1]]
    got = np.asarray(ops.iir_affine_scan(jnp.asarray(x), a, b))
    np.testing.assert_allclose(got, y_ref, rtol=1e-9, atol=1e-12)


def test_biquad_zero_lag_matches_direct():
    rng = np.random.RandomState(2)
    x = rng.randn(400)
    b = (0.0078202080334971724, 0.015640416066994345)
    a = (1.7347257688092754, -0.76600660094326412)

    def fwd(sig):
        w = [0.0, 0.0]
        out = np.empty_like(sig)
        for i in range(len(sig)):
            wt = sig[i] + a[0] * w[0] + a[1] * w[1]
            out[len(sig) - i - 1] = b[0] * wt + b[1] * w[0] + b[0] * w[1]
            w = [wt, w[0]]
        return out

    want = fwd(fwd(x.copy()))
    got = np.asarray(ops.biquad_zero_lag(jnp.asarray(x), a, b))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_xorshift_randn_stream():
    from worldtpu.native import XorshiftRandn
    # first values recorded from the C++ probe (fresh process seed)
    want = np.array([-1.06071551, 0.73608657, -0.40908084, 0.59019394,
                     -1.54211733, -1.22543547, -1.74564823, -0.81401881])
    gen = XorshiftRandn()
    got = gen.draw(8)
    np.testing.assert_allclose(got, want, atol=2e-8)


def test_dc_correction_frames_matches_per_frame():
    """Batched low-bin-slice DCCorrection == vmapped full-spectrum one."""
    import jax
    import jax.numpy as jnp
    from worldtpu.ops import filters

    rng = np.random.RandomState(3)
    N, K, fs, fft_size = 33, 1025, 22050, 2048
    ps = jnp.asarray(np.abs(rng.randn(N, K)).astype(np.float32))
    f0 = jnp.asarray((60 + 700 * rng.rand(N)).astype(np.float32))
    ref = jax.vmap(
        lambda p, f: filters.dc_correction(p, f, fs, fft_size))(ps, f0)
    got = filters.dc_correction_frames(ps, f0, fs, fft_size, 1.2 * 800.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=0)
