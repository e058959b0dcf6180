#!/usr/bin/env python
"""Per-stage wall split of the config-5 corpus pipeline via cumulative
prefixes.

The dev-tunnel fetch floor (~26 ms) and the profiler's cost-model bias
(ROADMAP cost model) make per-op timings unreliable; the trustworthy
measurement is the wall around SEPARATELY-JITTED cumulative prefixes of the
pipeline, amortized over reps with one tiny fetch at the end.  Stage cost =
difference of consecutive prefix walls.

Usage:  python tools/profile_stages.py [reps]
Prints one JSON line {"prefix_ms": {...}, "stage_ms": {...}}.
"""

import functools
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from bench import synth_utterance
from worldtpu.analysis.cheaptrick import CheapTrickKernel, cheaptrick_frames
from worldtpu.analysis.d4c import d4c_frames
from worldtpu.analysis.harvest import HarvestKernel
from worldtpu.analysis import harvest as H
from worldtpu.analysis import contour_device as CDV
from worldtpu.synthesis import synthesis as S
from worldtpu.parallel import batch as B


def _sync(out):
    """Force completion via a tiny host fetch: under the axon tunnel,
    block_until_ready can return early once per process (verify skill)."""
    leaves = jax.tree_util.tree_leaves(out)
    for lf in leaves:
        np.asarray(jax.device_get(jnp.ravel(lf)[:1]))


def wall(fn, x, reps):
    out = fn(x)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(2):
        t0 = time.time()
        for _ in range(reps):
            out = fn(x)
        _sync(out)
        best = min(best, (time.time() - t0) / reps)
    return best * 1e3


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    fs = 22050
    n_utts = 8
    xs = np.stack([
        np.pad(synth_utterance(fs, 3.0, 160.0 + 15 * i, i),
               (0, 4096 * ((3 * fs + 4095) // 4096) - 3 * fs))
        for i in range(n_utts)]).astype(np.float32)
    T = xs.shape[1]
    ck = CheapTrickKernel(fs)
    hk = HarvestKernel(fs, T, f0_floor=40.0)
    geo = hk.geo
    x = jax.device_put(jnp.asarray(xs))
    jax.block_until_ready(x)

    pitch_scale, dur_scale = 1.2, 1.25
    n_grid = 1 + int(1000.0 * geo.x_length / geo.fs / geo.frame_period)
    out_len = int((n_grid - 1) * 0.005 * dur_scale * fs) + 1

    f0_once = np.stack([f for f, _ in hk.compute_batch(x)])
    mp = S.estimate_max_pulses(f0_once.astype(np.float32), fs, ck.fft_size,
                               out_len, pitch_scale=pitch_scale)
    mp = -(-mp // 128) * 128
    noise = S.make_noise(jax.random.PRNGKey(0), n_utts * mp, ck.fft_size,
                         jnp.float32).reshape(n_utts, mp, -1)

    k = H._grid_for(jnp.float32)
    geo_k = geo.with_grid(k)
    tposk = jnp.arange(geo_k.f0_length, dtype=jnp.float32) * (k / 1000.0)

    def reduce_out(*ts):
        return sum(jnp.sum(t) for t in ts if t.dtype != bool)

    @jax.jit
    def p_decimate(x):
        y = jax.vmap(lambda xi: H.decimate_stage(
            xi, ratio=geo.ratio, y_length=geo.y_length))(x)
        return reduce_out(y)

    @jax.jit
    def p_filter(x):
        def one(xi):
            y = H.decimate_stage(xi, ratio=geo.ratio, y_length=geo.y_length)
            parts = []
            for lo, hi, Lg in H._conv_groups(geo_k):
                parts.append(H._band_filter_matmul(y, geo_k, y.dtype, lo,
                                                   hi, Lg))
            return jnp.concatenate(parts, axis=0)
        return reduce_out(jax.vmap(one)(x))

    @jax.jit
    def p_zc(x):
        def one(xi):
            y = H.decimate_stage(xi, ratio=geo.ratio, y_length=geo.y_length)
            cand, raw, base = H.candidates_stage(
                y, jnp.zeros((), x.dtype), tposk, geo=geo_k)
            return raw
        return reduce_out(jax.vmap(one)(x))

    @jax.jit
    def p_overlap(x):
        def one(xi):
            y = H.decimate_stage(xi, ratio=geo.ratio, y_length=geo.y_length)
            cand, raw, base = H.candidates_stage(
                y, jnp.zeros((), x.dtype), tposk, geo=geo_k)
            return cand
        return reduce_out(jax.vmap(one)(x))

    from worldtpu.ops.refine_kernel import refine_stage_pallas

    @jax.jit
    def p_refine(x):
        def one(xi):
            y = H.decimate_stage(xi, ratio=geo.ratio, y_length=geo.y_length)
            cand, raw, base = H.candidates_stage(
                y, jnp.zeros((), x.dtype), tposk, geo=geo_k)
            c, s = refine_stage_pallas(y, cand, tposk, geo=geo_k,
                                       dedup_tol=H.REFINE_DEDUP_TOL)
            return c, s
        c, s = jax.vmap(one)(x)
        return reduce_out(c, s)

    @jax.jit
    def p_prune(x):
        def one(xi):
            return H.harvest_device_stages(xi, jnp.zeros((), x.dtype),
                                           geo=geo)
        return reduce_out(jax.vmap(one)(x))

    @jax.jit
    def p_contour(x):
        mean = jnp.zeros((x.shape[0],), x.dtype)
        f0 = H.harvest_device_full_batch(x, mean, geo, n_grid, 32)
        return reduce_out(f0)

    tpos_out = (jnp.arange(n_grid, dtype=jnp.float32) * 0.005)

    @jax.jit
    def p_cheaptrick(x):
        mean = jnp.zeros((x.shape[0],), x.dtype)
        f0 = H.harvest_device_full_batch(x, mean, geo, n_grid, 32)
        f0 = f0 * pitch_scale
        spec = jax.vmap(lambda xi, fi: cheaptrick_frames(
            xi, fi, tpos_out, fs=fs, fft_size=ck.fft_size,
            max_half_window=ck.max_half_window))(x, f0)
        return reduce_out(spec)

    @jax.jit
    def p_d4c(x):
        mean = jnp.zeros((x.shape[0],), x.dtype)
        f0 = H.harvest_device_full_batch(x, mean, geo, n_grid, 32)
        f0 = f0 * pitch_scale
        spec = jax.vmap(lambda xi, fi: cheaptrick_frames(
            xi, fi, tpos_out, fs=fs, fft_size=ck.fft_size,
            max_half_window=ck.max_half_window))(x, f0)
        ap = jax.vmap(lambda xi, fi: d4c_frames(
            xi, fi, tpos_out, fs=fs, fft_size_out=ck.fft_size))(x, f0)
        return reduce_out(spec, ap)

    def p_full(x):
        y, f0 = B.batch_wav_to_wav(
            x, noise, geo=geo, fs=fs, fft_size=ck.fft_size,
            max_half_window=ck.max_half_window,
            frame_period_s=0.005 * dur_scale, out_length=out_len,
            max_pulses=mp, mesh=None, pitch_scale=pitch_scale)
        return y

    prefixes = [
        ("decimate", p_decimate),
        ("filter", p_filter),
        ("zc", p_zc),
        ("overlap", p_overlap),
        ("refine", p_refine),
        ("prune", p_prune),
        ("contour", p_contour),
        ("cheaptrick", p_cheaptrick),
        ("d4c", p_d4c),
        ("full", p_full),
    ]
    names = [n for n, _ in prefixes]
    walls = {}
    for name, fn in prefixes:
        walls[name] = round(wall(fn, x, reps), 1)
    stages = {}
    prev = 0.0
    for n in names:
        stages[n] = round(walls[n] - prev, 1)
        prev = walls[n]
    print(json.dumps({"prefix_ms": walls, "stage_ms": stages}))


if __name__ == "__main__":
    main()
