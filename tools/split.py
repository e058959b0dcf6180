#!/usr/bin/env python
"""Per-stage wall split of the config-5 pipeline at the current env knobs.

The pipeline is ONE fused jit program, and the on-device profiler reports
the compiler's cost model rather than measurements (ROADMAP cost model), so
stage costs are measured as differences of separately-compiled CUMULATIVE
PREFIXES, each amortized over chained dispatches with one trailing fetch:

    P1 decimate | P2 +candidates | P3 +refine | P4 +prune | P5 +contour
    P6 +cheaptrick | P7 +d4c | P8 +synthesis (= full batch_wav_to_wav)

Prints one JSON line with per-prefix walls and per-stage deltas (ms/batch).
"""

import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import functools

from bench import synth_utterance
from worldtpu.analysis.harvest import HarvestKernel
from worldtpu.analysis import harvest as H
from worldtpu.analysis import contour_device as CDV
from worldtpu.analysis.cheaptrick import CheapTrickKernel, cheaptrick_frames
from worldtpu.analysis.d4c import d4c_frames
from worldtpu.synthesis import synthesis as S
from worldtpu.parallel import batch as B


def _sync(out):
    """Host scalar fetch: under the axon tunnel block_until_ready can
    return early once per process (verify skill)."""
    for lf in jax.tree_util.tree_leaves(out):
        np.asarray(jax.device_get(jnp.ravel(lf)[:1]))


def main():
    reps = int(os.environ.get("AB_REPS", "8"))
    fs = int(os.environ.get("AB_FS", "22050"))
    n_utts = int(os.environ.get("AB_UTTS", "8"))
    xs = np.stack([
        np.pad(synth_utterance(fs, 3.0, 160.0 + 15 * i, i),
               (0, 4096 * ((3 * fs + 4095) // 4096) - 3 * fs))
        for i in range(n_utts)]).astype(np.float32)
    T = xs.shape[1]

    pitch_scale = float(os.environ.get("AB_PITCH", "1.2"))
    dur_scale = float(os.environ.get("AB_DUR", "1.25"))
    ck = CheapTrickKernel(fs)
    hk = HarvestKernel(fs, T, f0_floor=40.0)
    geo = hk.geo
    x_dev = jax.device_put(jnp.asarray(xs))
    jax.block_until_ready(x_dev)

    f0_once = np.stack([f for f, _ in hk.compute_batch(x_dev)])
    n_grid = f0_once.shape[1]
    out_len = int((n_grid - 1) * 0.005 * dur_scale * fs) + 1
    mp = S.estimate_max_pulses(
        f0_once.astype(np.float32), fs, ck.fft_size, out_len,
        pitch_scale=pitch_scale)
    mp = -(-mp // 128) * 128
    noise = S.make_noise(
        jax.random.PRNGKey(0), n_utts * mp, ck.fft_size,
        jnp.float32).reshape(n_utts, mp, -1)

    k = H._grid_for(jnp.float32)
    geo_k = geo.with_grid(k)
    Fk, Sc = geo_k.f0_length, geo.max_candidates
    tposk = jnp.arange(Fk, dtype=jnp.float32) * (k / 1000.0)

    def one_stages(x, upto):
        mean = jnp.zeros((), x.dtype)
        y = H.decimate_stage(x, ratio=geo.ratio, y_length=geo.y_length)
        if upto == 1:
            return y
        cand, _, _ = H.candidates_stage(y, mean, tposk, geo=geo_k)
        if upto == 2:
            return cand
        from worldtpu.ops.refine_kernel import refine_stage_pallas
        if H._use_refine_kernel_default():
            cand, score = refine_stage_pallas(
                y - mean, cand, tposk, geo=geo_k,
                dedup_tol=H.REFINE_DEDUP_TOL)
        else:
            cand, score = H.refine_stage(y - mean, cand, tposk, geo=geo_k)
        if upto == 3:
            return cand + score
        cand, score = H.remove_unreliable_stage(cand, score)
        if upto == 4:
            return cand + score
        return CDV.fix_and_smooth(cand, score, n_grid, geo.frame_period,
                                  grid_ms=k)

    def prefix(upto):
        @jax.jit
        def fn(x, noise):
            if upto <= 5:
                return jax.vmap(lambda xi: one_stages(xi, upto))(x)
            f0 = jax.vmap(lambda xi: one_stages(xi, 5))(x)
            f0 = (f0 * pitch_scale).astype(x.dtype)
            F = f0.shape[1]
            tpos = jnp.arange(F, dtype=x.dtype) * (geo.frame_period / 1e3)
            spec = jax.vmap(lambda xi, fi: cheaptrick_frames(
                xi, fi, tpos, fs=fs, fft_size=ck.fft_size,
                max_half_window=ck.max_half_window))(x, f0)
            if upto == 6:
                return spec
            ap = jax.vmap(lambda xi, fi: d4c_frames(
                xi, fi, tpos, fs=fs, fft_size_out=ck.fft_size))(x, f0)
            if upto == 7:
                return spec + ap
            y = jax.vmap(lambda fi, si, ai, ni: S.synthesis_frames_impl(
                fi, si, ai, ni, fs=fs, fft_size=ck.fft_size,
                frame_period_s=0.005 * dur_scale, out_length=out_len,
                max_pulses=mp))(f0, spec, ap, noise)
            return y
        return fn

    names = ["decimate", "candidates", "refine", "prune", "contour",
             "cheaptrick", "d4c", "synthesis"]
    walls = {}
    for upto in range(1, 9):
        fn = prefix(upto)
        out = fn(x_dev, noise)
        jax.block_until_ready(out)
        best = None
        for _ in range(2):
            t0 = time.time()
            outs = [fn(x_dev, noise) for _ in range(reps)]
            _sync(outs[-1])
            w = (time.time() - t0) / reps
            best = w if best is None else min(best, w)
        walls[upto] = best * 1e3

    deltas = {}
    prev = 0.0
    for upto in range(1, 9):
        deltas[names[upto - 1]] = round(walls[upto] - prev, 1)
        prev = walls[upto]
    print(json.dumps({
        "env": {kk: v for kk, v in os.environ.items()
                if kk.startswith("WORLDTPU_")},
        "prefix_ms": {names[u - 1]: round(walls[u], 1) for u in walls},
        "stage_ms": deltas,
        "total_ms": round(walls[8], 1),
    }))


if __name__ == "__main__":
    sys.exit(main())
