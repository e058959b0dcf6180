#!/usr/bin/env python
"""A/B measurement burst for the round-3 queued optimizations.

Runs the config-5 corpus-stream pipeline (8x3s 22.05 kHz, pitch 1.2x /
duration 1.25x) under the knob combo given by the current environment,
amortizing walls over chained dispatches with ONE fetch at the end (the
dev-tunnel fetch floor is ~26 ms; per-rep fetches would swamp kernel-level
deltas).  Prints one JSON line:

    {"combo", "wall_ms_per_batch", "rtf", "f0_rmse_hz", "vuv"}

Quality proxy: Harvest F0 of utterance 0 vs a cached default-knob run
(tools/ab_f0_ref.npy, written when absent), so knob combos are compared
against the production default rather than the C++ (bench.py owns the real
quality gates).

Drive it per-combo from a shell loop; knobs are module-level so each combo
needs a fresh process:

    for c in "" "WORLDTPU_CONV=conv" "WORLDTPU_ZC_GROUPS=5"; do
        env $c python tools/ab.py; done
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

from bench import synth_utterance
from worldtpu.analysis.harvest import HarvestKernel
from worldtpu.analysis.cheaptrick import CheapTrickKernel
from worldtpu import synthesis as _s
from worldtpu.synthesis import synthesis as S
from worldtpu.parallel import batch as B

REF_F0 = pathlib.Path(__file__).with_name("ab_f0_ref.npy")


def _sync(out):
    """Host scalar fetch: under the axon tunnel block_until_ready can
    return early once per process (verify skill)."""
    for lf in jax.tree_util.tree_leaves(out):
        np.asarray(jax.device_get(jnp.ravel(lf)[:1]))


def main():
    reps = int(os.environ.get("AB_REPS", "6"))
    fs = 22050
    n_utts = 8
    xs = np.stack([
        np.pad(synth_utterance(fs, 3.0, 160.0 + 15 * i, i),
               (0, 4096 * ((3 * fs + 4095) // 4096) - 3 * fs))
        for i in range(n_utts)]).astype(np.float32)
    T = xs.shape[1]
    audio_s = n_utts * 3.0

    pitch_scale, dur_scale = 1.2, 1.25
    ck = CheapTrickKernel(fs)
    hk = HarvestKernel(fs, T, f0_floor=40.0)
    x_dev = jax.device_put(jnp.asarray(xs))
    jax.block_until_ready(x_dev)

    f0_once = np.stack([f for f, _ in hk.compute_batch(x_dev)])
    out_len = int((f0_once.shape[1] - 1) * 0.005 * dur_scale * fs) + 1
    mp = S.estimate_max_pulses(
        f0_once.astype(np.float32), fs, ck.fft_size, out_len,
        pitch_scale=pitch_scale)
    mp = -(-mp // 128) * 128
    noise = S.make_noise(
        jax.random.PRNGKey(0), n_utts * mp, ck.fft_size,
        jnp.float32).reshape(n_utts, mp, -1)

    def run():
        y, f0 = B.batch_wav_to_wav(
            x_dev, noise, geo=hk.geo, fs=fs, fft_size=ck.fft_size,
            max_half_window=ck.max_half_window,
            frame_period_s=0.005 * dur_scale, out_length=out_len,
            max_pulses=mp, mesh=None, pitch_scale=pitch_scale)
        return y, f0

    y, f0 = run()
    jax.block_until_ready(y)            # compile + warm
    assert np.isfinite(np.asarray(y)).all()

    walls = []
    for _ in range(2):
        t0 = time.time()
        outs = [run() for _ in range(reps)]
        _sync(outs[-1])
        walls.append((time.time() - t0) / reps)
    wall = min(walls)

    # quality proxy vs the cached default-knob F0
    f0_np = np.asarray(f0[0], np.float64)
    combo = {k: v for k, v in os.environ.items()
             if k.startswith("WORLDTPU_")} or {"default": "1"}
    ref_src = "cache"
    if not REF_F0.exists():
        if combo == {"default": "1"}:
            np.save(REF_F0, f0_np)
        else:
            # no cached default-knob reference: the comparison below would
            # be against itself and read as spuriously quality-neutral
            ref_src = "self (run the default combo first to cache a ref)"
        ref = f0_np
    else:
        ref = np.load(REF_F0)
    both = (ref > 0) & (f0_np > 0)
    rmse = (float(np.sqrt(np.mean((ref[both] - f0_np[both]) ** 2)))
            if both.any() else float("nan"))
    vuv = float(np.mean((ref > 0) == (f0_np > 0)))

    print(json.dumps({
        "combo": combo,
        "wall_ms_per_batch": round(wall * 1e3, 1),
        "rtf": round(audio_s / wall, 1),
        "f0_rmse_hz_vs_default": round(rmse, 4),
        "vuv_vs_default": round(vuv, 4),
        "ref": ref_src,
    }))


if __name__ == "__main__":
    sys.exit(main())
