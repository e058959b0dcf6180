#!/usr/bin/env python
"""Isolated zc-kernel A/B: time band_candidates_pallas variants on the
config-5 batch's precomputed band-filtered signals.

The filter bank runs ONCE outside the timed region; each variant is a
separately-jitted vmap over the 8-utterance batch, amortized over reps with
one tiny fetch.  Prints one JSON line per variant:

    {"variant": ..., "ms_per_batch": ..., "max_abs_vs_default": ...}

Usage: python tools/zc_ab.py [reps] [variant ...]
Variants default to the full attribution set.
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
from worldtpu.analysis.harvest import HarvestKernel
from worldtpu.analysis import harvest as H
from worldtpu.ops import zc_kernel as Z


def _sync(out):
    """Force completion via a tiny host fetch: under the axon tunnel,
    block_until_ready can return early once per process (verify skill)."""
    leaves = jax.tree_util.tree_leaves(out)
    for lf in leaves:
        np.asarray(jax.device_get(jnp.ravel(lf)[:1]))


def wall(fn, x, reps):
    """Amortized per-dispatch wall.  Each rep gets a DISTINCT input value
    (x * (1 + i*1e-7)): repeated identical (program, args) dispatches can
    be memoized upstream (observed: ~0 ms for the first variants of a
    process), which would fake the measurement."""
    xs = [x if i == 0 else x * (1.0 + np.float32(i) * 1e-7)
          for i in range(reps)]
    jax.block_until_ready(xs)
    out0 = fn(xs[0])
    jax.block_until_ready(out0)
    best = np.inf
    for _ in range(2):
        t0 = time.time()
        outs = [fn(xi) for xi in xs]
        # host scalar fetch: block_until_ready can return early once per
        # process under the axon tunnel (see .claude/skills/verify)
        _sync(outs[-1])
        best = min(best, (time.time() - t0) / reps)
    return best * 1e3, out0


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    only = set(sys.argv[2:])
    fs = 22050
    n_utts = 8
    xs = np.stack([
        np.pad(synth_utterance(fs, 3.0, 160.0 + 15 * i, i),
               (0, 4096 * ((3 * fs + 4095) // 4096) - 3 * fs))
        for i in range(n_utts)]).astype(np.float32)
    T = xs.shape[1]
    hk = HarvestKernel(fs, T, f0_floor=40.0)
    geo = hk.geo
    k = H._grid_for(jnp.float32)
    geo_k = geo.with_grid(k)

    @jax.jit
    def mk_filt(x):
        def one(xi):
            y = H.decimate_stage(xi, ratio=geo.ratio, y_length=geo.y_length)
            parts = []
            for lo, hi, Lg in H._conv_groups(geo_k):
                parts.append(H._band_filter_matmul(y, geo_k, y.dtype, lo,
                                                   hi, Lg))
            return jnp.concatenate(parts, axis=0)
        return jax.vmap(one)(x)

    x = jax.device_put(jnp.asarray(xs))
    filt = mk_filt(x)
    jax.block_until_ready(filt)

    def variant(**kw):
        @jax.jit
        def f(ft):
            return jax.vmap(functools.partial(
                Z.band_candidates_pallas, geo=geo_k, **kw))(ft)
        return f

    variants = [
        ("warmup", variant()),
        ("default", variant()),
        ("cs256", variant(cs=256)),
        ("cs256_rb4", variant(cs=256, rb=4)),
    ]
    if only:
        variants = [(n, f) for n, f in variants if n in only]

    ref = None
    for name, fn in variants:
        try:
            ms, out = wall(fn, filt, reps)
        except Exception as e:  # noqa: BLE001 - report per-variant failures
            print(json.dumps({"variant": name,
                              "error": repr(e)[:200]}), flush=True)
            continue
        rec = {"variant": name, "ms_per_batch": round(ms, 2)}
        if name == "default":
            ref = np.asarray(out)
        elif ref is not None and not name.startswith(("phase1", "warmup")):
            d = np.asarray(out)
            rec["frac_gt_0.1hz"] = float(np.mean(np.abs(d - ref) > 0.1))
            rec["max_abs_vs_default"] = float(np.max(np.abs(d - ref)))
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
