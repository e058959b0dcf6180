#!/usr/bin/env python
"""Isolated refine-kernel A/B: time refine_stage_pallas occupancy knobs
(gf = frames per grid cell, gp = fused group chains per loop body, pairs)
on the config-5 batch's precomputed candidates.

Candidates run ONCE outside the timed region; each variant is a separately
jitted vmap over the 8-utterance batch.  Prints one JSON line per variant.

Usage: python tools/refine_ab.py [reps]
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
from worldtpu.ops.refine_kernel import refine_stage_pallas


def _sync(out):
    """Force completion via a tiny host fetch: under the axon tunnel,
    block_until_ready can return early once per process (verify skill)."""
    leaves = jax.tree_util.tree_leaves(out)
    for lf in leaves:
        np.asarray(jax.device_get(jnp.ravel(lf)[:1]))


def wall(fn, args, reps):
    """Amortized per-dispatch wall; each rep gets a distinct first-arg
    value (repeated identical dispatches can be memoized upstream)."""
    y, cand = args
    ys = [y if i == 0 else y * (1.0 + np.float32(i) * 1e-7)
          for i in range(reps)]
    jax.block_until_ready(ys)
    out0 = fn(ys[0], cand)
    jax.block_until_ready(out0)
    best = np.inf
    for _ in range(2):
        t0 = time.time()
        outs = [fn(yi, cand) for yi in ys]
        _sync(outs[-1])
        best = min(best, (time.time() - t0) / reps)
    return best * 1e3, out0


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 16
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
    tposk = jnp.arange(geo_k.f0_length, dtype=jnp.float32) * (k / 1000.0)

    @jax.jit
    def prep(x):
        def one(xi):
            y = H.decimate_stage(xi, ratio=geo.ratio, y_length=geo.y_length)
            cand, _, _ = H.candidates_stage(
                y, jnp.zeros((), x.dtype), tposk, geo=geo_k)
            return y, cand
        return jax.vmap(one)(x)

    x = jax.device_put(jnp.asarray(xs))
    y, cand = prep(x)
    jax.block_until_ready((y, cand))

    def variant(**kw):
        @jax.jit
        def f(yb, cb):
            def one(yi, ci):
                return refine_stage_pallas(
                    yi, ci, tposk, geo=geo_k,
                    dedup_tol=H.REFINE_DEDUP_TOL, **kw)
            r, s = jax.vmap(one)(yb, cb)
            return r, s
        return f

    def variant_tol(tol):
        @jax.jit
        def f(yb, cb):
            def one(yi, ci):
                return refine_stage_pallas(yi, ci, tposk, geo=geo_k,
                                           dedup_tol=tol)
            r, s = jax.vmap(one)(yb, cb)
            return r, s
        return f

    variants = [
        ("gf8_gp1", variant(gf=8, gp=1)),
        ("noout", variant(ablate=("noout",))),
        ("noseed", variant(ablate=("noseed",))),
        ("noout_noseed", variant(ablate=("noout", "noseed"))),
    ]

    ref = None
    for name, fn in variants:
        try:
            ms, out = wall(fn, (y, cand), reps)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name,
                              "error": repr(e)[:200]}), flush=True)
            continue
        rec = {"variant": name, "ms_per_batch": round(ms, 2)}
        r = np.sort(np.asarray(out[0]), axis=-1)
        if ref is None:
            ref = r
        else:
            rec["max_abs_sorted_vs_first"] = float(np.max(np.abs(r - ref)))
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
