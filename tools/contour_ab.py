#!/usr/bin/env python
"""Contour-chain micro-profile: cumulative-prefix walls of the device
contour stages (search/fix1/fix2/fix3/fix4/smooth/subsample) on the
config-5 batch's real refined candidates.

Usage: python tools/contour_ab.py [reps]
Prints one JSON line {"prefix_ms": ..., "stage_ms": ...}.
"""

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
from worldtpu.analysis import contour_device as CDV
from worldtpu.ops.refine_kernel import refine_stage_pallas


def _sync(out):
    """Force completion via a tiny host fetch: under the axon tunnel,
    block_until_ready can return early once per process (verify skill)."""
    leaves = jax.tree_util.tree_leaves(out)
    for lf in leaves:
        np.asarray(jax.device_get(jnp.ravel(lf)[:1]))


def wall(fn, args, reps):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(2):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.time() - t0) / reps)
    return best * 1e3


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
    n_out = hk.get_samples()

    @jax.jit
    def prep(x):
        def one(xi):
            y = H.decimate_stage(xi, ratio=geo.ratio, y_length=geo.y_length)
            cand, _, _ = H.candidates_stage(
                y, jnp.zeros((), x.dtype), tposk, geo=geo_k)
            r, s = refine_stage_pallas(y, cand, tposk, geo=geo_k,
                                       dedup_tol=H.REFINE_DEDUP_TOL,
                                       gf=H.REFINE_GF)
            return H.remove_unreliable_stage(r, s)
        return jax.vmap(one)(x)

    x = jax.device_put(jnp.asarray(xs))
    cand, sc = prep(x)
    jax.block_until_ready((cand, sc))

    def red(t):
        return jnp.sum(t)

    def stagejit(upto):
        @jax.jit
        def f(cb, sb):
            def one(ci, si):
                c1 = CDV.search_f0_base(ci, si)
                if upto == "search":
                    return c1
                c2 = CDV.fix_step1(c1, 0.008 * k)
                if upto == "fix1":
                    return c2
                c1b = CDV.fix_step2(c2, max(1, round(6 / k)))
                if upto == "fix2":
                    return c1b
                c2b = CDV.fix_step3(c1b, ci, si, 0.18 * k, grid_ms=k)
                if upto == "fix3":
                    return c2b
                best = CDV.fix_step4(c2b, max(1, round(9 / k)))
                if upto == "fix4":
                    return best
                f0g = CDV.smooth_f0_contour(best)
                if upto == "smooth":
                    return f0g
                tpos = jnp.arange(n_out, dtype=ci.dtype) * 0.005
                xg = tpos * (1000.0 / k)
                pick = jnp.minimum(ci.shape[0] - 1, jnp.where(
                    xg > 0, jnp.floor(xg + 0.5),
                    jnp.ceil(xg - 0.5)).astype(jnp.int32))
                return f0g[pick]
            return red(jax.vmap(one)(cb, sb))
        return f

    walls = {}
    for name in ("search", "fix1", "fix2", "fix3", "fix4", "smooth",
                 "sub"):
        walls[name] = round(wall(stagejit(name), (cand, sc), reps), 2)
    stages = {}
    prev = 0.0
    for n, w in walls.items():
        stages[n] = round(w - prev, 2)
        prev = w
    print(json.dumps({"prefix_ms": walls, "stage_ms": stages}))


if __name__ == "__main__":
    main()
