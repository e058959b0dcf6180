"""Pallas TPU kernel: zero-crossing event extraction -> F0 candidate contour.

Replaces the event-compaction scatter + location->frame scatter-add in the
Harvest candidates stage (reference zeroCrossingEngine + interp1-to-frames,
/root/reference/src/harvest.cpp:1179-1219,1098-1143).  XLA lowers those
scatters through a sort of the full update count (~8.9M elements for a 3 s
utterance, ~211 ms); this kernel computes the same result with no scatter:

  per band (one grid cell):
    1. negative-going crossing masks + sub-sample positions ("fines") for
       the four signal variants (f, -f, diff f, -diff f), in a [128, Stot]
       lane-major layout (sample i at sublane i%128, lane i//128)
    2. per-128-sample-column event compaction: lane-column ranks via one
       triangular-matrix matmul (MXU), then a static k-loop selecting the
       k-th event of every column at once (VPU reduction, no scatter)
    3. columns are written into a sorted per-type event buffer at their
       running offsets (dynamic-sublane-offset stores, the only sequential
       part, one store per nonempty column)
    4. locations (midpoints of consecutive events) and intervals, then
       interpolation onto the 1 ms frame grid as a merge-sweep: frame tiles
       of 128 with a carried window base into the sorted event list (both
       are sorted, so a bounded window suffices; the window bound comes
       from the same crossing-rate model that sizes e_max)

Bands are processed in groups (by boundary frequency octave) so the event
capacity, per-column capacity, and sweep window scale with each group's
maximum crossing rate.

Numerics match the jnp production path (worldtpu/analysis/harvest.py
_zero_crossings/_band_candidates) operation-for-operation, so results agree
to f32 rounding; tests compare against that path directly.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from worldtpu import constants as C
from worldtpu.flags import FLAGS


def _round_up(x, m):
    return ((x + m - 1) // m) * m


_round_up_static = _round_up


class _GroupGeom:
    """Static geometry for one band group (contiguous row range whose
    maximum boundary frequency is bound_top)."""

    def __init__(self, geo, lo, hi, bound_top, win_round=8, ft=None):
        self.lo = lo
        self.hi = hi
        self.n_bands = hi - lo
        dur = geo.x_length / geo.fs
        # crossing-rate model (same 1.8 margin as HarvestGeometry.e_max)
        self.e_cap = int(min(geo.y_length // 2 + 2,
                             dur * bound_top * 1.8 + 64))
        # per-128-sample-column capacity: min spacing fs_a/(1.5*bound)
        rate = 1.5 * bound_top / geo.actual_fs          # events per sample
        self.c_row = _round_up(int(128.0 * rate) + 4, 8)
        # merge-sweep window: locations per frame tile + slack.  The
        # crossing rate of a [0.5b, 1.5b]-bandpassed signal is bounded by
        # 1.5b; 1.65 margin + base-quantization slack.  A frame tile is
        # ft*128 frames; ft > 1 amortizes the fixed slack + per-tile prep
        # for low groups (r5 device A/B with the joint window prep: 49.2
        # vs 52.1 ms at ft=1) BUT the [wext, ft*128] sweep temporaries
        # scale with ft and blew the 16 MB scoped-VMEM limit on long-form
        # geometries (12 s harvest chunks, F ~ 14k) at ft up to 12 — so
        # ft caps at 4 and long frame axes fall back to 1.
        # Alignment only needs the f32 sublane tile (8); the old
        # 64-rounding cost low groups ~1.5x phase-2 work.
        base = max(1, int(0.128 * geo.grid_ms * bound_top * 1.65))
        if ft is None:
            ft = max(1, min(4, 224 // base)) if geo.f0_length <= 8000 else 1
        self.ft = ft
        self.win = _round_up(base * ft + 24, win_round)
        self.e_cap = _round_up(max(self.e_cap, self.win + 16), 128)
        self.win = min(self.win, self.e_cap - 8)


def make_groups(geo, n_groups=5, stride=1, win_round=8, ft=None):
    """Split the band-row axis into octave-ish groups with shared caps.

    With stride > 1 the rows are a strided subset bands[t::stride] of the
    global band list (band-parallel sharding); caps then use the stride-max
    boundary of each group's global range so every shard compiles the same
    program."""
    nb = -(-geo.n_channels // stride) if stride > 1 else geo.n_channels
    n_groups = max(1, min(n_groups, nb))
    edges = np.linspace(0, nb, n_groups + 1).astype(int)
    out = []
    for a, b in zip(edges[:-1], edges[1:]):
        if b <= a:
            continue
        g_hi = min(int(b) * stride, geo.n_channels)
        out.append(_GroupGeom(geo, int(a), int(b),
                              float(geo.boundary_f0[g_hi - 1]),
                              win_round=win_round, ft=ft))
    return tuple(out)


def _zc_group_kernel(filt_ref, out_ref, colbuf, wbuf, cnt_smem, *,
                     y_length, stot, f_pad, e_cap, c_row, win, fs_a,
                     n_frames_tiles, rb=1, grid_hz=1000.0, ft=1, cs=128):
    """``rb`` bands per grid cell.  filt_ref [rb, cs, Stot], out
    [rb, 8, Fpad] (row 0 of the middle dim carries each band's result; the
    8-row middle dim exists only to satisfy Mosaic's (8, 128)-divisible
    block rule).

    The store/advance and sweep-window chains of every (band, event-type)
    pair are independent serial dependence chains — the kernel is LATENCY-
    bound on them, so fusing all 4*rb chains into each loop body lets the
    scheduler overlap them (same pattern that fused the 4 per-type chains;
    rb > 1 extends it across bands, halving total loop trip counts again)."""
    dt = jnp.float32
    nch = 4 * rb                                         # fused chains

    # cs = samples per compaction column (per-column capacity c_row scales
    # with it at the call site).  cs=256 halves the dynamic-store count at
    # 2x the k-loop trips; r5 device A/B: 54.3 vs 49.1 ms — REJECTED
    # (after the independent-offset stores the k-loop cost dominates the
    # halved stores).  cs=128 stays the default.
    sub = jax.lax.broadcasted_iota(jnp.int32, (cs, stot), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (cs, stot), 1)
    gi = sub + cs * lane                                 # global sample index

    tri = (jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 0)
           >= jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 1)
           ).astype(dt)                                  # inclusive lower-tri

    colbuf[...] = jnp.full((e_cap, nch), jnp.inf, dt)

    s8 = _round_up_static(stot, 8)
    chunks = []
    ccols = []
    for r in range(rb):
        sT = filt_ref[r]                                 # [cs, Stot]
        # s_{i+1} in lane-major layout: shift down one sublane, last
        # sublane takes the next column's first sublane
        top = sT[0:1, :]                                 # [1, Stot]
        top_next = jnp.concatenate(
            [top[:, 1:], jnp.zeros((1, 1), dt)], axis=1)
        snx = jnp.concatenate([sT[1:, :], top_next], axis=0)
        g = snx - sT                                     # diff signal
        gtop = g[0:1, :]
        gtop_next = jnp.concatenate(
            [gtop[:, 1:], jnp.zeros((1, 1), dt)], axis=1)
        gnx = jnp.concatenate([g[1:, :], gtop_next], axis=0)

        types = ((sT, snx, y_length), (-sT, -snx, y_length),
                 (g, gnx, y_length - 1), (-g, -gnx, y_length - 1))
        for t, (sig, signx, n_eff) in enumerate(types):
            mask = (sig > 0.0) & (signx <= 0.0) & (gi < n_eff - 1)
            fine = (gi + 1).astype(dt) - sig / (signx - sig)
            mf = mask.astype(dt)
            # per-column inclusive rank via MXU
            lrank = jnp.dot(tri, mf, preferred_element_type=dt,
                            precision=jax.lax.Precision.HIGHEST) - 1.0
            # k-loop compaction: chunkT[k, s] = k-th event of every column
            rows = []
            for k in range(c_row):
                sel = mask & (lrank == float(k))
                rows.append(jnp.sum(jnp.where(sel, fine, 0.0), axis=0,
                                    keepdims=True))      # [1, Stot]
            chunkT = jnp.concatenate(rows, axis=0)       # [c_row, Stot]
            ccol = jnp.sum((chunkT > 0.0).astype(dt), axis=0,
                           keepdims=True)                # [1, Stot]
            if s8 != stot:
                chunkT = jnp.concatenate(
                    [chunkT, jnp.zeros((c_row, s8 - stot), dt)], axis=1)
                ccol = jnp.concatenate(
                    [ccol, jnp.zeros((1, s8 - stot), dt)], axis=1)
            chunks.append(chunkT)
            ccols.append(ccol)

    lane_s8 = jax.lax.broadcasted_iota(jnp.int32, (1, s8), 1)

    def store_blk(s, tiles):
        # 8 columns per step and ALL 4*rb chains per iteration.  Lanes
        # 0..7 are STATIC slices, then one 8-lane rotate per tile
        # (Mosaic has no dynamic-lane indexing).
        # EVERY column's store offset comes from its own independent
        # masked prefix reduce over the per-column counts — no carried
        # offset chain at all (r5 burst: carried-within-tile 35.5 ms vs
        # independent 29.3 ms on the events kernel; the stores are ~60%
        # of phase 1).  Stores stay UNCONDITIONAL: an empty column writes
        # c_row infs at `off` without advancing it — the next nonempty
        # column overwrites them (predicating them under pl.when was
        # measured ~4x slower for the whole kernel, r5 burst 3).
        # NOTE: a prefix-scan + dynamic-roll block compaction (one slab
        # store per 8 columns) was tried and is ~40% SLOWER — 8 dynamic
        # sublane rotations cost more than 8 small stores — and needs
        # per-column overflow clamps the dense chain gets for free.
        new_tiles = []
        for t in range(nch):
            tile = tiles[t]
            for j in range(8):
                col = tile[:, j:j + 1]
                off = jnp.sum(
                    jnp.where(lane_s8 < 8 * s + j, ccols[t], 0.0),
                    dtype=dt).astype(jnp.int32)
                o = jnp.minimum(off, e_cap - c_row)
                colbuf[pl.ds(o, c_row), t:t + 1] = jnp.where(
                    col > 0.0, col, jnp.inf)
            new_tiles.append(pltpu.roll(tile, s8 - 8, axis=1))
        return tuple(new_tiles)

    jax.lax.fori_loop(0, s8 // 8, store_blk, tuple(chunks))
    for t in range(nch):
        cnt_smem[t] = jnp.sum(ccols[t], dtype=dt).astype(jnp.int32)

    # ---- phase 2: locations/intervals + merge-sweep interpolation ----
    out_ref[...] = jnp.zeros((rb, 8, f_pad), dt)
    usables = [
        ((cnt_smem[4 * r] - 1 > 2) & (cnt_smem[4 * r + 1] - 1 > 2)
         & (cnt_smem[4 * r + 2] - 1 > 2) & (cnt_smem[4 * r + 3] - 1 > 2))
        for r in range(rb)]

    FW = 128 * ft                                    # frames per tile
    laneFW = jax.lax.broadcasted_iota(jnp.int32, (1, FW), 1)
    wext = win + 8
    subw = jax.lax.broadcasted_iota(jnp.int32, (wext, 1), 0)

    n_locs = [jnp.minimum(cnt_smem[t] - 1, e_cap - 8) for t in range(nch)]
    seg_his = [jnp.maximum(n_locs[t] - 1, 1) for t in range(nch)]

    def frame_tile(fti, jbs):
        # ONE window read per chain covers both the frame-count compare and
        # the interpolation select: nle = jb + count gives d in
        # [jb-1, jb+win-1] (count >= 0, and jb is clamped to n_loc-2 so
        # the seg_hi clip can never push d below jb-1), so a window based
        # 8 below jb spans every selected row — a second dmin-based
        # read would be redundant.  All 4*rb chains run in one loop body
        # (separate per-type loops were ~1.5x slower), and each band's
        # four contributions land in ONE output write per tile.
        fgrid = (FW * fti + laneFW).astype(dt)
        vals_sums = [jnp.zeros((1, FW), dt) for _ in range(rb)]
        # window prep (locations / intervals / slopes / frame starts) for
        # ALL chains jointly on [wext, nch] tiles instead of nch separate
        # 1-lane arrays (1/128 lane utilization was ~40% of the sweep):
        # copy each chain's window into the shared scratch, then one
        # vectorized prep pass; chains read back static lane slices.
        jb0s = [jnp.clip(jbs[t] - 8, 0, e_cap - wext - 8)
                for t in range(nch)]
        for t in range(nch):
            wbuf[:, t:t + 1] = colbuf[pl.ds(jb0s[t], wext + 8), t:t + 1]
        colw_a = wbuf[...]                                  # [wext+8, nch]
        locw_a = (colw_a[:wext + 1] + colw_a[1:wext + 2]) / 2.0 / fs_a
        itvw_a = fs_a / (colw_a[1:wext + 2] - colw_a[:wext + 1])
        # interpolation as per-SEGMENT-row slope (3 masked sums instead
        # of 4): vals = y0 + (t - x0) * s with s precomputed per row,
        # anchored at the selected row's own x0 (no cancellation even for
        # pathological slopes).  Rows at/after the last location have
        # inf/NaN slope -> sanitized (never selected by oh).
        slope_a = (itvw_a[1:wext + 1] - itvw_a[:wext]) \
            / (locw_a[1:wext + 1] - locw_a[:wext])
        slope_a = jnp.where(jnp.isfinite(slope_a), slope_a, 0.0)
        y0r_a = jnp.where(jnp.isfinite(itvw_a[:wext]), itvw_a[:wext], 0.0)
        x0s_a = jnp.where(jnp.isfinite(locw_a[:wext]), locw_a[:wext], 0.0)
        ffw_a = jnp.ceil(locw_a[:wext] * grid_hz)

        new_jbs = []
        for t in range(nch):
            jb = jbs[t]
            jb0 = jb0s[t]
            off = jb - jb0                                  # 0 or 8
            slope = slope_a[:, t:t + 1]
            y0r = y0r_a[:, t:t + 1]
            x0s = x0s_a[:, t:t + 1]
            ffw = ffw_a[:, t:t + 1]
            # count + one-hot selection (an interval-cover "paint"
            # formulation that drops the count reduce was measured ~14%
            # SLOWER on device, r5 burst 1 — deleted)
            in_cmp = (subw >= off) & (subw < off + win)
            cmp = in_cmp & (ffw <= fgrid)                   # [wext, FW]
            nle = jb + jnp.sum(cmp.astype(jnp.int32), axis=0,
                               keepdims=True,
                               dtype=jnp.int32)             # [1, FW]
            d = jnp.clip(nle, 1, seg_his[t]) - 1
            oh = (subw + jb0) == d                          # [wext, FW]
            A = jnp.sum(jnp.where(oh, y0r, 0.0), axis=0, keepdims=True)
            X = jnp.sum(jnp.where(oh, x0s, 0.0), axis=0, keepdims=True)
            B = jnp.sum(jnp.where(oh, slope, 0.0), axis=0,
                        keepdims=True)
            vals_sums[t // 4] = (vals_sums[t // 4]
                                 + (A + (fgrid / grid_hz - X) * B))
            # advance the window base
            adv = jnp.sum(cmp[:, FW - 1:FW].astype(jnp.int32),
                          dtype=jnp.int32)
            jbn = jnp.maximum(jb + adv - 8, 0)
            jbn = jnp.minimum(jbn, jnp.maximum(n_locs[t] - 2, 0))
            jbn = jnp.minimum((jbn // 8) * 8, e_cap - win - 8)
            new_jbs.append(jnp.maximum(jbn, 0))
        fo = pl.multiple_of(FW * fti, 128)
        for r in range(rb):
            out_ref[r, 0:1, pl.ds(fo, FW)] = vals_sums[r]
        return tuple(new_jbs)

    jax.lax.fori_loop(0, n_frames_tiles, frame_tile,
                      tuple(jnp.int32(0) for _ in range(nch)))

    for r in range(rb):
        res = out_ref[r, 0:1, :] / 4.0
        out_ref[r, 0:1, :] = jnp.where(usables[r], res, 0.0)


def _zc_group_call(filt_T, *, y_length, stot, f_pad, e_cap, c_row, win,
                   fs_a, interpret, rb=2, grid_hz=1000.0, ft=1, cs=128):
    nb = filt_T.shape[0]
    nbp = _round_up(nb, rb)
    if nbp != nb:
        # all-zero pad bands produce zero contours (usable=False) and are
        # sliced off by the caller
        filt_T = jnp.pad(filt_T, ((0, nbp - nb), (0, 0), (0, 0)))
    f_pad = _round_up(f_pad, 128 * ft)   # group-local tile-width multiple
    n_tiles = f_pad // (128 * ft)
    kern = functools.partial(
        _zc_group_kernel, y_length=y_length, stot=stot, f_pad=f_pad,
        e_cap=e_cap, c_row=c_row, win=win, fs_a=fs_a,
        n_frames_tiles=n_tiles, rb=rb, grid_hz=grid_hz, ft=ft, cs=cs)
    out = pl.pallas_call(
        kern,
        grid=(nbp // rb,),
        in_specs=[pl.BlockSpec((rb, cs, stot), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rb, 8, f_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbp, 8, f_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((e_cap, 4 * rb), jnp.float32),
            pltpu.VMEM((win + 16, 4 * rb), jnp.float32),
            pltpu.SMEM((4 * rb,), jnp.int32),
        ],
        interpret=interpret,
    )(filt_T)
    return out[:nb]


def _zc_events_kernel(filt_ref, ev_ref, ccol_ref, *,
                      y_length, stot, e_cap, c_row, rb, mode="full"):
    """Phase-1-only variant: compacted event buffers + per-column counts,
    NO in-kernel merge-sweep.  Measurement hook for tools/zc_ab.py (wall
    attribution between compaction and sweep; `mode` selects further
    ablations: "nostore" drops the store loop, "noklop" replaces the
    k-loop compaction with a wrong-but-shaped slice, "indep" computes
    every column's store offset independently).

    ev_ref [rb, e_cap, 8]: lanes 0..3 = the four event types' sorted fines
    (inf-filled); ccol_ref [rb, 8, s_pad]: rows 0..3 = events per
    128-sample column."""
    dt = jnp.float32
    sub = jax.lax.broadcasted_iota(jnp.int32, (128, stot), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (128, stot), 1)
    gi = sub + 128 * lane
    tri = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
           >= jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
           ).astype(dt)

    ev_ref[...] = jnp.full_like(ev_ref, jnp.inf)
    s8 = _round_up_static(stot, 8)
    s_pad = ccol_ref.shape[2]
    chunks = []
    ccols = []
    for r in range(rb):
        sT = filt_ref[r]
        top = sT[0:1, :]
        top_next = jnp.concatenate(
            [top[:, 1:], jnp.zeros((1, 1), dt)], axis=1)
        snx = jnp.concatenate([sT[1:, :], top_next], axis=0)
        g = snx - sT
        gtop = g[0:1, :]
        gtop_next = jnp.concatenate(
            [gtop[:, 1:], jnp.zeros((1, 1), dt)], axis=1)
        gnx = jnp.concatenate([g[1:, :], gtop_next], axis=0)
        types = ((sT, snx, y_length), (-sT, -snx, y_length),
                 (g, gnx, y_length - 1), (-g, -gnx, y_length - 1))
        for t, (sig, signx, n_eff) in enumerate(types):
            mask = (sig > 0.0) & (signx <= 0.0) & (gi < n_eff - 1)
            fine = (gi + 1).astype(dt) - sig / (signx - sig)
            mf = mask.astype(dt)
            lrank = jnp.dot(tri, mf, preferred_element_type=dt,
                            precision=jax.lax.Precision.HIGHEST) - 1.0
            if mode == "noklop":
                # attribution mode (tools/zc_ab.py): k-loop replaced by a
                # static slice — WRONG results, isolates compaction cost
                chunkT = jnp.where(mask[:c_row], fine[:c_row], 0.0)
            else:
                rows = []
                for k in range(c_row):
                    sel = mask & (lrank == float(k))
                    rows.append(jnp.sum(jnp.where(sel, fine, 0.0), axis=0,
                                        keepdims=True))
                chunkT = jnp.concatenate(rows, axis=0)       # [c_row, stot]
            ccol = jnp.sum((chunkT > 0.0).astype(dt), axis=0,
                           keepdims=True)                    # [1, stot]
            ccol_ref[r, t:t + 1, :] = jnp.concatenate(
                [ccol, jnp.zeros((1, s_pad - stot), dt)], axis=1)
            if s8 != stot:
                chunkT = jnp.concatenate(
                    [chunkT, jnp.zeros((c_row, s8 - stot), dt)], axis=1)
            chunks.append(chunkT)
            ccols.append(jnp.concatenate(
                [ccol, jnp.zeros((1, s8 - stot), dt)], axis=1))

    lane_s8 = jax.lax.broadcasted_iota(jnp.int32, (1, s8), 1)

    if mode == "nostore":
        # attribution mode: no compacted buffer at all (ev stays inf)
        return

    def store_blk(s, tiles):
        # NO carried offset chain: each tile's store offsets are seeded by
        # an independent masked prefix reduce over the per-column counts
        # (events in columns < 8s), so the serial dependence depth drops
        # from s8 (~176 columns) to the 8 columns within one tile — tiles
        # overlap in the scheduler.  Ordering of the overlapping
        # inf-padding writes is preserved by program order.
        new_tiles = []
        for c in range(4 * rb):
            tile = tiles[c]
            r, t = divmod(c, 4)
            if mode == "indep":
                # every column's offset from its own masked reduce: all 8
                # stores fully independent (no intra-tile serial chain)
                for j in range(8):
                    col = tile[:, j:j + 1]
                    off = jnp.sum(
                        jnp.where(lane_s8 < 8 * s + j, ccols[c], 0.0),
                        dtype=dt).astype(jnp.int32)
                    o = jnp.minimum(off, e_cap - c_row)
                    ev_ref[r, pl.ds(o, c_row), t:t + 1] = jnp.where(
                        col > 0.0, col, jnp.inf)
            else:
                off = jnp.sum(jnp.where(lane_s8 < 8 * s, ccols[c], 0.0),
                              dtype=dt).astype(jnp.int32)
                for j in range(8):
                    col = tile[:, j:j + 1]
                    rc = jnp.sum((col > 0.0).astype(jnp.int32),
                                 dtype=jnp.int32)
                    o = jnp.minimum(off, e_cap - c_row)
                    ev_ref[r, pl.ds(o, c_row), t:t + 1] = jnp.where(
                        col > 0.0, col, jnp.inf)
                    off = off + rc
            new_tiles.append(pltpu.roll(tile, s8 - 8, axis=1))
        return tuple(new_tiles)

    jax.lax.fori_loop(0, s8 // 8, store_blk, tuple(chunks))


def _zc_events_call(filt_T, *, y_length, stot, e_cap, c_row, interpret,
                    rb=2, mode="full"):
    nb = filt_T.shape[0]
    nbp = _round_up(nb, rb)
    if nbp != nb:
        filt_T = jnp.pad(filt_T, ((0, nbp - nb), (0, 0), (0, 0)))
    s_pad = _round_up(stot, 128)
    kern = functools.partial(
        _zc_events_kernel, y_length=y_length, stot=stot, e_cap=e_cap,
        c_row=c_row, rb=rb, mode=mode)
    ev, ccol = pl.pallas_call(
        kern,
        grid=(nbp // rb,),
        in_specs=[pl.BlockSpec((rb, 128, stot), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((rb, e_cap, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 8, s_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nbp, e_cap, 8), jnp.float32),
            jax.ShapeDtypeStruct((nbp, 8, s_pad), jnp.float32),
        ],
        interpret=interpret,
    )(filt_T)
    return ev[:nb], ccol[:nb]


#: A/B knobs (tools/zc_ab.py): bands fused per grid cell and band-group
#: count.  Values come validated from the central registry (worldtpu.flags)
#: at import time; the per-call rb=/groups= parameters override them.
_RB = FLAGS.zc_rb
_NGROUPS = FLAGS.zc_groups
#: samples per phase-1 compaction column (per-call override cs=)
_CS = 128


def capacity_violations(filt, geo, *, groups=None):
    """Count violations of the zc kernel's crossing-rate capacity model
    for THIS signal: [3] int32 = (event-buffer overflows, per-column
    overflows, sweep-window overruns), all zero iff the kernel's static
    buffers hold every event losslessly.

    The kernel clamps silently when a pathological band signal (e.g. a
    chirp riding a band's upper edge) exceeds the 1.65x crossing-rate
    model — the analog of the reference's worst-case preallocation
    (/root/reference/src/harvest.cpp:85-98), which would overrun instead.
    This check is pure dense XLA over the same crossing masks the kernel
    compacts (cheap reductions, ~1% of the candidates stage), so callers
    can run it beside the kernel and raise instead of corrupting:
    harvest.zc_capacity_violations_batch / HarvestKernel.compute_batch
    (check_capacity=True), asserted zero in bench kernel-parity."""
    nb, y_len = filt.shape
    if groups is None:
        groups = make_groups(geo, n_groups=_NGROUPS)
    dt = jnp.float32
    s = filt.astype(dt)
    g = s[:, 1:] - s[:, :-1]

    stot = _round_up(y_len, 128) // 128
    grid_hz = 1000.0 / geo.grid_ms
    F = geo.f0_length
    f_pad = _round_up(F, 128)
    n_tiles = f_pad // 128
    fs_a = float(geo.actual_fs)
    # sample -> frame tile of its (ceil-rounded) grid frame; one-hot basis
    # so the per-tile event counts are an MXU matmul, not a scatter
    pos = np.arange(y_len - 1) + 1.0            # crossing between i, i+1
    tile_of = np.minimum((np.ceil(pos / fs_a * grid_hz) // 128),
                         n_tiles - 1).astype(np.int64)
    onehot = np.zeros((y_len - 1, n_tiles), np.float32)
    onehot[np.arange(y_len - 1), tile_of] = 1.0
    onehot_j = jnp.asarray(onehot)

    def type_masks(sig, n_eff):
        i = jnp.arange(sig.shape[1] - 1)
        m = (sig[:, :-1] > 0.0) & (sig[:, 1:] <= 0.0) & (i < n_eff - 1)
        return m.astype(dt)                     # [nb, L-1-ish]

    masks = [type_masks(s, y_len), type_masks(-s, y_len),
             type_masks(g, y_len - 1), type_masks(-g, y_len - 1)]
    masks = [jnp.pad(m, ((0, 0), (0, y_len - 1 - m.shape[1])))
             for m in masks]                    # align to [nb, y_len-1]
    mall = jnp.stack(masks, axis=1)             # [nb, 4, y_len-1]

    tot = jnp.sum(mall, axis=2)                 # [nb, 4]
    mp = jnp.pad(mall, ((0, 0), (0, 0), (0, stot * 128 - (y_len - 1))))
    colcnt = jnp.sum(mp.reshape(nb, 4, stot, 128), axis=3)  # [nb, 4, stot]
    tilecnt = jnp.dot(mall.reshape(nb * 4, -1), onehot_j,
                      precision=jax.lax.Precision.HIGHEST
                      ).reshape(nb, 4, n_tiles)

    ev_v = jnp.zeros((), jnp.int32)
    col_v = jnp.zeros((), jnp.int32)
    win_v = jnp.zeros((), jnp.int32)
    for gg in groups:
        t = tot[gg.lo:gg.hi]
        c = colcnt[gg.lo:gg.hi]
        w = tilecnt[gg.lo:gg.hi]
        ev_v += jnp.sum((t > gg.e_cap - gg.c_row).astype(jnp.int32))
        col_v += jnp.sum((c > gg.c_row).astype(jnp.int32))
        # the sweep guarantees coverage for <= win - 8 locations per
        # frame tile of ft*128 frames (the 8 is the carried base's
        # quantization lead); fold the per-128 counts to the group's tile
        ft = getattr(gg, "ft", 1)
        if ft > 1:
            n_t = w.shape[2]
            n_p = -(-n_t // ft) * ft
            w = jnp.pad(w, ((0, 0), (0, 0), (0, n_p - n_t)))
            w = jnp.sum(w.reshape(w.shape[0], 4, n_p // ft, ft), axis=3)
        win_v += jnp.sum((w > gg.win - 8).astype(jnp.int32))
    return jnp.stack([ev_v, col_v, win_v])


def band_candidates_pallas(filt, geo, *, bounds=None, groups=None,
                           interpret=False, rb=None, phase1_only=False,
                           p1_mode="full", cs=None):
    """Raw candidate contours [nb, F] from band-filtered signals [nb, L].

    Drop-in replacement for vmap(_band_candidates) over the filter bank
    output (production f32 path only).  bounds (array, default the full
    geo.boundary_f0) and groups (static, default make_groups(geo)) are
    overridable so a band-parallel shard can run its strided subset.
    phase1_only/p1_mode are measurement hooks (tools/zc_ab.py): run just
    the event-compaction kernel so its wall can be attributed separately
    from the merge-sweep (a dense-XLA sweep over the phase-1 buffers was
    measured 4x slower with quality drift and deleted, r4/r5 A/B)."""
    nb, y_len = filt.shape
    assert y_len == geo.y_length
    if rb is None:
        rb = _RB
    if cs is None:
        cs = _CS
    if groups is None:
        groups = make_groups(geo, n_groups=_NGROUPS)
    if bounds is None:
        bounds = jnp.asarray(geo.boundary_f0, jnp.float32)
    F = geo.f0_length
    f_pad = _round_up(F, 128)
    stot = _round_up(y_len, cs) // cs
    pad = stot * cs - y_len
    filt_p = jnp.pad(filt.astype(jnp.float32), ((0, 0), (0, pad)))
    # lane-major layout: sample i -> (sublane i%cs, lane i//cs)
    filt_T = filt_p.reshape(nb, stot, cs).transpose(0, 2, 1)
    if phase1_only:
        stot1 = _round_up(y_len, 128) // 128
        filt_T1 = jnp.pad(filt.astype(jnp.float32),
                          ((0, 0), (0, stot1 * 128 - y_len)))
        filt_T1 = filt_T1.reshape(nb, stot1, 128).transpose(0, 2, 1)

    outs = []
    for g in groups:
        if phase1_only:
            ev, ccol = _zc_events_call(
                filt_T1[g.lo:g.hi], y_length=y_len, stot=stot1,
                e_cap=g.e_cap, c_row=g.c_row, interpret=interpret, rb=rb,
                mode=p1_mode)
            # cheap reduce keeps XLA from eliding the kernel
            outs.append(jnp.broadcast_to(
                jnp.sum(jnp.where(jnp.isfinite(ev), ev, 0.0),
                        axis=(1, 2))[:, None]
                + jnp.sum(ccol, axis=(1, 2))[:, None],
                (g.hi - g.lo, F)))
            continue
        raw = _zc_group_call(
            filt_T[g.lo:g.hi], y_length=y_len, stot=stot, f_pad=f_pad,
            e_cap=g.e_cap, c_row=g.c_row * (cs // 128), win=g.win,
            fs_a=float(geo.actual_fs), interpret=interpret, rb=rb,
            grid_hz=1000.0 / geo.grid_ms, ft=getattr(g, "ft", 1), cs=cs)
        outs.append(raw[:, 0, :F])
    cand = jnp.concatenate(outs, axis=0)                 # [nb, F] means

    b = bounds[:, None]
    ok = ((cand <= b * 1.1) & (cand >= b * 0.9)
          & (cand <= geo.f0_ceil) & (cand >= geo.f0_floor))
    return jnp.where(ok, cand, 0.0)
