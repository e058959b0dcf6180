"""Pallas TPU kernel: the sequential extendF0 walk of the contour chain.

Reference extendF0/selectBestF0 (/root/reference/src/harvest.cpp:347-403):
each voiced section walks outward frame by frame, accepting the nearest
candidate within ``allowed_range`` of a RUNNING reference F0 (updated on
every accept) and stopping after ``miss_lim`` consecutive misses or
``ext_lim`` frames.  Genuinely sequential per section.

The XLA while_loop formulation costs ~0.17 ms per STEP on device even with
an empty body (r5 bisect: stubbing the gather, the select, and the writes
out of the loop left 16.8 of 19.7 ms) — the loop machinery is the floor,
so the walk runs here as an in-kernel fori_loop at ~µs/step instead.

Key structural fact that makes this cheap: the walk's visited rows are a
DETERMINISTIC linear sequence j(i) = origin + shift*(i+1) — no data
dependence — so the caller gathers the full [steps, walks, 256] candidate/
score slab in parallel OUTSIDE the kernel (one contiguous row slice per
(walk, step)), the kernel runs the tiny sequential accept logic over it,
and accepted values land back as CONTIGUOUS per-walk column spans (accept
steps form a prefix of the walk; fwd/bwd spans are consecutive frames).

Layout: walks on sublanes ([W, 128] tiles), candidate slots on lanes
(S <= 128; the score tile rides lanes 128..255 of the same slab row).
Per step: one [W, 256] row read, a lane-min + LAST-slot select (exact
selectBestF0 semantics incl. the last-equal-error tie-break), [W, 1]
state updates, and a one-hot lane write into the [W, E_pad] results
carried through the loop; one store at the end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _walk_kernel(slab_ref, aux_ref, val_ref, sc_ref, meta_ref, *,
                 n_steps, step_off, W, e_pad, allowed_range, miss_lim):
    """Transposed layout: walks on LANES ([*, W] tiles), candidate slots
    on SUBLANES — per-step reductions become sublane reduces and every
    carried scalar-per-walk is a single [1, W] vreg row (a walks-on-
    sublanes variant with lane reductions measured ~25 ms/batch).

    ``step_off``: global index of this call's first step — the walk runs
    as a CHAIN of step-chunk calls (one call's slab would exceed the
    scoped-VMEM limit), with the per-walk state threaded through aux rows
    3..5 and handed back in meta."""
    f32 = jnp.float32
    sub = jax.lax.broadcasted_iota(jnp.int32, (128, W), 0)
    sub_e = jax.lax.broadcasted_iota(jnp.int32, (e_pad, W), 0)

    tmp = aux_ref[0:1, :]                            # [1, W]
    livec = aux_ref[1:2, :]                          # 0/1
    distc = aux_ref[2:3, :]                          # float, exact ints

    def step(i, carry):
        tmp, cnt, stopped, last_acc, vals, scs = carry
        fi = (i + step_off).astype(f32)
        on = (livec > 0.5) & (fi <= distc) & (stopped < 0.5)  # [1, W]
        row = slab_ref[i]                            # [256, W]
        cand = row[:128, :]
        scor = row[128:256, :]
        ref = jnp.where(tmp > 0.0, tmp, 1.0)         # [1, W]
        err = jnp.abs(ref - cand) / ref              # [128, W]
        m = jnp.min(err, axis=0, keepdims=True)      # [1, W]
        match = err == m
        # LAST slot achieving the min (reference tie-break; pad slots are
        # zero-candidate/zero-score, which select_best semantics absorb)
        li = jnp.max(jnp.where(match, sub, -1), axis=0, keepdims=True)
        oh = sub == li
        val = jnp.sum(jnp.where(oh, cand, 0.0), axis=0, keepdims=True)
        val = jnp.where(on & (m <= allowed_range), val, 0.0)
        # score of the accepted VALUE: max score over slots equal to it
        # (misses pick the zero-candidate slots' max score, matching the
        # searchScore shadow channels)
        m2 = cand == val
        sc = jnp.max(jnp.where(m2, scor, -jnp.inf), axis=0, keepdims=True)
        has = jnp.max(jnp.where(m2, 1.0, 0.0), axis=0, keepdims=True)
        sc = jnp.where(has > 0.5, sc, 0.0)

        zero = val == 0.0
        cnt = jnp.where(on, jnp.where(zero, cnt + 1.0, 0.0), cnt)
        tmp = jnp.where(on & ~zero, val, tmp)
        last_acc = jnp.where(on & ~zero, fi, last_acc)
        stopped = jnp.where(stopped + (on & (cnt == miss_lim)) > 0.5,
                            jnp.float32(1.0), jnp.float32(0.0))

        hit = (sub_e == i) & on                      # [e_pad, W]
        vals = jnp.where(hit, val, vals)
        scs = jnp.where(hit, sc, scs)
        return tmp, cnt, stopped, last_acc, vals, scs

    init = (tmp[...], aux_ref[3:4, :], aux_ref[4:5, :], aux_ref[5:6, :],
            jnp.zeros((e_pad, W), f32), jnp.zeros((e_pad, W), f32))
    tmp, cnt, stopped, last_acc, vals, scs = jax.lax.fori_loop(
        0, n_steps, step, init)
    val_ref[...] = vals
    sc_ref[...] = scs
    meta_ref[...] = (last_acc * (sub[:8] == 0) + cnt * (sub[:8] == 1)
                     + stopped * (sub[:8] == 2) + tmp * (sub[:8] == 3))


def extend_walk(packed, origin, shift, live, distance, tmp0, *,
                ext_lim, miss_lim, allowed_range, interpret=False):
    """Run the extend walks over a packed [F, 256] candidate/score table.

    Args:
        packed: [F, 256] — lanes 0..S-1 candidate values, 128..128+S-1
            their scores, zero-padded elsewhere (S <= 128).
        origin: [W] int32 walk origins (walks visit origin+shift*(i+1)).
        shift: [W] int32 +-1 direction.
        live: [W] bool.
        distance: [W] int32 >= 0 last in-range step index (ON requires
            i <= distance; all ON rows stay within [1, F-2]).
        tmp0: [W] float32 starting reference F0.

    Returns:
        (vals [W, E_pad], scs [W, E_pad], n_on [W] int32, so [W] int32):
        step-indexed accepted values/scores (exactly the walk's writes for
        steps < n_on; the ON steps form a prefix), the write-prefix
        length, and the last accepted position (or origin).
    """
    F = packed.shape[0]
    W = origin.shape[0]
    n_steps = ext_lim + 1
    e_pad = _round_up(n_steps, 128)

    # deterministic CONSECUTIVE row schedule -> ONE contiguous [P, 256]
    # block slice per walk (a per-(walk, step) row gather was ~20 ms on
    # device; 128 block descriptors are ~free).  Out-of-range rows only
    # occur on OFF steps, so the zero padding is never consumed.
    P = n_steps
    padded = jnp.pad(packed, ((P + 1, P + 1), (0, 0)))
    start = jnp.where(shift > 0, origin + P + 2, origin + 1)
    blocks = jax.vmap(
        lambda s: jax.lax.dynamic_slice(padded, (s, 0), (P, 256)))(
            jnp.clip(start, 0, padded.shape[0] - P))   # [W, P, 256]
    slab = jnp.where((shift > 0)[:, None, None], blocks,
                     blocks[:, ::-1, :])
    slab = jnp.transpose(slab, (1, 2, 0))              # [n_steps, 256, W]

    # chunk the STEP axis so one call's double-buffered slab block stays
    # under the ~16 MB scoped-VMEM limit (at W=128, ext_lim=100 the slab
    # is ~13 MB; splitting the lane axis doesn't help — Mosaic pads lanes
    # back to 128).  Walk state threads through aux -> meta between calls.
    budget_steps = max(8, (10 * 2 ** 20) // (2 * 256 * W * 4))
    n_chunks = -(-n_steps // budget_steps)
    chunk = -(-n_steps // n_chunks)

    state = (tmp0.astype(jnp.float32), live.astype(jnp.float32),
             distance.astype(jnp.float32), jnp.zeros((W,), jnp.float32),
             jnp.zeros((W,), jnp.float32), jnp.full((W,), -1.0,
                                                    jnp.float32))
    v_parts, s_parts = [], []
    meta = None
    for ci in range(n_chunks):
        lo = ci * chunk
        hi = min(n_steps, lo + chunk)
        csteps = hi - lo
        cpad = _round_up(csteps, 8)
        aux = jnp.stack([state[0], state[1], state[2], state[3],
                         state[4], state[5],
                         jnp.zeros((W,), jnp.float32),
                         jnp.zeros((W,), jnp.float32)], axis=0)  # [8, W]
        kern = functools.partial(
            _walk_kernel, n_steps=csteps, step_off=lo, W=W, e_pad=cpad,
            allowed_range=float(allowed_range), miss_lim=int(miss_lim))
        vv, ss_, meta = pl.pallas_call(
            kern,
            out_shape=[
                jax.ShapeDtypeStruct((cpad, W), jnp.float32),
                jax.ShapeDtypeStruct((cpad, W), jnp.float32),
                jax.ShapeDtypeStruct((8, W), jnp.float32),
            ],
            interpret=interpret,
        )(slab[lo:hi], aux)
        v_parts.append(vv[:csteps])
        s_parts.append(ss_[:csteps])
        state = (meta[3, :], state[1], state[2], meta[1, :],
                 meta[2, :], meta[0, :])
    vals_t = jnp.concatenate(v_parts, axis=0)          # [n_steps, W]
    scs_t = jnp.concatenate(s_parts, axis=0)
    vals = jnp.pad(jnp.transpose(vals_t),
                   ((0, 0), (0, e_pad - n_steps)))     # [W, e_pad]
    scs = jnp.pad(jnp.transpose(scs_t), ((0, 0), (0, e_pad - n_steps)))

    last_acc = meta[0, :].astype(jnp.int32)
    cnt = meta[1, :].astype(jnp.int32)
    stopped = meta[2, :] > 0.5
    # ON steps form a prefix: a stopped walk's last ON step is the one
    # where cnt hit miss_lim — last_acc + miss_lim (accepts reset cnt);
    # an unstopped walk ran min(distance + 1, n_steps) ON steps
    n_full = jnp.minimum(distance + 1, n_steps)
    n_on = jnp.where(stopped, last_acc + cnt + 1, n_full)
    n_on = jnp.where(live, jnp.maximum(n_on, 0), 0)
    so = jnp.where(live & (last_acc >= 0),
                   origin + shift * (last_acc + 1), origin)
    return vals, scs, n_on, so
