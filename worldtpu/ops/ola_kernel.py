"""Pallas TPU kernel: overlap-add of pulse impulse responses.

Replaces the synthesis scatter-add (reference overlap-add,
/root/reference/src/synthesis.cpp:118-169; jnp formulation
worldtpu/synthesis/synthesis.py) — XLA lowers a duplicate-index scatter-add
of max_pulses*fft_size updates through a sort; here the output stays
resident in VMEM and each pulse's response is added at its (dynamic) start
offset as one vector read-modify-write.

Layout: the output is a [rows, 128] lane-major view of the padded waveform
(sample i at (i // 128, i % 128)).  A response row [fft] is reshaped to
[S, 128], zero-extended by one row, then shifted to an arbitrary flat
offset r in [0, 128) by 7 static conditional flat-shifts (lane roll + row
carry), and added into out[row0 : row0+S+1].  Pulses are processed
sequentially (the accumulation is associative; f32 ordering differs from
the scatter, which is itself unordered).

Scaling: the kernel runs on a (batch, pulse-tile) grid.  Each grid step
holds one utterance's output plus one tile of responses in VMEM, so scoped
VMEM is O(out + tile) regardless of batch size or pulse count (a
whole-batch, whole-pulse-axis VMEM residency OOMs at ~18 MB for B=32).
vmap dispatches into the same grid via a custom_vmap rule instead of
adding a mapped dimension to every block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PULSE_TILE = 256


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _flat_shift(xp, s):
    """Shift a [R, 128] flat-major tile right by static s in [1, 128)."""
    rolled = pltpu.roll(xp, s, axis=1)
    down = jnp.concatenate(
        [jnp.zeros((1, 128), xp.dtype), rolled[:-1, :]], axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, xp.shape, 1)
    return jnp.where(lane < s, down, rolled)


def _ola_kernel(starts_ref, resp_ref, out_ref, *, tile, s_rows, rows):
    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros((1, rows, 128), jnp.float32)

    b = pl.program_id(0)
    t = pl.program_id(1)

    def body(p, _):
        st = starts_ref[b, t * tile + p]
        row0 = st // 128
        r = st % 128
        x = resp_ref[0, p]                               # [S, 128]
        xp = jnp.concatenate(
            [x, jnp.zeros((1, 128), jnp.float32)], axis=0)
        for bit in (64, 32, 16, 8, 4, 2, 1):
            xp = jnp.where((r & bit) != 0, _flat_shift(xp, bit), xp)
        acc = out_ref[0, pl.ds(row0, s_rows + 1), :]
        out_ref[0, pl.ds(row0, s_rows + 1), :] = acc + xp
        return 0

    jax.lax.fori_loop(0, tile, body, 0)


_BATCH_CHUNK = 8  # starts live unblocked in SMEM: bound its footprint


def _overlap_add_chunk(resp, starts, out_length, interpret):
    """[Bc, P, fft] responses at [Bc, P] offsets -> [Bc, out_length]."""
    Bc, P, fft = resp.shape
    assert fft % 128 == 0, fft
    s_rows = fft // 128
    pad_lo = fft
    total = _round_up(pad_lo + out_length + fft + 256, 128)
    rows = total // 128

    tile = min(_PULSE_TILE, P)
    padP = _round_up(P, tile)
    if padP != P:
        # padded pulses: zero response at offset 0 — adds nothing
        resp = jnp.pad(resp, ((0, 0), (0, padP - P), (0, 0)))
        starts = jnp.pad(starts, ((0, 0), (0, padP - P)),
                         constant_values=-pad_lo)
    nt = padP // tile

    kern = functools.partial(
        _ola_kernel, tile=tile, s_rows=s_rows, rows=rows)
    out = pl.pallas_call(
        kern,
        grid=(Bc, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # starts, full [Bc,padP]
            pl.BlockSpec((1, tile, s_rows, 128), lambda b, t: (b, t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, 128), lambda b, t: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bc, rows, 128), jnp.float32),
        interpret=interpret,
    )(starts.astype(jnp.int32) + pad_lo,
      resp.reshape(Bc, padP, s_rows, 128))
    return out.reshape(Bc, -1)[:, pad_lo:pad_lo + out_length]


def _overlap_add_batch(resp, starts, out_length, interpret):
    """[B, P, fft] responses at [B, P] offsets -> [B, out_length].

    The batch is processed in chunks of _BATCH_CHUNK utterances so the SMEM
    starts array and the per-step VMEM residency stay bounded for any B."""
    B = resp.shape[0]
    if B <= _BATCH_CHUNK:
        return _overlap_add_chunk(resp, starts, out_length, interpret)
    padB = _round_up(B, _BATCH_CHUNK)
    if padB != B:
        resp = jnp.pad(resp, ((0, padB - B), (0, 0), (0, 0)))
        starts = jnp.pad(starts, ((0, padB - B), (0, 0)))
    G = padB // _BATCH_CHUNK
    rg = resp.reshape((G, _BATCH_CHUNK) + resp.shape[1:])
    sg = starts.reshape(G, _BATCH_CHUNK, -1)
    out = jax.lax.map(
        lambda rs: _overlap_add_chunk(rs[0], rs[1], out_length, interpret),
        (rg, sg))
    return out.reshape(padB, -1)[:B]


@functools.lru_cache(maxsize=None)
def _make_overlap_add(out_length, interpret):
    @jax.custom_batching.custom_vmap
    def f(resp, starts):
        return _overlap_add_batch(
            resp[None], starts[None], out_length, interpret)[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, resp, starts):
        if not in_batched[0]:
            resp = jnp.broadcast_to(resp, (axis_size,) + resp.shape)
        if not in_batched[1]:
            starts = jnp.broadcast_to(starts, (axis_size,) + starts.shape)
        return (_overlap_add_batch(resp, starts, out_length, interpret),
                True)

    return f


def overlap_add(resp, starts, out_length, *, interpret=False):
    """Overlap-add responses [P, fft] at sample offsets starts [P].

    Equivalent to scattering resp[p] into out[starts[p] : starts[p]+fft]
    with out-of-range samples discarded (starts may be negative down to
    -(fft-1)).  float32 only (the f64 parity path keeps the jnp scatter).
    Batches via vmap dispatch into a (batch, pulse-tile) Pallas grid.
    """
    return _make_overlap_add(int(out_length), bool(interpret))(resp, starts)
