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
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _flat_shift(xp, s):
    """Shift a [R, 128] flat-major tile right by static s in [1, 128)."""
    rolled = pltpu.roll(xp, s, axis=1)
    down = jnp.concatenate(
        [jnp.zeros((1, 128), xp.dtype), rolled[:-1, :]], axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, xp.shape, 1)
    return jnp.where(lane < s, down, rolled)


def _ola_kernel(starts_ref, resp_ref, out_ref, *, n_pulses, s_rows, rows):
    out_ref[...] = jnp.zeros((rows, 128), jnp.float32)

    def body(p, _):
        st = starts_ref[0, p]
        row0 = st // 128
        r = st % 128
        x = resp_ref[p]                                  # [S, 128]
        xp = jnp.concatenate(
            [x, jnp.zeros((1, 128), jnp.float32)], axis=0)
        for b in (64, 32, 16, 8, 4, 2, 1):
            xp = jnp.where((r & b) != 0, _flat_shift(xp, b), xp)
        acc = out_ref[pl.ds(row0, s_rows + 1), :]
        out_ref[pl.ds(row0, s_rows + 1), :] = acc + xp
        return 0

    jax.lax.fori_loop(0, n_pulses, body, 0)


def overlap_add(resp, starts, out_length, *, interpret=False):
    """Overlap-add responses [P, fft] at sample offsets starts [P].

    Equivalent to scattering resp[p] into out[starts[p] : starts[p]+fft]
    with out-of-range samples discarded (starts may be negative down to
    -(fft-1)).  float32 only (the f64 parity path keeps the jnp scatter).
    """
    P, fft = resp.shape
    assert fft % 128 == 0, fft
    s_rows = fft // 128
    pad_lo = fft
    total = _round_up(pad_lo + out_length + fft + 256, 128)
    rows = total // 128

    kern = functools.partial(
        _ola_kernel, n_pulses=P, s_rows=s_rows, rows=rows)
    out = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        interpret=interpret,
    )(starts.astype(jnp.int32)[None, :] + pad_lo,
      resp.reshape(P, s_rows, 128))
    return out.reshape(-1)[pad_lo:pad_lo + out_length]
