"""Long-audio Harvest: overlap-save chunking of the F0 pipeline.

The single-utterance Harvest geometry is static in x_length: band filtering
materializes [n_bands, y_length] and the refine stage [F, S, W] — a 10-minute
utterance would blow both memory and compile time (SURVEY.md §5
long-context row; the reference instead preallocates O(T) buffers,
/root/reference/src/harvest.cpp:85-98, and pays one whole-signal FFT
:1401-1409).

Here the signal is cut into fixed-size chunks with a halo on each side and
every chunk runs the standard device stages (decimate -> band candidates ->
refine -> prune) as ONE batched dispatch with ONE compiled geometry; the
per-frame candidate/score rows are stitched at chunk boundaries and the
host contour fixing runs once over the full utterance.  Every stage has
finite temporal support:

  - decimation: zero-phase order-2 IIR, decays geometrically (halo >> decay)
  - band filtering: FIR taps <= 2*max_filter_half (halo >> taps)
  - zero-crossing interval interpolation: needs events bracketing each kept
    frame; interval lengths <= 1/f0_floor s
  - refinement windows: <= 3/f0_floor s around each kept frame
  - remove_unreliable: +-1 frame

so a halo of ~1 s reproduces interior frames to f32 noise (the halo's
decimation/filter edge effects never reach a kept frame).

Chunk boundaries sit on a grid where both the sample index and the
decimation grid align (u ms with fs*u/1000 an integer divisible by the
decimation ratio), so each chunk's decimated samples coincide with the
whole-signal decimation away from edges.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from worldtpu import constants as C
from worldtpu.analysis import contour
from worldtpu.analysis.harvest import (
    HarvestKernel, harvest_device_stages_batch, _matlab_round_np)


def _grid_unit_ms(fs, ratio):
    """Smallest unit u (ms) such that u ms is an integer sample count
    divisible by the decimation ratio."""
    for u in (1, 2, 4, 5, 8, 10, 20, 25, 40, 50, 100, 125, 200, 250, 500,
              1000):
        s = fs * u
        if s % 1000 == 0 and (s // 1000) % ratio == 0:
            return u
    raise ValueError(f"no chunk grid for fs={fs}, ratio={ratio}")


class LongHarvest:
    """Chunked Harvest for arbitrarily long single utterances.

    One compiled geometry (chunk_ms + 2*halo_ms of audio) serves any input
    length; memory is O(chunk), not O(utterance).
    """

    def __init__(self, fs, *, chunk_ms=8000, halo_ms=1000, frame_period=5.0,
                 f0_floor=C.FLOOR_F0, f0_ceil=C.CEIL_F0,
                 channels_in_octave=40.0):
        ratio = max(1, min(12, int(fs / 8000.0 + 0.5)))
        u = _grid_unit_ms(fs, ratio)
        self.chunk_ms = ((chunk_ms + u - 1) // u) * u
        self.halo_ms = ((halo_ms + u - 1) // u) * u
        self.fs = fs
        self.frame_period = frame_period
        tc_ms = self.chunk_ms + 2 * self.halo_ms
        self.Tc = tc_ms * fs // 1000
        self.stride = self.chunk_ms * fs // 1000
        self.halo_samples = self.halo_ms * fs // 1000
        self.kern = HarvestKernel(
            fs, self.Tc, f0_floor=f0_floor, f0_ceil=f0_ceil,
            frame_period=frame_period,
            channels_in_octave=channels_in_octave)

    def compute(self, x, dtype=jnp.float32, chunk=32, max_batch=16):
        """F0 for one long utterance.  Returns (f0 [n_out], tpos [n_out])
        with n_out = 1 + 1000*len(x)/fs/frame_period, like
        HarvestKernel.compute."""
        g = self.kern.geo
        x = np.asarray(x)
        n = x.shape[0]
        n_chunks = max(1, -(-n // self.stride))
        P = n_chunks * self.stride
        # chunk 0 has no left halo, so its window alone needs Tc samples;
        # later windows end at P + halo
        xp = np.zeros(max(self.Tc, P + self.halo_samples), x.dtype)
        xp[:n] = x

        # chunk k window: k=0 -> [0, Tc); k>=1 -> [k*stride - halo, +Tc)
        starts = [0] + [k * self.stride - self.halo_samples
                        for k in range(1, n_chunks)]
        rows = np.stack([xp[s:s + self.Tc] for s in starts])

        F_c, S = g.f0_length, g.max_candidates
        flat_rows = []
        for b0 in range(0, n_chunks, max_batch):
            xb = jnp.asarray(rows[b0:b0 + max_batch], dtype)
            mean = jnp.zeros((xb.shape[0],), dtype)
            # grid pinned to 1 ms: chunk stitching joins frame ranges on
            # the reference grid (GRID_MS applies to the batched pipeline)
            out = harvest_device_stages_batch(xb, mean, g, chunk, 1)
            flat_rows.append(np.asarray(out).astype(np.float64))
        flat = np.concatenate(flat_rows, axis=0)     # [n_chunks, 2*F_c*S]

        # stitch kept frame ranges: chunk 0 keeps global 1-ms frames
        # [0, chunk_ms + halo_ms), chunk k keeps
        # [k*chunk_ms + halo_ms, (k+1)*chunk_ms + halo_ms)
        F_total = n_chunks * self.chunk_ms + 1
        cand = np.zeros((F_total, S))
        score = np.zeros((F_total, S))
        for k in range(n_chunks):
            c = flat[k, :F_c * S].reshape(F_c, S)
            s_ = flat[k, F_c * S:].reshape(F_c, S)
            if k == 0:
                glo, llo = 0, 0
            else:
                glo = k * self.chunk_ms + self.halo_ms
                llo = 2 * self.halo_ms
            ghi = min((k + 1) * self.chunk_ms + self.halo_ms, F_total)
            cand[glo:ghi] = c[llo:llo + ghi - glo]
            score[glo:ghi] = s_[llo:llo + ghi - glo]

        best = contour.fix_f0_contour(cand, score)
        f0_1ms = contour.smooth_f0_contour(best)

        n_out = 1 + int(1000.0 * n / self.fs / self.frame_period)
        tpos = np.arange(n_out) * self.frame_period / 1000.0
        pick = np.minimum(F_total - 1, _matlab_round_np(tpos * 1000.0))
        return f0_1ms[pick], tpos
