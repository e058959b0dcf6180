"""Multi-chip sharding: data-parallel utterance batches + frame-axis
(sequence-parallel analog) sharding over a jax.sharding.Mesh.

The reference's only parallel strategy is OpenMP threads over frames/pulses
inside one address space (SURVEY.md §2 row 14).  The TPU equivalents:

  dp — utterance batch sharded over the 'data' mesh axis (zero collectives)
  sp — the frame/time axis sharded over the 'time' mesh axis for the
       analysis engines (each frame only needs the replicated waveform, so
       no halo is required; synthesis consumes the frame axis replicated,
       which XLA satisfies with an all-gather over ICI)
  tp/pp/ep — not applicable: the vocoder has no weight matrices, layer
       stacks or experts to shard (SURVEY.md §2 rows 14-15)

Batches are padded: utterances to a common T (zero samples) and a common F
(zero = unvoiced frames); callers slice the outputs back to true lengths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from worldtpu.analysis.cheaptrick import cheaptrick_frames
from worldtpu.analysis.d4c import d4c_frames
from worldtpu.synthesis import synthesis as _syn


class MeshConfigError(ValueError):
    """Requested mesh shape does not match the available devices."""


def make_mesh(n_data=None, n_time=1, devices=None):
    """Build a ('data', 'time') mesh over the available devices.

    If the requested n_data*n_time factorization doesn't cover the device
    list, degrades to a dp-only mesh over all devices (n_time=1) rather
    than failing — frame-axis sharding is an optimization, data
    parallelism is the contract."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n == 0:
        raise MeshConfigError("no devices available for mesh construction")
    if n_data is None:
        n_data = n // max(n_time, 1)
    if n_data * n_time != n:
        # degrade: dp-only over everything we actually have
        n_data, n_time = n, 1
    arr = np.asarray(devices).reshape(n_data, n_time)
    return Mesh(arr, ("data", "time"))


def _analysis_one(x, f0, tpos, fs, fft_size, max_half_window):
    spec = cheaptrick_frames(
        x, f0, tpos, fs=fs, fft_size=fft_size,
        max_half_window=max_half_window)
    ap = d4c_frames(x, f0, tpos, fs=fs, fft_size_out=fft_size)
    return spec, ap


def _copy_syn_one(x, f0, tpos, noise, fs, fft_size, max_half_window,
                  frame_period_s, out_length, max_pulses):
    spec, ap = _analysis_one(x, f0, tpos, fs, fft_size, max_half_window)
    y = _syn.synthesis_frames_impl(
        f0, spec, ap, noise, fs=fs, fft_size=fft_size,
        frame_period_s=frame_period_s, out_length=out_length,
        max_pulses=max_pulses)
    return y, spec, ap


@functools.partial(
    jax.jit,
    static_argnames=("fs", "fft_size", "max_half_window", "out_length",
                     "max_pulses", "mesh"))
def batch_copy_synthesis(x, f0, tpos, noise, *, fs, fft_size,
                         max_half_window, frame_period_s, out_length,
                         max_pulses, mesh=None):
    """Batched copy-synthesis (analysis from given F0 + resynthesis).

    Args:
        x: [B, T] padded waveforms.
        f0: [B, F] padded F0 contours (0 = unvoiced/padding).
        tpos: [F] shared frame times.
        noise: [B, max_pulses, fft_size] synthesis noise.
        mesh: optional Mesh('data', 'time'); batch is sharded over 'data'
            (dp) and the frame axis of the analysis over 'time' (the
            sequence-parallel analog) via shard_map — each device analyzes
            its frame slab against the replicated-within-data-shard
            waveform, then the frame axis is all-gathered over ICI for
            synthesis.

    Returns:
        (y [B, out_length], spec [B, F, K], ap [B, F, K])
    """
    def syn_fn(xb, f0b, nb, specb, apb):
        return jax.vmap(lambda fi, si, ai, ni: _syn.synthesis_frames_impl(
            fi, si, ai, ni, fs=fs, fft_size=fft_size,
            frame_period_s=frame_period_s, out_length=out_length,
            max_pulses=max_pulses))(f0b, specb, apb, nb)

    if mesh is None:
        spec, ap = jax.vmap(
            lambda xi, fi: _analysis_one(
                xi, fi, tpos, fs, fft_size, max_half_window))(x, f0)
        return syn_fn(x, f0, noise, spec, ap), spec, ap

    def local_analysis(x_l, f0_l, tpos_l):
        # local shapes: [B/nd, T], [B/nd, F/nt], [F/nt]
        return jax.vmap(
            lambda xi, fi: _analysis_one(
                xi, fi, tpos_l, fs, fft_size, max_half_window))(x_l, f0_l)

    spec, ap = jax.shard_map(
        local_analysis, mesh=mesh,
        in_specs=(P("data", None), P("data", "time"), P("time")),
        out_specs=(P("data", "time", None), P("data", "time", None)))(
            x, f0, tpos)

    # synthesis consumes the full frame axis: constrain to data-sharded so
    # XLA all-gathers the 'time' axis over ICI
    rep = NamedSharding(mesh, P("data", None, None))
    spec_g = jax.lax.with_sharding_constraint(spec, rep)
    ap_g = jax.lax.with_sharding_constraint(ap, rep)
    y = syn_fn(x, f0, noise, spec_g, ap_g)
    y = jax.lax.with_sharding_constraint(y, NamedSharding(mesh, P("data", None)))
    return y, spec, ap


def pad_batch(waves, fs, frame_period_ms=5.0):
    """Pad a list of 1-D waveforms to a [B, T] batch + frame geometry.

    Returns (x [B,T], lengths, n_frames_per_utt, F, out_length)."""
    lengths = np.array([len(w) for w in waves])
    T = int(lengths.max())
    B = len(waves)
    x = np.zeros((B, T), dtype=np.asarray(waves[0]).dtype)
    for i, w in enumerate(waves):
        x[i, :len(w)] = w
    n_frames = (1000.0 * lengths / fs / frame_period_ms).astype(int) + 1
    F = int(n_frames.max())
    out_length = int((F - 1) * frame_period_ms / 1000.0 * fs) + 1
    return x, lengths, n_frames, F, out_length
