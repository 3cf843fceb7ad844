"""Fused STFT + mel + log kernel: hop blocks in → log-mel frames out.

The Pallas frontend kernel from the project north star (BASELINE.json):
per (utterance, frame-block) program the windowed 400-tap DFT runs as a sum
of three (FB, hop) x (hop, 2*n_bins) MXU matmuls (window folded into the
basis, zero-padded to three hop blocks), and power + mel projection + log10
happen in-register — the power spectrogram and the (frames, 480) matrix
never exist in HBM. The three hop-shifted views arrive as ordinary pipelined
inputs (Mosaic rejects both in-kernel concats of sublane-shifted vectors and
DMA slices whose lane dim isn't 128-aligned, so the shift happens in XLA).

The surrounding LogMelSpectrogram applies the utterance-global max-8 clamp
and (x+4)/4 scaling and owns HF parity (tests/test_features.py); this kernel
is parity-tested against the jnp formulation in tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FB = 128  # frames per program


def _kernel(b0_ref, b1_ref, b2_ref, basis_ref, mel_ref, out_ref,
            *, hop: int, n_bins: int):
    spec = jnp.zeros((FB, 2 * n_bins), jnp.float32)
    for j, ref in enumerate((b0_ref, b1_ref, b2_ref)):
        spec += jnp.dot(
            ref[0], basis_ref[pl.ds(j * hop, hop), :],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # fp32 DFT: log10 amplifies
        )                                                  # (FB, 2*n_bins)
    re = spec[:, :n_bins]
    im = spec[:, n_bins:]
    power = re * re + im * im                              # (FB, n_bins)
    melspec = jnp.dot(power, mel_ref[...],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)  # (FB, M)
    out_ref[0] = jnp.log(jnp.maximum(melspec, 1e-10)) * jnp.float32(
        0.43429448190325176  # 1/ln(10): log10 via ln
    )


@functools.partial(jax.jit, static_argnames=("hop", "n_bins", "interpret"))
def stft_log_mel(
    audio_blocks: jnp.ndarray,
    basis: jnp.ndarray,
    mel_fb: jnp.ndarray,
    hop: int = 160,
    n_bins: int = 201,
    interpret: bool = False,
) -> jnp.ndarray:
    """audio_blocks: (B, n_hop_blocks, hop) fp32 — the center-padded signal
    reshaped into hop rows; basis: (3*hop, 2*n_bins) windowed DFT;
    mel_fb: (n_bins, M). Returns (B, n_frames, M) log10-mel where
    n_frames = n_hop_blocks - 2."""
    b, n_blocks_rows, _ = audio_blocks.shape
    n_frames = n_blocks_rows - 2
    m = mel_fb.shape[1]
    n_prog = pl.cdiv(n_frames, FB)
    need = n_prog * FB
    shifted = []
    for j in range(3):
        v = audio_blocks[:, j : j + n_frames]
        if need > n_frames:
            v = jnp.pad(v, ((0, 0), (0, need - n_frames), (0, 0)))
        shifted.append(v)                                  # (B, need, hop)

    blk = lambda: pl.BlockSpec((1, FB, hop), lambda b_, i: (b_, i, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, hop=hop, n_bins=n_bins),
        out_shape=jax.ShapeDtypeStruct((b, need, m), jnp.float32),
        grid=(b, n_prog),
        in_specs=[
            blk(), blk(), blk(),
            pl.BlockSpec((3 * hop, 2 * n_bins), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, m), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, FB, m), lambda b_, i: (b_, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(shifted[0], shifted[1], shifted[2], basis, mel_fb)
    return out[:, :n_frames]
