"""Whole-decoder-layer decode step in ONE Pallas kernel.

The decode hot loop at small model dims is bound by per-op launch overhead,
not bandwidth: a whisper-tiny decode step runs ~5x above its HBM roofline
while differential loop benchmarks put while_loop/scan iteration cost at
~2 us — the gap is the ~25 small XLA ops per decoder layer. This kernel
fuses the per-layer step

    q proj -> masked self-attention over the (already appended) cache
      -> out proj -> residual -> LN2 -> cross-q proj
      -> cross-attention (streamed encoder-KV blocks, online softmax)
      -> out proj -> residual -> LN3 -> fc1 -> gelu -> fc2 -> residual

into a single launch per layer; the only layer math left to XLA is LN1 and
the K/V projection + one-row cache append (which XLA already performs as an
in-place dynamic-update-slice on the donated cache — re-doing that through
a kernel would force a full-cache write-back every step).

It subsumes the reference's fused attention plugins *plus* the surrounding
layer math (reference: cpp/tensorrt_llm/kernels/
decoderMaskedMultiheadAttention*, cpp/tensorrt_llm/plugins/
gptAttentionPlugin/ fuse only the attention; layernorm and the GEMMs stay
separate TRT nodes — the per-node launch overhead they pay is exactly what
this kernel removes).

Design notes:
- grid = cross-KV time blocks; weights + the self cache live whole in VMEM
  (constant block index -> fetched once), cross K/V stream per block.
- attention score/context contractions run on the VPU as fp32
  multiply-reduce (B*H independent dh=64 matvecs would waste the MXU);
  the five projection GEMMs run on the MXU.
- fp32 LayerNorm statistics and fp32 softmax (incl. the online cross
  softmax) mirror the XLA path's invariants.
- Mosaic rejects bf16 matmul accumulators: every dot uses
  preferred_element_type=f32 and casts back.

Whisper-shaped (self + cross + MLP); the causal-LM zoo keeps the XLA path.
``fused_layer_supported`` gates on the VMEM budget (tiny/base fit; medium+
falls back to XLA until a weight-streaming variant exists).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# cross-KV time-block size; models.whisper.compute_cross_kv pads the encoder
# axis to a multiple of this when the fused path is enabled. Large blocks
# mean few grid steps (grid-step sequencing showed up at ~15 us/step on
# v5e-via-axon); the scoped-VMEM limit is raised per-kernel to hold them.
CROSS_BLOCK = int(os.environ.get("WHISPER_TPU_FUSED_BLOCK", "512"))
# resident VMEM budget for the gate (weights + self cache + double-buffered
# cross blocks + scratch, with Mosaic lane/sublane padding accounted)
VMEM_BUDGET = int(os.environ.get("WHISPER_TPU_FUSED_VMEM",
                                 str(100 * 1024 * 1024)))


def _erf32(x):
    """fp32 erf via Abramowitz-Stegun 7.1.26 (|error| <= 1.5e-7) — Mosaic
    has no erf/erfc lowering; 1.5e-7 absolute sits far below both the
    kernel's parity tolerance and one bf16 ulp, so exact-GELU semantics are
    preserved to working precision."""
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-a * a)
    return jnp.where(x < 0, -y, y)


def _ln32(x32, scale, bias, eps=1e-5):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return y * scale[...].astype(jnp.float32) + bias[...].astype(jnp.float32)


def _dot32(a32, w_ref, b_ref=None):
    """(B, din) f32 x (din, dout) ref -> (B, dout) f32 on the MXU."""
    w = w_ref[...]
    y = jax.lax.dot_general(
        a32.astype(w.dtype), w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if b_ref is not None:
        y = y + b_ref[...].astype(jnp.float32)
    return y


def _kernel(scalars,  # (2,) int32: [pos, enc_len]
            x_ref, h1_ref,
            wq, bq, wo, bo,
            ln2s, ln2b, wcq, bcq, wco, bco,
            ln3s, ln3b, wf1, bf1, wf2, bf2,
            sk_ref, sv_ref, ck_ref, cv_ref,
            xout_ref,
            xmid_ref, q4_ref, m_ref, l_ref, acc_ref):
    # Mosaic has no lane-splitting/merging shape casts, so (B, d) never
    # reshapes to (B, H, dh): heads are addressed with *static* 64-lane
    # slices of the (B, d) projections and leading-axis indices of the
    # (B, H, T, dh) caches, in an unrolled python loop over H.
    i = pl.program_id(0)
    nc = pl.num_programs(0)
    pos = scalars[0]
    enc_len = scalars[1]
    b, h, ts, dh = sk_ref.shape
    d = x_ref.shape[-1]
    scale = jnp.float32(dh) ** -0.5

    @pl.when(i == 0)
    def prologue():
        x = x_ref[...].astype(jnp.float32)                    # (B, d)
        h1 = h1_ref[...].astype(jnp.float32)                  # LN1(x), f32
        q_all = _dot32(h1, wq, bq) * scale                    # (B, d)
        # stage per-head queries into 4-D scratch (static lane slices are
        # the only Mosaic-legal way to "reshape" (B, d) -> (B, H, 1, dh))
        for hh in range(h):
            q4_ref[:, hh] = q_all[:, hh * dh:(hh + 1) * dh][:, None, :]
        # masked self-attention over the updated cache, all heads at once
        kc = sk_ref[...].astype(jnp.float32)                  # (B, H, Ts, dh)
        s = jnp.sum(q4_ref[...] * kc, axis=-1)                # (B, H, Ts)
        t_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(t_ids <= pos, s, jnp.float32(-1e9))
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        vc = sv_ref[...].astype(jnp.float32)
        a = jnp.sum(p[:, :, :, None] * vc, axis=2)            # (B, H, dh)
        x_mid = x + bo[...].astype(jnp.float32)
        for hh in range(h):
            x_mid = x_mid + _dot32(a[:, hh], wo.at[hh * dh:(hh + 1) * dh, :])
        xmid_ref[...] = x_mid
        # cross-attention query, staged per head the same way
        h2 = _ln32(x_mid, ln2s, ln2b)
        qc_all = _dot32(h2, wcq, bcq) * scale                 # (B, d)
        for hh in range(h):
            q4_ref[:, hh] = qc_all[:, hh * dh:(hh + 1) * dh][:, None, :]
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # --- streamed cross-attention block (online softmax, all heads) ---
    kblk = ck_ref[...].astype(jnp.float32)                    # (B, H, TB, dh)
    tb = kblk.shape[2]
    s = jnp.sum(q4_ref[...] * kblk, axis=-1)                  # (B, H, TB)
    t_ids = i * tb + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(t_ids < enc_len, s, jnp.float32(-1e9))
    m_prev = m_ref[...]                                       # (B, H, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_ref[...] = l_ref[...] * corr + jnp.sum(p, axis=-1, keepdims=True)
    vblk = cv_ref[...].astype(jnp.float32)
    acc_ref[...] = (acc_ref[...] * corr
                    + jnp.sum(p[:, :, :, None] * vblk, axis=2))
    m_ref[...] = m_new

    @pl.when(i == nc - 1)
    def epilogue():
        a = acc_ref[...] / l_ref[...]                         # (B, H, dh)
        x2 = xmid_ref[...] + bco[...].astype(jnp.float32)
        for hh in range(h):
            x2 = x2 + _dot32(a[:, hh], wco.at[hh * dh:(hh + 1) * dh, :])
        h3 = _ln32(x2, ln3s, ln3b)
        f1 = _dot32(h3, wf1, bf1)
        mid = 0.5 * f1 * (1.0 + _erf32(f1 * jnp.float32(2.0 ** -0.5)))
        y = x2 + _dot32(mid, wf2, bf2)
        xout_ref[...] = y.astype(xout_ref.dtype)


def fused_layer_supported(b: int, h: int, ts: int, dh: int, tc: int,
                          d: int, ffn: int, itemsize: int) -> bool:
    """True when the kernel's resident VMEM (weights + whole self cache +
    double-buffered cross blocks + scratch) fits the budget."""
    if tc % CROSS_BLOCK != 0:
        return False
    # Mosaic pads the minor (lane) dim to 128 and the sublane dim to 8/16,
    # so the caches' VMEM footprint uses the padded head dim
    dh_pad = -(-dh // 128) * 128
    ts_pad = -(-ts // 16) * 16
    weights = (d * d * 4 + d * ffn * 2) * itemsize      # wq, wo, wcq, wco, fc1, fc2
    self_cache = 2 * b * h * ts_pad * dh_pad * itemsize
    cross = 2 * 2 * b * h * CROSS_BLOCK * dh_pad * itemsize  # double-buffered
    scratch = 4 * b * (2 * d + h * (2 * dh_pad + 2 * 128))   # f32 scratch
    return weights + self_cache + cross + scratch < VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_decoder_layer_step(
    x: jnp.ndarray,
    h1: jnp.ndarray,
    pos: jnp.ndarray,
    lp: dict,
    self_k: jnp.ndarray,
    self_v: jnp.ndarray,
    cross_k: jnp.ndarray,
    cross_v: jnp.ndarray,
    enc_len,
    interpret: bool = False,
) -> jnp.ndarray:
    """One decoder layer's decode step (everything after the cache append),
    fused. x/h1: (B, d) hidden and its LN1; pos: scalar int32; lp: the
    layer's parameter subtree (unfused q/k/v); self cache (B, H, Ts, dh) x2
    ALREADY holding this step's K/V at ``pos``; cross cache (B, H, Tc, dh)
    x2 with Tc % CROSS_BLOCK == 0. Returns x' (B, d)."""
    b, d = x.shape
    _, h, ts, dh = self_k.shape
    tc = cross_k.shape[2]
    assert tc % CROSS_BLOCK == 0, tc
    nc = tc // CROSS_BLOCK

    sa, ca = lp["self_attn"], lp["encoder_attn"]
    weights = (
        sa["q"]["kernel"], sa["q"]["bias"],
        sa["out"]["kernel"], sa["out"]["bias"],
        lp["encoder_attn_layer_norm"]["scale"],
        lp["encoder_attn_layer_norm"]["bias"],
        ca["q"]["kernel"], ca["q"]["bias"],
        ca["out"]["kernel"], ca["out"]["bias"],
        lp["final_layer_norm"]["scale"], lp["final_layer_norm"]["bias"],
        lp["fc1"]["kernel"], lp["fc1"]["bias"],
        lp["fc2"]["kernel"], lp["fc2"]["bias"],
    )
    scalars = jnp.stack([jnp.asarray(pos, jnp.int32),
                         jnp.asarray(enc_len, jnp.int32)])

    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    cross_spec = pl.BlockSpec((b, h, CROSS_BLOCK, dh),
                              lambda i, s: (0, 0, i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[whole, whole] + [whole] * len(weights)
        + [whole, whole, cross_spec, cross_spec],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((b, d), jnp.float32),        # x_mid
            pltpu.VMEM((b, h, 1, dh), jnp.float32),  # per-head queries
            pltpu.VMEM((b, h, 1), jnp.float32),      # m
            pltpu.VMEM((b, h, 1), jnp.float32),      # l
            pltpu.VMEM((b, h, dh), jnp.float32),     # acc
        ],
    )
    dh_pad = -(-dh // 128) * 128
    ffn = lp["fc1"]["kernel"].shape[-1]
    vmem_need = (
        (d * d * 4 + d * ffn * 2) * x.dtype.itemsize
        + 2 * b * h * (-(-ts // 16) * 16) * dh_pad * self_k.dtype.itemsize
        + (4 if nc > 1 else 2) * b * h * CROSS_BLOCK * dh_pad
        * cross_k.dtype.itemsize
        + 4 * b * (2 * d + h * (2 * dh_pad + 2 * 128)))
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, d), x.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem_need * 1.3) + (1 << 20),
                                 120 * 1024 * 1024)),
        interpret=interpret,
    )(scalars, x, h1, *weights, self_k, self_v, cross_k, cross_v)
