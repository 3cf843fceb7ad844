"""On-hardware kernel regression suite (VERDICT r1 item 5).

The reference's entire test suite needs a live GPU + TensorRT (SURVEY.md
§4); this repo's 300-odd tests run on CPU with interpret-mode Pallas. This
is the missing hardware tier: one command that compiles and checks every
Mosaic kernel and quantized path ON THE REAL CHIP, printing one JSON line
of per-check pass/fail + max error, exit 0 iff all pass.

  timeout 1200 python -m cli.tpu_check          # all checks
  python -m cli.tpu_check --only flash_fwd decode_kernel

First run on a machine pays remote compiles (minutes through this
environment's compile tunnel); the persistent cache makes later runs fast.
Reference analog: the GPU-required op-test tier
(reference: tests/functional/test_identity.py:17-45).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _ref_attention(q, k, v, causal=False, valid_len=None):
    """Plain-XLA fp32-softmax attention, the oracle every kernel is held to."""
    import jax
    import jax.numpy as jnp

    scores = jnp.einsum("bhsd,bhtd->bhst", q, k,
                        preferred_element_type=jnp.float32)
    t = k.shape[2]
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (1, 1, q.shape[2], t), 2)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, q.shape[2], t), 3)
        scores = jnp.where(col <= row, scores, jnp.float32(-1e9))
    if valid_len is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, t), 3)
        scores = jnp.where(col < valid_len, scores, jnp.float32(-1e9))
    w = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhst,bhtd->bhsd", w, v,
                      preferred_element_type=q.dtype)


def check_flash_fwd():
    import jax
    import jax.numpy as jnp

    from whisper_trtllm_tpu.ops.pallas import flash_mha

    rng = np.random.default_rng(0)
    b, h, s, dh = 4, 6, 1500, 64   # tiny.en encoder shape
    q = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32) * 0.125
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    out = np.asarray(jax.jit(flash_mha)(q, k, v))
    ref = np.asarray(jax.jit(_ref_attention)(q, k, v))
    err = float(np.abs(out - ref).max())
    return err < 2e-4, {"max_err": err}


def check_flash_bwd():
    import jax
    import jax.numpy as jnp

    from whisper_trtllm_tpu.ops.pallas import flash_mha
    from whisper_trtllm_tpu.ops.pallas import pallas_disabled

    rng = np.random.default_rng(1)
    b, h, s, dh = 2, 4, 512, 64
    q = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32) * 0.125
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)

    def loss_kernel(q, k, v):
        return jnp.sum(flash_mha(q, k, v) * w)

    def loss_ref(q, k, v):
        return jnp.sum(_ref_attention(q, k, v) * w)

    g = jax.jit(jax.grad(loss_kernel, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    err = float(max(np.abs(np.asarray(a) - np.asarray(b)).max()
                    for a, b in zip(g, gr)))
    return err < 5e-4, {"max_err": err}


def check_flash_causal():
    import jax
    import jax.numpy as jnp

    from whisper_trtllm_tpu.ops.pallas import flash_mha

    rng = np.random.default_rng(2)
    b, h, s, dh = 2, 4, 1024, 64   # >= the S=768 dispatch boundary
    q = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32) * 0.125
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    out = np.asarray(jax.jit(
        lambda q, k, v: flash_mha(q, k, v, causal=True))(q, k, v))
    ref = np.asarray(jax.jit(
        lambda q, k, v: _ref_attention(q, k, v, causal=True))(q, k, v))
    err = float(np.abs(out - ref).max())
    return err < 2e-4, {"max_err": err}


def check_decode_kernel():
    import jax
    import jax.numpy as jnp

    from whisper_trtllm_tpu.ops.attention import mha_decode_step
    from whisper_trtllm_tpu.ops.pallas import decode_mha

    rng = np.random.default_rng(3)
    b, h, t, dh = 8, 6, 449, 64
    q = jnp.asarray(rng.standard_normal((b, h, 1, dh)), jnp.float32) * 0.125
    ck = jnp.asarray(rng.standard_normal((b, h, t, dh)), jnp.float32) * 0.3
    cv = jnp.asarray(rng.standard_normal((b, h, t, dh)), jnp.float32)
    out = np.asarray(jax.jit(decode_mha)(q, ck, cv, jnp.int32(37)))
    ref = np.asarray(jax.jit(mha_decode_step)(q, ck, cv, jnp.int32(37)))
    err = float(np.abs(out - ref).max())
    return err < 2e-4, {"max_err": err}


def check_fused_layer():
    """Whole-layer fused decode kernel vs the XLA decode step, through the
    real decode_step_kv dispatch (opt-in WHISPER_TPU_FUSED_DECODE)."""
    import jax.numpy as jnp

    from whisper_trtllm_tpu.config import WhisperConfig
    from whisper_trtllm_tpu.models.whisper import init_params
    from whisper_trtllm_tpu.models.whisper import model as wmodel

    cfg = WhisperConfig.tiny_en()
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(4)
    b = 4
    enc = jnp.asarray(
        rng.standard_normal((b, cfg.max_source_positions, cfg.d_model)),
        jnp.float32) * 0.3
    cross_kv = wmodel.compute_cross_kv(params, cfg, enc)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (b,)), jnp.int32)

    def run():
        import jax
        self_kv = wmodel.init_self_kv(cfg, b, 16, dtype=jnp.float32)
        fn = jax.jit(lambda p, t: wmodel.decode_step_kv(
            p, cfg, t, jnp.int32(3), self_kv, cross_kv)[0])
        return np.asarray(fn(params, toks))

    old = os.environ.get("WHISPER_TPU_FUSED_DECODE")
    try:
        os.environ["WHISPER_TPU_FUSED_DECODE"] = "1"
        fused = run()
    finally:
        if old is None:
            os.environ.pop("WHISPER_TPU_FUSED_DECODE", None)
        else:
            os.environ["WHISPER_TPU_FUSED_DECODE"] = old
    plain = run()
    err = float(np.abs(fused - plain).max())
    return err < 5e-3, {"max_err": err}


def check_int8_kv_fold():
    """int8 KV cache with folded per-token scales vs dequantize-then-attend."""
    import jax
    import jax.numpy as jnp

    from whisper_trtllm_tpu.ops.attention import (
        dequantize_kv,
        mha_decode_step,
        quantize_kv,
    )

    rng = np.random.default_rng(5)
    b, h, t, dh = 4, 6, 64, 64
    q = jnp.asarray(rng.standard_normal((b, h, 1, dh)), jnp.float32) * 0.125
    ck = jnp.asarray(rng.standard_normal((b, h, t, dh)), jnp.float32) * 0.3
    cv = jnp.asarray(rng.standard_normal((b, h, t, dh)), jnp.float32)
    kq, ks = quantize_kv(ck, jnp.int8)
    vq, vs = quantize_kv(cv, jnp.int8)

    # pin full-f32 matmuls: the folded and dequantized paths run different
    # matmul shapes, and TPU default (bf16 3-pass) precision would add
    # ~1e-3 of unrelated drift (measured; 'highest' gives ~1e-7)
    with jax.default_matmul_precision("highest"):
        folded = np.asarray(jax.jit(
            lambda: mha_decode_step(q, kq, vq, jnp.int32(50),
                                    k_scale=ks, v_scale=vs))())
        deq = np.asarray(jax.jit(
            lambda: mha_decode_step(q, dequantize_kv(kq, ks),
                                    dequantize_kv(vq, vs), jnp.int32(50)))())
    err = float(np.abs(folded - deq).max())
    return err < 2e-4, {"max_err": err}


def check_step_equals_full():
    """Cached incremental decode == teacher-forced, compiled on the chip
    (the reference's miscompile class, README.md:100-106)."""
    import jax
    import jax.numpy as jnp

    from whisper_trtllm_tpu.config import WhisperConfig
    from whisper_trtllm_tpu.models.whisper import init_params
    from whisper_trtllm_tpu.models.whisper import model as wmodel

    cfg = WhisperConfig.testing(d_model=64, encoder_attention_heads=4,
                                decoder_attention_heads=4,
                                encoder_ffn_dim=128, decoder_ffn_dim=128,
                                vocab_size=128)
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(6)
    mel = jnp.asarray(rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)), jnp.float32)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 10)), jnp.int32)

    @jax.jit
    def both(params, mel, toks):
        enc = wmodel.encode(params, cfg, mel)
        full = wmodel.decode_full(params, cfg, toks, enc)
        cross_kv = wmodel.compute_cross_kv(params, cfg, enc)
        self_kv = wmodel.init_self_kv(cfg, 2, 10, dtype=enc.dtype)

        def body(carry, i):
            self_kv = carry
            logits, self_kv = wmodel.decode_step_kv(
                params, cfg, toks[:, i], i, self_kv, cross_kv)
            return self_kv, logits

        _, steps = jax.lax.scan(body, self_kv, jnp.arange(10))
        return full, steps.transpose(1, 0, 2)

    # 'highest' isolates the cache logic from TPU default-precision drift:
    # full-sequence and single-token matmul shapes pick different bf16-pass
    # decompositions under 'default' (measured 2.2e-3 there, 1.2e-7 here)
    with jax.default_matmul_precision("highest"):
        full, steps = both(params, mel, toks)
    err = float(np.abs(np.asarray(full) - np.asarray(steps)).max())
    return err < 2e-4, {"max_err": err}


def check_paged_vs_contiguous():
    import jax
    import jax.numpy as jnp

    from whisper_trtllm_tpu.ops.attention import (
        mha_decode_step,
        paged_mha_decode_step,
    )

    rng = np.random.default_rng(7)
    b, h, dh, tpb, m = 4, 4, 64, 8, 6
    t = tpb * m
    valid = 29
    ck = rng.standard_normal((b, h, t, dh)).astype(np.float32) * 0.3
    cv = rng.standard_normal((b, h, t, dh)).astype(np.float32)
    q = jnp.asarray(rng.standard_normal((b, h, 1, dh)), jnp.float32) * 0.125
    # scatter the contiguous cache into a shuffled pool
    perm = rng.permutation(b * m)
    pool_k = np.zeros((b * m, tpb, h, dh), np.float32)
    pool_v = np.zeros((b * m, tpb, h, dh), np.float32)
    tables = np.zeros((b, m), np.int32)
    for lane in range(b):
        for blk in range(m):
            p = int(perm[lane * m + blk])
            tables[lane, blk] = p
            sl = ck[lane, :, blk * tpb:(blk + 1) * tpb].transpose(1, 0, 2)
            pool_k[p] = sl
            pool_v[p] = cv[lane, :, blk * tpb:(blk + 1) * tpb].transpose(1, 0, 2)
    out = np.asarray(jax.jit(paged_mha_decode_step)(
        q, jnp.asarray(pool_k), jnp.asarray(pool_v), jnp.asarray(tables),
        jnp.int32(valid)))
    ref = np.asarray(jax.jit(mha_decode_step)(
        q, jnp.asarray(ck), jnp.asarray(cv), jnp.int32(valid)))
    err = float(np.abs(out - ref).max())
    return err == 0.0 or err < 1e-6, {"max_err": err}


def check_int8_kv_greedy():
    """Full greedy decode with int8 KV compiles and tracks fp32 closely."""
    import jax.numpy as jnp

    from whisper_trtllm_tpu.config import GenerationConfig, WhisperConfig
    from whisper_trtllm_tpu.models.whisper import init_params
    from whisper_trtllm_tpu.models.whisper import model as wmodel
    from whisper_trtllm_tpu.runtime.generation import greedy_decode

    cfg = WhisperConfig.testing(d_model=64, encoder_attention_heads=4,
                                decoder_attention_heads=4,
                                encoder_ffn_dim=128, decoder_ffn_dim=128,
                                vocab_size=128)
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(8)
    mel = jnp.asarray(rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)), jnp.float32)
    enc = wmodel.encode(params, cfg, mel)
    t32, l32 = greedy_decode(params, cfg, enc,
                             GenerationConfig(max_new_tokens=10))
    t8, l8 = greedy_decode(
        params, cfg, enc,
        GenerationConfig(max_new_tokens=10, kv_cache_dtype="int8"))
    t32, t8 = np.asarray(t32), np.asarray(t8)
    m = min(t32.shape[1], t8.shape[1])
    agree = float((t32[:, :m] == t8[:, :m]).mean())
    return agree >= 0.8, {"token_agreement": agree}


def check_ifb_quantized_lanes():
    """In-flight batcher with int8 lanes (quantized ragged decode — the
    serving precision path, round 5) reproduces lockstep int8 greedy
    exactly on hardware, lane stagger and all."""
    import jax.numpy as jnp

    from whisper_trtllm_tpu.config import GenerationConfig, WhisperConfig
    from whisper_trtllm_tpu.models.whisper import init_params
    from whisper_trtllm_tpu.runtime.generation import transcribe_tokens
    from whisper_trtllm_tpu.runtime.ifb import InflightBatcher

    cfg = WhisperConfig.testing(d_model=64, encoder_attention_heads=4,
                                decoder_attention_heads=4,
                                encoder_ffn_dim=128, decoder_ffn_dim=128,
                                vocab_size=128)
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(9)
    mels = rng.standard_normal(
        (3, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    gen = GenerationConfig(max_new_tokens=8, kv_cache_dtype="int8")
    ref_t, ref_l = transcribe_tokens(params, cfg, jnp.asarray(mels), gen)
    ref_t, ref_l = np.asarray(ref_t), np.asarray(ref_l)
    b = InflightBatcher(params, cfg, gen, num_lanes=2, segment_steps=3)
    rids = [b.submit(mels[i]) for i in range(3)]
    b.run()
    exact = 0
    for i, rid in enumerate(rids):
        out = b.fetch(rid)
        expect = ref_t[i, : ref_l[i]]
        exact += int(out is not None
                     and np.array_equal(out[: len(expect)], expect))
    return exact == 3, {"exact": exact, "quantized_lanes":
                        len(b.state.self_kv) == 4}


def check_cross_attn_kernel():
    """Head-contiguous cross-attention library kernel vs the XLA decode
    step, compiled on hardware (previously interpret-only — VERDICT r2
    order 6)."""
    import jax.numpy as jnp

    from whisper_trtllm_tpu.ops.attention import mha_decode_step
    from whisper_trtllm_tpu.ops.pallas.cross_attention import cross_decode_mha

    rng = np.random.default_rng(4)
    b, h, t, dh = 4, 6, 1504, 64          # tiny.en cross shapes
    valid = 1500
    q = jnp.asarray(rng.standard_normal((b, h, 1, dh)), jnp.float32) * 0.3
    ck = jnp.asarray(rng.standard_normal((b, h, t, dh)), jnp.float32) * 0.3
    cv = jnp.asarray(rng.standard_normal((b, h, t, dh)), jnp.float32)
    ref = np.asarray(mha_decode_step(q, ck, cv, jnp.int32(valid)))
    q2 = jnp.reshape(q[:, :, 0], (b, h * dh))
    k2 = jnp.reshape(jnp.transpose(ck, (0, 2, 1, 3)), (b, t, h * dh))
    v2 = jnp.reshape(jnp.transpose(cv, (0, 2, 1, 3)), (b, t, h * dh))
    out = np.asarray(cross_decode_mha(q2, k2, v2, heads=h, head_dim=dh,
                                      valid_len=valid))
    err = float(np.abs(out - ref[:, :, 0].reshape(b, h * dh)).max())
    return err < 2e-4, {"max_err": err}


def check_stft_kernel():
    """Pallas STFT+mel+log frontend kernel vs the block-matmul jnp path on
    hardware (previously interpret-only — VERDICT r2 order 6)."""
    import jax.numpy as jnp

    from whisper_trtllm_tpu.audio.features import (
        HOP_LENGTH, N_FREQ_BINS, LogMelSpectrogram,
    )
    from whisper_trtllm_tpu.ops.pallas.stft import stft_log_mel

    rng = np.random.default_rng(5)
    fe = LogMelSpectrogram(80)
    n_rows = 300 + 2
    audio_blocks = rng.standard_normal(
        (2, n_rows, HOP_LENGTH)).astype(np.float32) * 0.1
    frames = np.concatenate(
        [audio_blocks[:, :-2], audio_blocks[:, 1:-1], audio_blocks[:, 2:]],
        axis=-1)
    spec = np.einsum("btn,nf->btf", frames, np.asarray(fe.dft_basis))
    power = spec[..., :N_FREQ_BINS] ** 2 + spec[..., N_FREQ_BINS:] ** 2
    ref = np.log10(np.maximum(power @ np.asarray(fe.mel_fb), 1e-10))
    out = np.asarray(stft_log_mel(
        jnp.asarray(audio_blocks), fe.dft_basis, fe.mel_fb))
    err = float(np.abs(out - ref).max())
    return err < 5e-4, {"max_err": err}


def check_beam_path():
    """Beam search on hardware: num_beams=1 must reproduce the greedy
    trajectory token-for-token (argmax is invariant under the beam loop's
    log-softmax), and k=2 returns sorted finite scores (VERDICT r2
    order 6's beam-path check)."""
    import jax
    import jax.numpy as jnp

    from whisper_trtllm_tpu.config import GenerationConfig, WhisperConfig
    from whisper_trtllm_tpu.models.whisper import init_params
    from whisper_trtllm_tpu.models.whisper import model as wmodel
    from whisper_trtllm_tpu.runtime.beam import beam_decode
    from whisper_trtllm_tpu.runtime.generation import greedy_decode

    cfg = WhisperConfig.tiny_en()
    params = jax.device_put(init_params(cfg, seed=0))
    rng = np.random.default_rng(6)
    mel = jnp.asarray(rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)) * 0.5,
        jnp.float32)
    enc = jax.jit(lambda p, m: wmodel.encode(p, cfg, m))(params, mel)
    g_tokens, g_lens = greedy_decode(
        params, cfg, enc, GenerationConfig(max_new_tokens=12))
    b_tokens, b_scores, b_lens = beam_decode(
        params, cfg, enc, GenerationConfig(max_new_tokens=12, num_beams=1))
    g_tokens, g_lens = np.asarray(g_tokens), np.asarray(g_lens)
    b_tokens, b_lens = np.asarray(b_tokens), np.asarray(b_lens)
    n = int(min(g_lens.min(), b_lens[:, 0].min()))
    tok_eq = bool((b_tokens[:, 0, :n] == g_tokens[:, :n]).all())
    t2, s2, l2 = beam_decode(
        params, cfg, enc, GenerationConfig(max_new_tokens=12, num_beams=2))
    s2 = np.asarray(s2)
    sorted_ok = bool((np.diff(s2, axis=1) <= 1e-6).all())
    finite_ok = bool(np.isfinite(s2[:, 0]).all())
    return tok_eq and sorted_ok and finite_ok, {
        "beam1_eq_greedy": tok_eq, "k2_sorted": sorted_ok,
        "k2_finite": finite_ok, "prefix_len": n}


CHECKS = {
    "flash_fwd": check_flash_fwd,
    "flash_bwd": check_flash_bwd,
    "flash_causal": check_flash_causal,
    "decode_kernel": check_decode_kernel,
    "fused_layer": check_fused_layer,
    "int8_kv_fold": check_int8_kv_fold,
    "int8_kv_greedy": check_int8_kv_greedy,
    "ifb_quantized_lanes": check_ifb_quantized_lanes,
    "step_equals_full": check_step_equals_full,
    "paged_vs_contiguous": check_paged_vs_contiguous,
    "cross_attn_kernel": check_cross_attn_kernel,
    "stft_kernel": check_stft_kernel,
    "beam_path": check_beam_path,
}

# state file consumed by bench.py: the driver-visible BENCH number must not
# ride over a failed/never-run kernel check (VERDICT r2 order 6)
STATE_PATH_ENV = "WHISPER_TPU_CHECK_STATE"
DEFAULT_STATE_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "TPU_CHECK_LAST.json")


def _git_head() -> str:
    import subprocess

    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip()
    except Exception:
        return "unknown"


# directories whose content the check record vouches for: a change here
# after the record was written means the record no longer covers the code
# that would run in a benchmark (bench.py re-runs the suite on mismatch —
# the git_head field alone cannot catch uncommitted edits or post-record
# commits; VERDICT r3 weak 3)
KERNEL_TREE_DIRS = ("whisper_trtllm_tpu/ops", "whisper_trtllm_tpu/models/whisper",
                    "whisper_trtllm_tpu/quantization",
                    # the suite also exercises the decode loops, beam path
                    # and STFT frontend — changes there must invalidate the
                    # record too (round-4 review finding)
                    "whisper_trtllm_tpu/runtime", "whisper_trtllm_tpu/audio")


def kernel_tree_digest(repo_root: str | None = None) -> str:
    """Content hash of the compute-path source the tpu_check record covers."""
    import hashlib

    root = repo_root or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for d in KERNEL_TREE_DIRS:
        base = os.path.join(root, d)
        for dirpath, dirnames, filenames in sorted(os.walk(base)):
            dirnames.sort()
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                p = os.path.join(dirpath, fn)
                h.update(os.path.relpath(p, root).encode())
                with open(p, "rb") as f:
                    h.update(f.read())
    return h.hexdigest()[:16]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", help="subset of check names")
    ap.add_argument("--allow-cpu", action="store_true",
                    help="run even if the backend is not TPU (interp-free "
                    "checks only make sense on hardware; this is for dry "
                    "runs of the harness itself)")
    args = ap.parse_args(argv)

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/wtpu_xla_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    backend = jax.default_backend()
    if backend != "tpu" and not args.allow_cpu:
        print(json.dumps({"backend": backend, "pass": False,
                          "error": "not on TPU (use --allow-cpu to dry-run)"}))
        return 1

    names = args.only or list(CHECKS)
    unknown = [n for n in names if n not in CHECKS]
    if unknown:
        ap.error(f"unknown checks: {unknown}; have {sorted(CHECKS)}")

    # Mosaic kernel checks only make sense with the kernels enabled; on a
    # non-TPU dry run they would take interpret-free paths and fail — skip.
    kernel_checks = {"flash_fwd", "flash_bwd", "flash_causal",
                     "decode_kernel", "fused_layer", "cross_attn_kernel",
                     "stft_kernel"}
    results = {}
    ok = True
    for name in names:
        if backend != "tpu" and name in kernel_checks:
            results[name] = {"pass": None, "skipped": "needs TPU"}
            continue
        t0 = time.perf_counter()
        try:
            passed, info = CHECKS[name]()
        except Exception as e:  # noqa: BLE001 — a crash IS the finding
            passed, info = False, {"error": f"{type(e).__name__}: {e}"}
        info["pass"] = bool(passed)
        info["s"] = round(time.perf_counter() - t0, 2)
        results[name] = info
        ok &= bool(passed)

    report = {"backend": backend, "pass": bool(ok), **results}
    print(json.dumps(report))
    # persist for bench.py's gate (full runs only — a passing subset must
    # not overwrite/mask a failing full run's record)
    if backend == "tpu" and not args.only:
        state = {"ts": time.time(), "git_head": _git_head(),
                 "kernel_digest": kernel_tree_digest(),
                 "pass": bool(ok), "results": report}
        path = os.environ.get(STATE_PATH_ENV, DEFAULT_STATE_PATH)
        try:
            with open(path, "w") as f:
                json.dump(state, f, indent=1)
        except OSError as e:
            print(json.dumps({"state_write_error": str(e)}), file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
