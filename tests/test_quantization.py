"""Weight-only int8 quantization tests (analog of reference:
tests/quantization/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_trtllm_tpu.config import GenerationConfig, WhisperConfig
from whisper_trtllm_tpu.models.whisper import init_params, encode, decode_full
from whisper_trtllm_tpu.ops.functional import dense
from whisper_trtllm_tpu.quantization import (
    QuantMode,
    dequantize_kernel,
    quantize_dense_params,
    quantize_kernel,
    weight_only_quantize,
)
from whisper_trtllm_tpu.runtime.generation import transcribe_tokens


def test_quant_mode_flags():
    m = QuantMode.use_weight_only()
    assert m.has_int8_weights() and not m.has_int8_kv_cache()
    m2 = m | QuantMode.INT8_KV_CACHE
    assert m2.has_int8_kv_cache()


def test_quantize_roundtrip_error(rng):
    w = rng.standard_normal((64, 32)).astype(np.float32)
    q, s = quantize_kernel(w)
    assert q.dtype == np.int8 and s.shape == (32,)
    wd = np.asarray(dequantize_kernel(jnp.asarray(q), jnp.asarray(s)))
    # per-channel symmetric int8: error bounded by scale/2 per element
    assert np.all(np.abs(wd - w) <= s[None, :] * 0.5 + 1e-7)


def test_quantized_dense_close(rng):
    p = {"kernel": rng.standard_normal((48, 16)).astype(np.float32),
         "bias": rng.standard_normal(16).astype(np.float32)}
    x = rng.standard_normal((4, 48)).astype(np.float32)
    ref = np.asarray(dense(p, jnp.asarray(x)))
    out = np.asarray(dense(
        jax.tree_util.tree_map(jnp.asarray, quantize_dense_params(p)),
        jnp.asarray(x),
    ))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.02


def test_quantized_whisper_decodes(rng):
    cfg = WhisperConfig.testing()
    params = init_params(cfg, seed=0)
    qparams = weight_only_quantize(params)
    # stacked layer kernels got quantized
    assert qparams["decoder"]["layers"]["self_attn"]["q"]["kernel_q"].dtype == np.int8
    assert "kernel" not in qparams["decoder"]["layers"]["self_attn"]["q"]
    # conv + embeddings untouched
    assert "kernel" in qparams["encoder"]["conv1"]

    mel = rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    tokens_ref, _ = transcribe_tokens(params, cfg, jnp.asarray(mel),
                                      GenerationConfig(max_new_tokens=8))
    tokens_q, _ = transcribe_tokens(
        jax.tree_util.tree_map(jnp.asarray, qparams), cfg, jnp.asarray(mel),
        GenerationConfig(max_new_tokens=8),
    )
    # int8 path runs end to end and stays on the same trajectory early on
    assert np.asarray(tokens_q).shape == np.asarray(tokens_ref).shape
    np.testing.assert_array_equal(np.asarray(tokens_q)[:, :2],
                                  np.asarray(tokens_ref)[:, :2])


def test_quantized_logits_close(rng):
    cfg = WhisperConfig.testing()
    params = init_params(cfg, seed=0)
    qparams = jax.tree_util.tree_map(jnp.asarray, weight_only_quantize(params))
    mel = rng.standard_normal(
        (1, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    tokens = rng.integers(0, cfg.vocab_size, (1, 5)).astype(np.int32)
    enc_ref = encode(params, cfg, jnp.asarray(mel))
    enc_q = encode(qparams, cfg, jnp.asarray(mel))
    ref = np.asarray(decode_full(params, cfg, tokens, enc_ref))
    out = np.asarray(decode_full(qparams, cfg, tokens, enc_q))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.1  # int8 weight error compounds across layers; bounded


def test_int8_kv_cache_decode(rng):
    """INT8_KV_CACHE mode: greedy decode with quantized self+cross caches
    tracks the float-cache trajectory (analog of the reference's int8 KV
    mode, tensorrt_llm/layers/attention.py:235-245)."""
    from whisper_trtllm_tpu.config import GenerationConfig

    cfg = WhisperConfig.testing()
    params = init_params(cfg, seed=0)
    mel = rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    ref, _ = transcribe_tokens(params, cfg, jnp.asarray(mel),
                               GenerationConfig(max_new_tokens=8))
    q8, _ = transcribe_tokens(
        params, cfg, jnp.asarray(mel),
        GenerationConfig(max_new_tokens=8, kv_cache_dtype="int8"),
    )
    ref, q8 = np.asarray(ref), np.asarray(q8)
    assert ref.shape == q8.shape
    # early tokens track the float path; full-sequence equality isn't
    # guaranteed under quantization noise
    np.testing.assert_array_equal(q8[:, :3], ref[:, :3])


def test_int8_kv_step_logits_close(rng):
    from whisper_trtllm_tpu.models.whisper import (
        compute_cross_kv, decode_step_kv, init_self_kv, init_self_kv_int8,
        quantize_cross_kv,
    )
    from whisper_trtllm_tpu.models.whisper import encode as enc_fn

    cfg = WhisperConfig.testing()
    params = init_params(cfg, seed=0)
    mel = rng.standard_normal(
        (1, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    enc = enc_fn(params, cfg, jnp.asarray(mel))
    ck, cv = compute_cross_kv(params, cfg, enc)
    tok = jnp.asarray([1], jnp.int32)

    ref_logits, _ = decode_step_kv(
        params, cfg, tok, jnp.int32(0),
        init_self_kv(cfg, 1), (ck, cv),
    )
    q_logits, _ = decode_step_kv(
        params, cfg, tok, jnp.int32(0),
        init_self_kv_int8(cfg, 1), quantize_cross_kv(ck, cv),
    )
    rel = np.abs(np.asarray(q_logits) - np.asarray(ref_logits)).max() / (
        np.abs(np.asarray(ref_logits)).max() + 1e-9
    )
    assert rel < 0.05


def test_int4_pack_unpack_roundtrip(rng):
    from whisper_trtllm_tpu.quantization import (
        quantize_kernel_int4, unpack_int4_kernel,
    )

    w = rng.standard_normal((32, 16)).astype(np.float32)
    q4, s = quantize_kernel_int4(w)
    assert q4.shape == (32, 8) and q4.dtype == np.int8
    wd = np.asarray(unpack_int4_kernel(jnp.asarray(q4))) * s[None]
    # int4 symmetric error bounded by scale/2
    assert np.all(np.abs(wd - w) <= s[None] * 0.5 + 1e-6)


def test_int4_dense_and_whisper(rng):
    from whisper_trtllm_tpu.quantization import weight_only_quantize_int4

    cfg = WhisperConfig.testing()
    params = init_params(cfg, seed=0)
    q4params = weight_only_quantize_int4(params)
    assert q4params["decoder"]["layers"]["fc1"]["kernel_q4"].dtype == np.int8
    mel = rng.standard_normal(
        (1, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    tokens = rng.integers(0, cfg.vocab_size, (1, 5)).astype(np.int32)
    ref = np.asarray(decode_full(params, cfg, tokens,
                                 encode(params, cfg, jnp.asarray(mel))))
    q4p = jax.tree_util.tree_map(jnp.asarray, q4params)
    out = np.asarray(decode_full(q4p, cfg, tokens,
                                 encode(q4p, cfg, jnp.asarray(mel))))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.35  # int4 is coarse; bounded drift on a 2-layer model


class TestSmoothQuant:
    """SmoothQuant int8 act+weight path (analog of reference:
    tensorrt_llm/quantization/layer.py SmoothQuant*, models/quantized/
    quant.py:8 — GPT-only there, Whisper here)."""

    def _setup(self, rng):
        import jax.numpy as jnp

        from whisper_trtllm_tpu.config import WhisperConfig
        from whisper_trtllm_tpu.models.whisper import init_params
        from whisper_trtllm_tpu.models.whisper.model import decode_full, encode
        from whisper_trtllm_tpu.quantization.smooth import (
            smooth_quantize_whisper,
            whisper_act_stats,
        )

        cfg = WhisperConfig.testing()
        params = init_params(cfg, seed=0)
        mel = rng.standard_normal(
            (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)
        ).astype(np.float32)
        tokens = rng.integers(0, cfg.vocab_size, (2, 8)).astype(np.int32)
        stats = whisper_act_stats(params, cfg, jnp.asarray(mel), jnp.asarray(tokens))
        sq = smooth_quantize_whisper(params, stats)
        return cfg, params, sq, mel, tokens, encode, decode_full

    def test_logits_close_to_fp32(self, rng):
        import jax

        cfg, params, sq, mel, tokens, encode, decode_full = self._setup(rng)
        ref_enc = np.asarray(jax.jit(lambda p, m: encode(p, cfg, m))(params, mel))
        sq_enc = np.asarray(jax.jit(lambda p, m: encode(p, cfg, m))(sq, mel))
        # int8 act+weight: ~1% relative error budget on encoder states
        err = np.abs(sq_enc - ref_enc).max() / max(np.abs(ref_enc).max(), 1e-6)
        assert err < 0.05, err

        ref = np.asarray(jax.jit(
            lambda p, t, e: decode_full(p, cfg, t, e)
        )(params, tokens, ref_enc))
        out = np.asarray(jax.jit(
            lambda p, t, e: decode_full(p, cfg, t, e)
        )(sq, tokens, sq_enc))
        # greedy argmax agreement is the serving-relevant bar
        agree = (out.argmax(-1) == ref.argmax(-1)).mean()
        assert agree > 0.9, agree

    def test_tree_structure(self, rng):
        cfg, params, sq, *_ = self._setup(rng)
        lq = sq["decoder"]["layers"]["self_attn"]["q"]
        assert lq["kernel_sq"].dtype == np.int8
        assert lq["smooth"].shape == (cfg.decoder_layers, cfg.d_model)
        assert lq["scale"].shape == (cfg.decoder_layers, cfg.d_model)
        # untouched pieces stay float
        assert "kernel" in sq["encoder"]["conv1"]
        assert sq["decoder"]["embed_tokens"].dtype == np.float32

    def test_stats_shapes(self, rng):
        import jax.numpy as jnp

        from whisper_trtllm_tpu.config import WhisperConfig
        from whisper_trtllm_tpu.models.whisper import init_params
        from whisper_trtllm_tpu.quantization.smooth import whisper_act_stats

        cfg = WhisperConfig.testing()
        params = init_params(cfg, seed=0)
        mel = np.zeros((1, 2 * cfg.max_source_positions, cfg.num_mel_bins),
                       np.float32)
        tokens = np.zeros((1, 4), np.int32)
        stats = whisper_act_stats(params, cfg, jnp.asarray(mel),
                                  jnp.asarray(tokens))
        assert stats["encoder"]["fc2_in"].shape == (
            cfg.encoder_layers, cfg.encoder_ffn_dim)
        assert stats["decoder"]["cross_kv_in"].shape == (
            cfg.decoder_layers, cfg.d_model)


class TestVocabQuantization:
    """int8 tied-vocab-table path (the decode loop's largest single weight
    read; per-row scales factor out of the logits contraction)."""

    def test_logits_and_lookup_close(self, rng):
        import jax
        import jax.numpy as jnp

        from whisper_trtllm_tpu.config import WhisperConfig
        from whisper_trtllm_tpu.models.whisper import init_params
        from whisper_trtllm_tpu.models.whisper.model import decode_full, encode
        from whisper_trtllm_tpu.quantization import quantize_vocab_embedding

        cfg = WhisperConfig.testing()
        params = init_params(cfg, seed=0)
        qparams = quantize_vocab_embedding(params)
        assert qparams["decoder"]["embed_tokens"]["table_q"].dtype == np.int8
        mel = rng.standard_normal(
            (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)
        ).astype(np.float32)
        tokens = rng.integers(0, cfg.vocab_size, (2, 8)).astype(np.int32)
        enc = jax.jit(lambda p, m: encode(p, cfg, m))(params, mel)
        ref = np.asarray(jax.jit(
            lambda p, t, e: decode_full(p, cfg, t, e))(params, tokens, enc))
        out = np.asarray(jax.jit(
            lambda p, t, e: decode_full(p, cfg, t, e))(qparams, tokens, enc))
        rel = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6)
        assert rel < 0.02, rel
        agree = (out.argmax(-1) == ref.argmax(-1)).mean()
        assert agree > 0.95, agree

    def test_session_runs_with_quantized_vocab(self, rng):
        import jax

        from whisper_trtllm_tpu.config import (
            GenerationConfig,
            RuntimeConfig,
            WhisperConfig,
        )
        from whisper_trtllm_tpu.models.whisper import init_params
        from whisper_trtllm_tpu.runtime import WhisperSession

        cfg = WhisperConfig.testing()
        params = init_params(cfg, seed=0)
        sess = WhisperSession(
            params, cfg, GenerationConfig(max_new_tokens=6),
            RuntimeConfig(quantize_vocab=True, weight_dtype="int8"),
        )
        mel = rng.standard_normal(
            (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)
        ).astype(np.float32)
        tokens, lengths = sess.transcribe_features(mel)
        assert tokens.shape[0] == 2
        assert np.asarray(lengths).min() >= 1


def test_weight_only_quantize_covers_llama(rng):
    """The tree rewriter must hit every LLaMA projection (o/gate/up/down
    included) — the reference's weight_only_quantize covers all family
    linears (reference: tensorrt_llm/models/quantized/quant.py:51)."""
    import jax.numpy as jnp

    from whisper_trtllm_tpu.models.llama import LlamaConfig, forward, init_params
    from whisper_trtllm_tpu.quantization.quantize import weight_only_quantize

    cfg = LlamaConfig.testing()
    params = init_params(cfg, seed=0)
    qp = weight_only_quantize(params)
    for key in ("q", "k", "v", "o", "gate", "up", "down"):
        assert "kernel_q" in qp["layers"][key], key
    tokens = rng.integers(3, cfg.vocab_size, (2, 6)).astype(np.int32)
    ref = np.asarray(forward(params, cfg, tokens))
    got = np.asarray(forward(qp, cfg, tokens))
    # int8 per-channel weight quantization: logits close, argmax mostly equal
    assert np.mean(np.argmax(ref, -1) == np.argmax(got, -1)) > 0.8


# --------------------------------------------------------------------------
# FP8 (QuantMode.FP8_QDQ weights + FP8_KV_CACHE)
# --------------------------------------------------------------------------

def test_fp8_mode_flags():
    m = QuantMode.FP8_QDQ | QuantMode.FP8_KV_CACHE
    assert m.has_fp8_qdq() and m.has_fp8_kv_cache()
    assert m.has_kv_cache_quant()
    assert QuantMode.INT8_KV_CACHE.has_kv_cache_quant()
    assert not QuantMode.INT8_WEIGHTS.has_kv_cache_quant()


def test_fp8_kernel_roundtrip(rng):
    from whisper_trtllm_tpu.quantization import quantize_kernel_fp8

    w = rng.standard_normal((64, 32)).astype(np.float32)
    q, s = quantize_kernel_fp8(w)
    assert q.dtype == jnp.float8_e4m3fn and np.ndim(s) == 0
    wd = np.asarray(jnp.asarray(q).astype(jnp.float32)) * s
    # e4m3 keeps >=3 mantissa bits over most of the range: ~6% relative
    rel = np.abs(wd - w) / (np.abs(w) + 1e-6)
    assert np.median(rel) < 0.04 and rel.max() < 0.2


def test_fp8_dense_close(rng):
    from whisper_trtllm_tpu.quantization import quantize_dense_params_fp8

    p = {"kernel": rng.standard_normal((48, 16)).astype(np.float32),
         "bias": rng.standard_normal(16).astype(np.float32)}
    x = rng.standard_normal((4, 48)).astype(np.float32)
    ref = np.asarray(dense(p, jnp.asarray(x)))
    out = np.asarray(dense(
        jax.tree_util.tree_map(jnp.asarray, quantize_dense_params_fp8(p)),
        jnp.asarray(x),
    ))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.1


def test_fp8_whisper_decodes(rng):
    """fp8_quantize tree rewrite + full decode: kernels stored fp8, conv
    and embeddings untouched, early trajectory tracks float."""
    from whisper_trtllm_tpu.quantization import fp8_quantize

    cfg = WhisperConfig.testing()
    params = init_params(cfg, seed=0)
    qparams = fp8_quantize(params)
    lq = qparams["decoder"]["layers"]["self_attn"]["q"]
    assert lq["kernel_f8"].dtype == jnp.float8_e4m3fn
    assert "kernel" not in lq
    assert "kernel" in qparams["encoder"]["conv1"]

    mel = rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    ref, _ = transcribe_tokens(params, cfg, jnp.asarray(mel),
                               GenerationConfig(max_new_tokens=8))
    out, _ = transcribe_tokens(
        jax.tree_util.tree_map(jnp.asarray, qparams), cfg, jnp.asarray(mel),
        GenerationConfig(max_new_tokens=8),
    )
    assert np.asarray(out).shape == np.asarray(ref).shape
    np.testing.assert_array_equal(np.asarray(out)[:, :2],
                                  np.asarray(ref)[:, :2])


def test_fp8_kv_cache_decode(rng):
    """FP8_KV_CACHE mode end to end (kv_cache_dtype='fp8')."""
    cfg = WhisperConfig.testing()
    params = init_params(cfg, seed=0)
    mel = rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    ref, _ = transcribe_tokens(params, cfg, jnp.asarray(mel),
                               GenerationConfig(max_new_tokens=8))
    q8, _ = transcribe_tokens(
        params, cfg, jnp.asarray(mel),
        GenerationConfig(max_new_tokens=8, kv_cache_dtype="fp8"),
    )
    ref, q8 = np.asarray(ref), np.asarray(q8)
    assert ref.shape == q8.shape
    np.testing.assert_array_equal(q8[:, :3], ref[:, :3])


def test_fp8_kv_step_logits_close(rng):
    """fp8 cache step logits sit closer to float than int8's bound (e4m3
    has graceful relative error vs int8's uniform grid)."""
    from whisper_trtllm_tpu.models.whisper import (
        compute_cross_kv, decode_step_kv, init_self_kv, init_self_kv_quant,
        quantize_cross_kv,
    )
    from whisper_trtllm_tpu.models.whisper import encode as enc_fn

    cfg = WhisperConfig.testing()
    params = init_params(cfg, seed=0)
    mel = rng.standard_normal(
        (1, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    enc = enc_fn(params, cfg, jnp.asarray(mel))
    ck, cv = compute_cross_kv(params, cfg, enc)
    tok = jnp.asarray([1], jnp.int32)

    ref_logits, _ = decode_step_kv(
        params, cfg, tok, jnp.int32(0), init_self_kv(cfg, 1), (ck, cv))
    f8 = jnp.float8_e4m3fn
    q_logits, _ = decode_step_kv(
        params, cfg, tok, jnp.int32(0),
        init_self_kv_quant(cfg, 1, dtype=f8),
        quantize_cross_kv(ck, cv, f8))
    rel = np.abs(np.asarray(q_logits) - np.asarray(ref_logits)).max() / (
        np.abs(np.asarray(ref_logits)).max() + 1e-9
    )
    assert rel < 0.05


def test_kv_quant_dtype_rejects_unknown():
    from whisper_trtllm_tpu.runtime.generation import kv_quant_dtype

    assert kv_quant_dtype("auto") is None
    assert kv_quant_dtype("int8") == jnp.int8
    assert kv_quant_dtype("fp8") == jnp.float8_e4m3fn
    with pytest.raises(ValueError, match="kv_cache_dtype"):
        kv_quant_dtype("int4")


def test_fp8_session_weight_dtype(rng):
    """RuntimeConfig(weight_dtype='fp8'): kernels stay fp8 through the
    session's cast/placement chain and transcription runs."""
    from whisper_trtllm_tpu.config import RuntimeConfig
    from whisper_trtllm_tpu.runtime import WhisperSession

    cfg = WhisperConfig.testing()
    params = init_params(cfg, seed=0)
    sess = WhisperSession(
        params, cfg, GenerationConfig(max_new_tokens=6),
        RuntimeConfig(compute_dtype="bfloat16", weight_dtype="fp8"),
    )
    lq = sess.params["decoder"]["layers"]["self_attn"]["q"]
    assert lq["kernel_f8"].dtype == jnp.float8_e4m3fn
    mel = rng.standard_normal(
        (1, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    tokens, lengths = sess.transcribe_features(mel)
    assert tokens.shape[0] == 1 and lengths[0] >= 1


class TestSmoothQuantGPT:
    """SmoothQuant on the GPT family — the reference's actual smooth_quantize
    target (reference: tensorrt_llm/models/quantized/quant.py:8 rewrites GPT
    with SmoothQuant layer variants, tensorrt_llm/quantization/layer.py)."""

    def _setup(self, rng):
        import jax.numpy as jnp

        from whisper_trtllm_tpu.models.gpt.model import GPTConfig, init_params
        from whisper_trtllm_tpu.quantization.smooth import (
            gpt_act_stats,
            smooth_quantize_gpt,
        )

        cfg = GPTConfig.testing()
        params = init_params(cfg, seed=0)
        tokens = rng.integers(0, cfg.vocab_size, (2, 12)).astype(np.int32)
        stats = gpt_act_stats(params, cfg, jnp.asarray(tokens))
        sq = smooth_quantize_gpt(params, stats)
        return cfg, params, sq, tokens

    def test_logits_argmax_agreement(self, rng):
        import jax

        from whisper_trtllm_tpu.models.gpt.model import forward

        cfg, params, sq, tokens = self._setup(rng)
        ref = np.asarray(jax.jit(lambda p, t: forward(p, cfg, t))(params, tokens))
        out = np.asarray(jax.jit(lambda p, t: forward(p, cfg, t))(sq, tokens))
        err = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6)
        assert err < 0.05, err
        agree = (out.argmax(-1) == ref.argmax(-1)).mean()
        assert agree > 0.9, agree

    def test_generate_through_int8_path(self, rng):
        from whisper_trtllm_tpu.models.gpt.model import generate

        cfg, params, sq, _ = self._setup(rng)
        prompt = rng.integers(3, cfg.vocab_size, (2, 5)).astype(np.int32)
        ref = np.asarray(generate(params, cfg, prompt, max_new_tokens=6))
        out = np.asarray(generate(sq, cfg, prompt, max_new_tokens=6))
        assert out.shape == ref.shape
        # int8 act+weight with a well-conditioned random model: greedy
        # trajectories should mostly agree
        assert (out == ref).mean() > 0.7, (out, ref)

    def test_tree_structure(self, rng):
        cfg, params, sq, _ = self._setup(rng)
        lq = sq["layers"]["attn_qkv"]
        assert lq["kernel_sq"].dtype == np.int8
        assert lq["kernel_sq"].shape == (cfg.n_layer, cfg.d_model, 3 * cfg.d_model)
        assert lq["smooth"].shape == (cfg.n_layer, cfg.d_model)
        assert lq["scale"].shape == (cfg.n_layer, 3 * cfg.d_model)
        assert sq["layers"]["fc_out"]["smooth"].shape == (cfg.n_layer, cfg.ffn_dim)
        # untouched pieces stay float
        assert sq["wte"].dtype == np.float32
        assert "kernel" not in sq["layers"]["fc_in"]
