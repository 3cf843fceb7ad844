"""Pallas kernels vs XLA reference ops (interpret mode on CPU) — the
reference's op-test tier (reference: tests/functional/, tests/attention/
test_bert_attention.py:36-150)."""

import jax.numpy as jnp
import numpy as np
import pytest

from whisper_trtllm_tpu.ops.attention import mha, mha_decode_step
from whisper_trtllm_tpu.ops.pallas.decode_attention import decode_mha
from whisper_trtllm_tpu.ops.pallas.flash_attention import flash_mha


@pytest.mark.parametrize("b,h,s,t,dh", [(2, 4, 128, 128, 64), (1, 2, 200, 200, 64)])
def test_flash_mha_matches_xla(rng, b, h, s, t, dh):
    q = rng.standard_normal((b, h, s, dh)).astype(np.float32) * 0.3
    k = rng.standard_normal((b, h, t, dh)).astype(np.float32) * 0.3
    v = rng.standard_normal((b, h, t, dh)).astype(np.float32)
    ref = np.asarray(mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    out = np.asarray(
        flash_mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("valid_len", [1, 7, 16])
def test_decode_mha_matches_xla(rng, valid_len):
    b, h, t, dh = 2, 4, 16, 64
    q = rng.standard_normal((b, h, 1, dh)).astype(np.float32) * 0.3
    ck = rng.standard_normal((b, h, t, dh)).astype(np.float32) * 0.3
    cv = rng.standard_normal((b, h, t, dh)).astype(np.float32)
    ref = np.asarray(
        mha_decode_step(
            jnp.asarray(q), jnp.asarray(ck), jnp.asarray(cv), jnp.int32(valid_len)
        )
    )
    out = np.asarray(
        decode_mha(
            jnp.asarray(q), jnp.asarray(ck), jnp.asarray(cv),
            jnp.int32(valid_len), interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_flash_mha_bf16(rng):
    b, h, s, dh = 1, 2, 128, 64
    q = (rng.standard_normal((b, h, s, dh)) * 0.3).astype(jnp.bfloat16)
    k = (rng.standard_normal((b, h, s, dh)) * 0.3).astype(jnp.bfloat16)
    v = rng.standard_normal((b, h, s, dh)).astype(jnp.bfloat16)
    ref = np.asarray(mha(q, k, v).astype(jnp.float32))
    out = np.asarray(flash_mha(q, k, v, interpret=True).astype(jnp.float32))
    np.testing.assert_allclose(out, ref, atol=3e-2, rtol=3e-2)


def test_layer_norm_fused_matches_xla(rng):
    from whisper_trtllm_tpu.ops.functional import layer_norm
    from whisper_trtllm_tpu.ops.pallas.layer_norm import layer_norm_fused

    x = rng.standard_normal((2, 100, 64)).astype(np.float32)
    scale = rng.standard_normal(64).astype(np.float32)
    bias = rng.standard_normal(64).astype(np.float32)
    ref = np.asarray(layer_norm({"scale": scale, "bias": bias}, jnp.asarray(x)))
    out = np.asarray(
        layer_norm_fused(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
                         interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_stft_kernel_matches_jnp(rng):
    """Pallas fused STFT+mel+log vs the jnp block-matmul formulation."""
    from whisper_trtllm_tpu.audio.features import LogMelSpectrogram, HOP_LENGTH, N_FREQ_BINS
    from whisper_trtllm_tpu.ops.pallas.stft import stft_log_mel

    fe = LogMelSpectrogram(80)
    n_rows = 300 + 2                         # 300 frames (short test signal)
    audio_blocks = rng.standard_normal(
        (2, n_rows, HOP_LENGTH)).astype(np.float32) * 0.1

    # jnp reference: same math as features.py up to the log
    frames = np.concatenate(
        [audio_blocks[:, :-2], audio_blocks[:, 1:-1], audio_blocks[:, 2:]],
        axis=-1)
    spec = np.einsum("btn,nf->btf", frames, np.asarray(fe.dft_basis))
    power = spec[..., :N_FREQ_BINS] ** 2 + spec[..., N_FREQ_BINS:] ** 2
    ref = np.log10(np.maximum(power @ np.asarray(fe.mel_fb), 1e-10))

    out = np.asarray(stft_log_mel(
        jnp.asarray(audio_blocks), fe.dft_basis, fe.mel_fb, interpret=True))
    assert out.shape == (2, 300, 80)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_cross_decode_mha_matches_xla(rng):
    from whisper_trtllm_tpu.ops.pallas.cross_attention import cross_decode_mha

    b, h, t, dh = 2, 4, 24, 16
    valid = 20
    q = rng.standard_normal((b, h, 1, dh)).astype(np.float32) * 0.3
    ck = rng.standard_normal((b, h, t, dh)).astype(np.float32) * 0.3
    cv = rng.standard_normal((b, h, t, dh)).astype(np.float32)
    ref = np.asarray(mha_decode_step(
        jnp.asarray(q), jnp.asarray(ck), jnp.asarray(cv), jnp.int32(valid)))
    # head-contiguous layout: (B, T, H*dh)
    q2 = q[:, :, 0].reshape(b, h * dh)
    k2 = ck.transpose(0, 2, 1, 3).reshape(b, t, h * dh)
    v2 = cv.transpose(0, 2, 1, 3).reshape(b, t, h * dh)
    out = np.asarray(cross_decode_mha(
        jnp.asarray(q2), jnp.asarray(k2), jnp.asarray(v2),
        heads=h, head_dim=dh, valid_len=valid, interpret=True))
    ref2 = ref[:, :, 0].reshape(b, h * dh)
    np.testing.assert_allclose(out, ref2, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("b,h,s,t,dh", [(2, 3, 128, 128, 64), (1, 2, 150, 150, 64)])
def test_flash_mha_grad_matches_xla(rng, b, h, s, t, dh):
    """Custom-VJP backward kernel vs jax.grad through the jnp path — lets
    the training step keep the fused kernel enabled (the reference trains
    nothing; this exceeds its parity bar)."""
    import jax

    q = rng.standard_normal((b, h, s, dh)).astype(np.float32) * 0.3
    k = rng.standard_normal((b, h, t, dh)).astype(np.float32) * 0.3
    v = rng.standard_normal((b, h, t, dh)).astype(np.float32)
    w = rng.standard_normal((b, h, s, dh)).astype(np.float32)

    def loss_ref(q, k, v):
        return jnp.sum(mha(q, k, v) * w)

    def loss_pal(q, k, v):
        return jnp.sum(flash_mha(q, k, v, interpret=True) * w)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    gp = jax.grad(loss_pal, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5, rtol=1e-4)


class TestFusedDecoderLayerStep:
    """Whole-layer fused decode kernel (ops/pallas/fused_decoder_step.py)
    vs the XLA layer math of models.whisper.decode_step_kv."""

    def _layer(self, rng, d=64, heads=4, ffn=128):
        from whisper_trtllm_tpu.layers.init import (
            init_attention, init_dense, init_layer_norm)

        r = np.random.default_rng(3)
        return {
            "self_attn_layer_norm": init_layer_norm(d),
            "self_attn": init_attention(r, d),
            "encoder_attn_layer_norm": init_layer_norm(d),
            "encoder_attn": init_attention(r, d),
            "final_layer_norm": init_layer_norm(d),
            "fc1": init_dense(r, d, ffn),
            "fc2": init_dense(r, ffn, d),
        }

    def _reference(self, lp, x, pos, sk, sv, ck, cv, enc_len, heads):
        """The exact decode_step_kv float-path layer body."""
        import jax

        from whisper_trtllm_tpu.layers.transformer import (
            attention_qkv, merge_heads)
        from whisper_trtllm_tpu.models.whisper.model import cross_attention_q
        from whisper_trtllm_tpu.ops.attention import (
            mha_decode_step, update_kv_cache)
        from whisper_trtllm_tpu.ops.functional import dense, layer_norm
        from whisper_trtllm_tpu.layers.transformer import mlp_block

        h = layer_norm(lp["self_attn_layer_norm"], x)
        q, k_new, v_new = attention_qkv(lp["self_attn"], h, None, heads)
        sk, sv = update_kv_cache(sk, sv, k_new, v_new, pos)
        a = mha_decode_step(q, sk, sv, pos + 1)
        x = x + dense(lp["self_attn"]["out"], merge_heads(a))
        h = layer_norm(lp["encoder_attn_layer_norm"], x)
        qc = cross_attention_q(lp, h, heads)
        a = mha_decode_step(qc, ck, cv, enc_len)
        x = x + dense(lp["encoder_attn"]["out"], merge_heads(a))
        h = layer_norm(lp["final_layer_norm"], x)
        x = x + mlp_block(lp, h)
        return x, sk, sv

    @pytest.mark.parametrize("pos,enc_frac", [(0, 0.97), (5, 1.0), (14, 0.5)])
    def test_matches_xla_layer(self, rng, pos, enc_frac):
        import jax

        from whisper_trtllm_tpu.layers.transformer import split_heads
        from whisper_trtllm_tpu.ops.attention import update_kv_cache
        from whisper_trtllm_tpu.ops.functional import dense, layer_norm
        from whisper_trtllm_tpu.ops.pallas.fused_decoder_step import (
            fused_decoder_layer_step)

        from whisper_trtllm_tpu.ops.pallas.fused_decoder_step import (
            CROSS_BLOCK)

        b, d, heads, ffn, ts = 2, 64, 4, 128, 16
        tc = 2 * CROSS_BLOCK
        enc_len = max(1, int(tc * enc_frac))
        dh = d // heads
        lp = self._layer(rng, d, heads, ffn)
        x = rng.standard_normal((b, 1, d)).astype(np.float32) * 0.5
        sk = rng.standard_normal((b, heads, ts, dh)).astype(np.float32) * 0.3
        sv = rng.standard_normal((b, heads, ts, dh)).astype(np.float32)
        ck = rng.standard_normal((b, heads, tc, dh)).astype(np.float32) * 0.3
        cv = rng.standard_normal((b, heads, tc, dh)).astype(np.float32)
        posj = jnp.int32(pos)

        ref_x, ref_sk, ref_sv = self._reference(
            lp, jnp.asarray(x), posj, jnp.asarray(sk), jnp.asarray(sv),
            jnp.asarray(ck), jnp.asarray(cv), jnp.int32(enc_len), heads)

        # fused path: LN1 + K/V append outside, kernel for the rest
        h = layer_norm(lp["self_attn_layer_norm"], jnp.asarray(x))
        k_new = split_heads(dense(lp["self_attn"]["k"], h), heads)
        v_new = split_heads(dense(lp["self_attn"]["v"], h), heads)
        sk2, sv2 = update_kv_cache(jnp.asarray(sk), jnp.asarray(sv),
                                   k_new, v_new, posj)
        out = fused_decoder_layer_step(
            jnp.asarray(x)[:, 0], h[:, 0], posj, lp, sk2, sv2,
            jnp.asarray(ck), jnp.asarray(cv), enc_len, interpret=True)

        np.testing.assert_allclose(np.asarray(sk2), np.asarray(ref_sk),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_x)[:, 0],
                                   atol=3e-5, rtol=1e-4)

    def test_decode_step_kv_fused_parity(self, rng, monkeypatch):
        """Full decode_step_kv with the fused path force-enabled (interpret
        mode) equals the XLA path — the whole-model integration check."""
        import functools

        import jax

        from whisper_trtllm_tpu import config as cfgmod
        from whisper_trtllm_tpu.models.whisper import init_params
        from whisper_trtllm_tpu.models.whisper import model as wmodel
        from whisper_trtllm_tpu.ops import pallas as pk

        cfg = cfgmod.WhisperConfig.testing()
        params = init_params(cfg, seed=0)
        b = 2
        enc = rng.standard_normal(
            (b, cfg.max_source_positions, cfg.d_model)).astype(np.float32)
        # XLA reference
        ck, cv = wmodel.compute_cross_kv(params, cfg, jnp.asarray(enc))
        sk, sv = wmodel.init_self_kv(cfg, b, 16)
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (b,)), jnp.int32)
        ref_logits, (ref_sk, ref_sv) = wmodel.decode_step_kv(
            params, cfg, toks, jnp.int32(3), (sk, sv), (ck, cv))

        # force-enable the fused path in interpret mode; pad cross to the
        # kernel's block multiple the way compute_cross_kv would on TPU
        from whisper_trtllm_tpu.ops.pallas.fused_decoder_step import (
            CROSS_BLOCK, fused_decoder_layer_step)

        pad = (-ck.shape[3]) % CROSS_BLOCK
        ckp = jnp.pad(ck, [(0, 0)] * 3 + [(0, pad), (0, 0)])
        cvp = jnp.pad(cv, [(0, 0)] * 3 + [(0, pad), (0, 0)])
        monkeypatch.setattr(pk, "fused_decode_enabled", lambda: True)
        monkeypatch.setattr(pk, "fused_layer_supported",
                            lambda *a, **k: True)
        monkeypatch.setattr(
            pk, "fused_decoder_layer_step",
            functools.partial(fused_decoder_layer_step, interpret=True))
        out_logits, (out_sk, out_sv) = wmodel.decode_step_kv(
            params, cfg, toks, jnp.int32(3), (sk, sv), (ckp, cvp))

        np.testing.assert_allclose(np.asarray(out_sk), np.asarray(ref_sk),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(out_logits),
                                   np.asarray(ref_logits),
                                   atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("s", [64, 200])
def test_flash_mha_causal_matches_xla(rng, s):
    """Causal flash (the context-FMHA causal variant): exact parity with
    the XLA causal path, including non-block-aligned S."""
    b, h, dh = 2, 3, 64
    q = rng.standard_normal((b, h, s, dh)).astype(np.float32) * 0.3
    k = rng.standard_normal((b, h, s, dh)).astype(np.float32) * 0.3
    v = rng.standard_normal((b, h, s, dh)).astype(np.float32)
    ref = np.asarray(mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                         causal=True, use_flash=False))
    out = np.asarray(flash_mha(jnp.asarray(q), jnp.asarray(k),
                               jnp.asarray(v), causal=True, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_flash_mha_causal_grad_matches_xla(rng):
    import jax

    b, h, s, dh = 1, 2, 128, 64
    q = rng.standard_normal((b, h, s, dh)).astype(np.float32) * 0.3
    k = rng.standard_normal((b, h, s, dh)).astype(np.float32) * 0.3
    v = rng.standard_normal((b, h, s, dh)).astype(np.float32)

    def loss_ref(q, k, v):
        return (mha(q, k, v, causal=True, use_flash=False) ** 2).sum()

    def loss_flash(q, k, v):
        return (flash_mha(q, k, v, causal=True, interpret=True) ** 2).sum()

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("hkv,causal", [(1, False), (2, True)])
def test_flash_mha_gqa_matches_xla(rng, hkv, causal):
    """MQA/GQA flash: kv heads shared across q-head groups through the
    block index map — parity with the XLA repeat-heads path."""
    b, h, s, dh = 2, 4, 128, 64
    q = rng.standard_normal((b, h, s, dh)).astype(np.float32) * 0.3
    k = rng.standard_normal((b, hkv, s, dh)).astype(np.float32) * 0.3
    v = rng.standard_normal((b, hkv, s, dh)).astype(np.float32)
    ref = np.asarray(mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                         causal=causal, use_flash=False))
    out = np.asarray(flash_mha(jnp.asarray(q), jnp.asarray(k),
                               jnp.asarray(v), causal=causal,
                               interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_flash_mha_gqa_grad_matches_xla(rng):
    """GQA backward: dk/dv accumulate across the q-heads sharing each kv
    head (the first-visit init condition)."""
    import jax

    b, h, hkv, s, dh = 1, 4, 2, 128, 64
    q = rng.standard_normal((b, h, s, dh)).astype(np.float32) * 0.3
    k = rng.standard_normal((b, hkv, s, dh)).astype(np.float32) * 0.3
    v = rng.standard_normal((b, hkv, s, dh)).astype(np.float32)

    def loss_ref(q, k, v):
        return (mha(q, k, v, causal=True, use_flash=False) ** 2).sum()

    def loss_flash(q, k, v):
        return (flash_mha(q, k, v, causal=True, interpret=True) ** 2).sum()

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for a, b_ in zip(gf, gr):
        assert a.shape == b_.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=1e-3)
