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
