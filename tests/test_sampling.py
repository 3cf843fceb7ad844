"""Sampling ops vs HF logits warpers (analog of the reference's sampling
kernel tests) + end-to-end sampled decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_trtllm_tpu.runtime.sampling import (
    apply_repetition_penalty,
    sample_token,
    top_k_filter,
    top_p_filter,
)


def test_top_k_matches_hf(rng):
    import torch
    from transformers.generation.logits_process import TopKLogitsWarper

    logits = rng.standard_normal((3, 50)).astype(np.float32)
    theirs = TopKLogitsWarper(top_k=5)(
        None, torch.from_numpy(logits.copy())
    ).numpy()
    ours = np.asarray(top_k_filter(jnp.asarray(logits), 5))
    np.testing.assert_array_equal(np.isfinite(ours) & (ours > -5e8),
                                  np.isfinite(theirs))
    mask = np.isfinite(theirs)
    np.testing.assert_allclose(ours[mask], theirs[mask], atol=1e-6)


def test_top_p_matches_hf(rng):
    import torch
    from transformers.generation.logits_process import TopPLogitsWarper

    logits = rng.standard_normal((4, 40)).astype(np.float32) * 2
    theirs = TopPLogitsWarper(top_p=0.8)(
        None, torch.from_numpy(logits.copy())
    ).numpy()
    ours = np.asarray(top_p_filter(jnp.asarray(logits), 0.8))
    np.testing.assert_array_equal(ours > -5e8, np.isfinite(theirs))
    mask = np.isfinite(theirs)
    np.testing.assert_allclose(ours[mask], theirs[mask], atol=1e-6)


def test_repetition_penalty_matches_hf(rng):
    import torch
    from transformers.generation.logits_process import (
        RepetitionPenaltyLogitsProcessor,
    )

    logits = rng.standard_normal((2, 30)).astype(np.float32)
    hist = np.asarray([[1, 5, 9], [2, 2, 7]], np.int32)
    theirs = RepetitionPenaltyLogitsProcessor(1.3)(
        torch.from_numpy(hist.astype(np.int64)),
        torch.from_numpy(logits.copy()),
    ).numpy()
    buf = np.zeros((2, 8), np.int32)
    buf[:, :3] = hist
    ours = np.asarray(
        apply_repetition_penalty(
            jnp.asarray(logits), jnp.asarray(buf), jnp.int32(2), 1.3
        )
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_sample_token_greedy_path(rng):
    logits = rng.standard_normal((3, 20)).astype(np.float32)
    out = sample_token(jax.random.PRNGKey(0), jnp.asarray(logits))
    np.testing.assert_array_equal(np.asarray(out), logits.argmax(-1))


def test_sample_token_respects_top_k(rng):
    logits = rng.standard_normal((2, 20)).astype(np.float32)
    allowed = set(np.argsort(logits, axis=-1)[:, -3:].reshape(-1).tolist())
    for s in range(20):
        out = np.asarray(
            sample_token(jax.random.PRNGKey(s), jnp.asarray(logits),
                         temperature=1.5, top_k=3)
        )
        # sampled ids must be within each row's top-3
        for b in range(2):
            top3 = set(np.argsort(logits[b])[-3:].tolist())
            assert int(out[b]) in top3


def test_sampled_whisper_decode_runs(rng):
    from whisper_trtllm_tpu.config import GenerationConfig, WhisperConfig
    from whisper_trtllm_tpu.models.whisper import init_params
    from whisper_trtllm_tpu.runtime.generation import transcribe_tokens

    cfg = WhisperConfig.testing()
    params = init_params(cfg, seed=0)
    mel = rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    t1, _ = transcribe_tokens(
        params, cfg, jnp.asarray(mel),
        GenerationConfig(max_new_tokens=8, temperature=1.2, top_k=5, seed=1),
    )
    t2, _ = transcribe_tokens(
        params, cfg, jnp.asarray(mel),
        GenerationConfig(max_new_tokens=8, temperature=1.2, top_k=5, seed=1),
    )
    # deterministic given the seed
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    # forced + suppress still honored under sampling
    tok = np.asarray(t1)
    assert (tok[:, 1] == 11).all()
    for t in cfg.suppress_tokens:
        assert not (tok == t).any()


def test_alibi_matches_hf_bloom():
    import torch
    from transformers.models.bloom.modeling_bloom import build_alibi_tensor

    from whisper_trtllm_tpu.ops.functional import alibi_bias

    for h in (4, 6, 8, 16):
        ours = np.asarray(alibi_bias(h, 12))[0, :, 0, :]
        theirs = build_alibi_tensor(
            torch.ones(1, 12), h, torch.float32
        ).numpy().reshape(h, 1, 12)[:, 0, :]
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_mish_and_group_norm_match_torch(rng):
    import torch

    from whisper_trtllm_tpu.ops.functional import group_norm, mish

    x = rng.standard_normal((2, 6, 8)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(mish(jnp.asarray(x))),
        torch.nn.functional.mish(torch.from_numpy(x)).numpy(), atol=1e-6,
    )
    gn = torch.nn.GroupNorm(2, 8)
    ref = gn(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy().transpose(0, 2, 1)
    ours = np.asarray(group_norm(
        {"scale": gn.weight.detach().numpy(), "bias": gn.bias.detach().numpy()},
        jnp.asarray(x), 2,
    ))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_prompt_tuning_embedding(rng):
    from whisper_trtllm_tpu.ops.functional import prompt_tuning_embedding

    table = rng.standard_normal((10, 4)).astype(np.float32)
    ptable = rng.standard_normal((3, 4)).astype(np.float32)
    ids = np.asarray([[1, 9, 10, 12]], np.int32)  # 10,12 → prompt slots 0,2
    out = np.asarray(prompt_tuning_embedding(
        jnp.asarray(table), jnp.asarray(ptable), jnp.asarray(ids)))
    np.testing.assert_array_equal(out[0, 0], table[1])
    np.testing.assert_array_equal(out[0, 1], table[9])
    np.testing.assert_array_equal(out[0, 2], ptable[0])
    np.testing.assert_array_equal(out[0, 3], ptable[2])


def test_gather_last_token_logits(rng):
    """Ragged context-phase gather (reference: tensorrt_llm/functional.py:3316)."""
    from whisper_trtllm_tpu.ops.functional import gather_last_token_logits

    x = rng.standard_normal((3, 7, 5)).astype(np.float32)
    lens = np.array([1, 7, 4], np.int32)
    out = np.asarray(gather_last_token_logits(x, lens))
    for b, l in enumerate(lens):
        np.testing.assert_array_equal(out[b], x[b, l - 1])
