"""Word-list + penalty sampling ops (analogs of the reference's
banBadWords.cu, stopCriteriaKernels.cu, samplingPenaltyKernels.cu min-length
and Additive presence penalty) vs HF processors and end-to-end through the
shared causal-LM loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_trtllm_tpu.runtime.causal_lm import (
    generate_tokens,
    generate_tokens_ragged,
    make_sampling_cfg,
)
from whisper_trtllm_tpu.runtime.sampling import (
    apply_min_new_tokens,
    apply_presence_penalty,
    ban_bad_words,
    match_stop_words,
    pad_word_list,
)


def test_min_new_tokens_matches_hf(rng):
    import torch
    from transformers.generation.logits_process import (
        MinNewTokensLengthLogitsProcessor,
    )

    eos = 7
    prompt_len = 3
    logits = rng.standard_normal((2, 20)).astype(np.float32)
    for cur_len in (3, 4, 6, 8, 9):
        ids = torch.zeros((2, cur_len), dtype=torch.long)
        theirs = MinNewTokensLengthLogitsProcessor(
            prompt_length_to_skip=prompt_len, min_new_tokens=5,
            eos_token_id=eos,
        )(ids, torch.from_numpy(logits.copy())).numpy()
        gen_count = cur_len - prompt_len
        ours = np.asarray(apply_min_new_tokens(
            jnp.asarray(logits), jnp.int32(gen_count), 5, eos))
        np.testing.assert_array_equal(
            ours[:, eos] < -5e8, ~np.isfinite(theirs[:, eos]))
        mask = np.isfinite(theirs)
        np.testing.assert_allclose(ours[mask], theirs[mask], atol=1e-6)


def test_min_new_tokens_per_lane(rng):
    logits = rng.standard_normal((3, 10)).astype(np.float32)
    out = np.asarray(apply_min_new_tokens(
        jnp.asarray(logits), jnp.asarray([0, 3, 5], jnp.int32), 4, eos_token_id=2))
    assert out[0, 2] < -5e8 and out[1, 2] < -5e8
    assert out[2, 2] == pytest.approx(logits[2, 2])


def test_presence_penalty_subtracts_once(rng):
    logits = rng.standard_normal((2, 12)).astype(np.float32)
    buf = np.zeros((2, 6), np.int32)
    buf[0, :3] = [4, 4, 5]       # token 4 twice — penalized once, additively
    buf[1, :3] = [1, 2, 3]
    out = np.asarray(apply_presence_penalty(
        jnp.asarray(logits), jnp.asarray(buf), jnp.int32(2), 1.5))
    np.testing.assert_allclose(out[0, 4], logits[0, 4] - 1.5, atol=1e-6)
    np.testing.assert_allclose(out[0, 5], logits[0, 5] - 1.5, atol=1e-6)
    np.testing.assert_allclose(out[0, 6], logits[0, 6], atol=1e-6)
    np.testing.assert_allclose(out[1, 1], logits[1, 1] - 1.5, atol=1e-6)
    # tokens past pos are ignored (buf holds zeros there, but 0 at buf[0,0]?
    # buf[0] starts with 4 — token 0 only appears past pos in row 1's padding)
    np.testing.assert_allclose(out[0, 7:], logits[0, 7:], atol=1e-6)


def test_ban_bad_words_matches_hf(rng):
    import torch
    from transformers.generation.logits_process import (
        NoBadWordsLogitsProcessor,
    )

    bad = [[5], [7, 8], [1, 2, 3]]
    logits = rng.standard_normal((2, 15)).astype(np.float32)
    hists = [
        np.asarray([[0, 9, 7], [4, 1, 2]], np.int32),   # row0 → ban 8; row1 → ban 3
        np.asarray([[6, 6, 6], [7, 8, 7]], np.int32),   # row1 ends ...,7 → ban 8
    ]
    for hist in hists:
        theirs = NoBadWordsLogitsProcessor(bad, eos_token_id=None)(
            torch.from_numpy(hist.astype(np.int64)),
            torch.from_numpy(logits.copy()),
        ).numpy()
        buf = np.full((2, 8), 11, np.int32)
        buf[:, :3] = hist
        ours = np.asarray(ban_bad_words(
            jnp.asarray(logits), jnp.asarray(buf), jnp.int32(2),
            pad_word_list(bad)))
        np.testing.assert_array_equal(ours < -5e8, ~np.isfinite(theirs))
        mask = np.isfinite(theirs)
        np.testing.assert_allclose(ours[mask], theirs[mask], atol=1e-6)


def test_ban_bad_words_short_context():
    # context shorter than the word prefix must not match (and must not
    # read out of bounds via the clipped gather)
    logits = jnp.zeros((1, 10), jnp.float32)
    buf = jnp.asarray([[1, 2, 0, 0]], jnp.int32)
    out = np.asarray(ban_bad_words(
        logits, buf, jnp.int32(0), pad_word_list([[2, 1, 2, 3]])))
    assert np.isfinite(out).all() or (out > -5e8).all()


def test_match_stop_words():
    words = pad_word_list([[4, 5], [9]])
    buf = jnp.asarray([
        [1, 4, 5, 0],    # ends 4,5 at pos 2 → stop
        [4, 5, 6, 0],    # ends 6 → no
        [2, 3, 9, 0],    # ends 9 → stop (single token)
    ], jnp.int32)
    got = np.asarray(match_stop_words(buf, jnp.int32(2), words))
    np.testing.assert_array_equal(got, [True, False, True])
    # per-lane positions
    got = np.asarray(match_stop_words(
        buf, jnp.asarray([2, 1, 1], jnp.int32), words))
    np.testing.assert_array_equal(got, [True, True, False])
    # window longer than written context never matches
    got = np.asarray(match_stop_words(buf[:, :1], jnp.int32(0), words))
    np.testing.assert_array_equal(got, [False, False, False])


# --- end-to-end through the shared loop: a deterministic toy model whose
# next token is (cur + 1) % V, with V=10 ---

_V, _EOS = 10, 3


def _toy_fns():
    def step(params, tok, pos, ck, cv):
        logits = jax.nn.one_hot((tok + 1) % _V, _V, dtype=jnp.float32) * 10.0
        return logits, ck, cv

    def prefill(params, tokens, ck, cv):
        return step(params, tokens[:, -1], None, ck, cv)

    def prefill_ragged(params, tokens, lens, ck, cv):
        last = tokens[jnp.arange(tokens.shape[0]), lens - 1]
        return step(params, last, None, ck, cv)

    return prefill, prefill_ragged, step


def _gen(sc, prompt=((_V - 2, _V - 1),), max_len=16):
    prefill, _, step = _toy_fns()
    out = generate_tokens(
        prefill, step, {}, jnp.asarray(prompt, jnp.int32),
        cache_shape=(1,), prompt_len=len(prompt[0]), max_len=max_len,
        eos_token_id=_EOS, sampling_cfg=sc)
    return np.asarray(out)


def test_loop_greedy_baseline():
    # 8,9 → 0,1,2,3(eos)
    out = _gen(None)
    np.testing.assert_array_equal(out[0, :6], [8, 9, 0, 1, 2, 3])
    assert (out[0, 6:] == _EOS).all()


def test_loop_min_new_tokens_delays_eos():
    out = _gen(make_sampling_cfg(min_new_tokens=6))
    gen = out[0, 2:]
    # first 6 generated tokens contain no eos
    assert (gen[:6] != _EOS).all()
    # 3 banned → its one-hot spike is -inf → remaining logits all tie at 0 →
    # argmax picks index 0
    np.testing.assert_array_equal(gen[:4], [0, 1, 2, 0])


def test_loop_bad_words_never_generated():
    # ban single token 1: sequence 8,9,0,(1 banned → 0-logit tie → argmax 0?
    # one-hot at 1 is banned → all remaining 0 → picks 0) — just assert 1 absent
    out = _gen(make_sampling_cfg(bad_words=[[1]]))
    assert not (out[0, 2:] == 1).any()
    # ban pair [9, 0]: after 9, 0 must not follow
    out = _gen(make_sampling_cfg(bad_words=[[9, 0]]))
    gen = out[0]
    for i in range(len(gen) - 1):
        assert not (gen[i] == 9 and gen[i + 1] == 0)


def test_loop_stop_words_halt():
    out = _gen(make_sampling_cfg(stop_words=[[0, 1]]), max_len=12)
    # generates 0,1 then stops: everything after is eos padding
    np.testing.assert_array_equal(out[0, :4], [8, 9, 0, 1])
    assert (out[0, 4:] == _EOS).all()


def test_ragged_loop_word_rules():
    _, prefill_ragged, step = _toy_fns()
    prompt = np.full((2, 3), _EOS, np.int32)
    prompt[0, :3] = [7, 8, 9]
    prompt[1, :1] = [4]
    lens = jnp.asarray([3, 1], jnp.int32)
    sc = make_sampling_cfg(stop_words=[[6, 7]], min_new_tokens=2)
    out = np.asarray(generate_tokens_ragged(
        prefill_ragged, step, {}, jnp.asarray(prompt), lens,
        cache_shape=(1,), max_new_tokens=8, eos_token_id=_EOS,
        sampling_cfg=sc))
    # row 0: 7,8,9 → 0,1,2,(3 banned by min_new? gen_count at candidate 3 is
    # already 3 ≥ 2 → eos allowed) → 3
    np.testing.assert_array_equal(out[0, 3:7], [0, 1, 2, 3])
    # row 1: 4 → 5,6,7 — stop word [6,7] fires right after the 7
    np.testing.assert_array_equal(out[1, 1:4], [5, 6, 7])
    assert (out[1, 4:] == _EOS).all()
