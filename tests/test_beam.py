"""Beam-search parity vs HF torch beam search on tiny random models
(analog of reference beam coverage via C++ kernels + generation.py:898-975)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_trtllm_tpu.config import GenerationConfig, WhisperConfig
from whisper_trtllm_tpu.models.whisper import convert_hf_model, encode
from whisper_trtllm_tpu.runtime.beam import beam_decode


# function-scoped: HF generate() mutates the model's generation_config, so a
# shared model gives different (truncated/stripped) outputs on the 2nd call
@pytest.fixture()
def hf_pair():
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    torch.manual_seed(3)
    hf_cfg = HFConfig(
        vocab_size=53,
        num_mel_bins=8,
        d_model=24,
        encoder_layers=2,
        encoder_attention_heads=4,
        decoder_layers=2,
        decoder_attention_heads=4,
        encoder_ffn_dim=48,
        decoder_ffn_dim=48,
        max_source_positions=12,
        max_target_positions=12,
        decoder_start_token_id=1,
        eos_token_id=2,
        pad_token_id=0,
        bos_token_id=1,
        suppress_tokens=[],
        begin_suppress_tokens=[],
    )
    hf = WhisperForConditionalGeneration(hf_cfg).eval()
    params, cfg = convert_hf_model(hf)
    return hf, params, cfg


@pytest.mark.parametrize("num_beams", [2, 4])
def test_beam_matches_hf(hf_pair, rng, num_beams):
    import torch

    hf, params, cfg = hf_pair
    mel = rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)

    max_new = cfg.max_target_positions - 2
    with torch.no_grad():
        theirs = hf.generate(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
            max_new_tokens=max_new,
            num_beams=num_beams,
            do_sample=False,
            length_penalty=1.0,
            early_stopping=True,
        ).numpy()

    enc = jax.jit(lambda p, m: encode(p, cfg, m))(params, mel)
    tokens, scores, lengths = beam_decode(
        params, cfg, enc,
        GenerationConfig(max_new_tokens=max_new, num_beams=num_beams),
    )
    tokens, lengths = np.asarray(tokens), np.asarray(lengths)

    def normalize(seq):
        # HF whisper generate post-processes its output (strips the
        # decoder_start prompt and trailing EOS/pad); compare core content
        seq = np.asarray(seq)
        if len(seq) and seq[0] == cfg.decoder_start_token_id:
            seq = seq[1:]
        while len(seq) and seq[-1] in (cfg.pad_token_id, cfg.eos_token_id):
            seq = seq[:-1]
        return seq

    for b in range(mel.shape[0]):
        ours_b = normalize(tokens[b, 0, : lengths[b, 0]])
        theirs_b = normalize(theirs[b])
        np.testing.assert_array_equal(ours_b, theirs_b)


def test_beam_scores_sorted_and_finite(hf_pair, rng):
    hf, params, cfg = hf_pair
    mel = rng.standard_normal(
        (3, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    enc = jax.jit(lambda p, m: encode(p, cfg, m))(params, mel)
    tokens, scores, lengths = beam_decode(
        params, cfg, enc, GenerationConfig(max_new_tokens=8, num_beams=3)
    )
    scores = np.asarray(scores)
    assert (np.diff(scores, axis=1) <= 1e-6).all()  # best-first
    assert np.isfinite(scores[:, 0]).all()


def test_beam_int8_kv_runs(hf_pair, rng):
    """Beam search with int8 KV caches stays on the float trajectory early
    and returns sorted finite scores."""
    hf, params, cfg = hf_pair
    mel = rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    enc = jax.jit(lambda p, m: encode(p, cfg, m))(params, mel)
    tokens_f, scores_f, _ = beam_decode(
        params, cfg, enc, GenerationConfig(max_new_tokens=8, num_beams=3)
    )
    tokens_q, scores_q, _ = beam_decode(
        params, cfg, enc,
        GenerationConfig(max_new_tokens=8, num_beams=3, kv_cache_dtype="int8"),
    )
    assert np.isfinite(np.asarray(scores_q)[:, 0]).all()
    np.testing.assert_array_equal(
        np.asarray(tokens_q)[:, 0, :3], np.asarray(tokens_f)[:, 0, :3]
    )


def test_beam_eos_candidates_never_continue(hf_pair, rng):
    """An EOS candidate outside the top-K of the 2K expansion must be
    dropped, never expanded (HF skips it from both pools) — exercised by a
    wide beam over several batches so multiple parents propose EOS in the
    same step."""
    import torch

    hf, params, cfg = hf_pair
    mel = rng.standard_normal(
        (3, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    max_new = cfg.max_target_positions - 2
    with torch.no_grad():
        theirs = hf.generate(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
            max_new_tokens=max_new, num_beams=6, do_sample=False,
            length_penalty=1.0, early_stopping=True,
        ).numpy()
    enc = jax.jit(lambda p, m: encode(p, cfg, m))(params, mel)
    tokens, _, lengths = beam_decode(
        params, cfg, enc,
        GenerationConfig(max_new_tokens=max_new, num_beams=6),
    )
    tokens, lengths = np.asarray(tokens), np.asarray(lengths)

    def norm(seq):
        seq = [t for t in np.asarray(seq).tolist()
               if t not in (cfg.decoder_start_token_id, cfg.eos_token_id,
                            cfg.pad_token_id)]
        return seq

    for b in range(3):
        ours = tokens[b, 0, : lengths[b, 0]]
        assert norm(ours) == norm(theirs[b]), (ours, theirs[b])
    # no interior EOS in any returned hypothesis (the leak symptom)
    for b in range(3):
        for kk in range(6):
            row = tokens[b, kk, : lengths[b, kk]]
            interior = row[:-1] if len(row) else row
            assert (interior != cfg.eos_token_id).all()


@pytest.mark.parametrize(
    "early_stopping,length_penalty",
    [(False, 1.0), (False, 2.0), ("never", 2.0)],
)
def test_beam_early_stopping_modes_match_hf(
        hf_pair, rng, early_stopping, length_penalty):
    """Continued-search semantics (HF early_stopping=False / "never"): the
    lane keeps searching while the best running beam could still beat the
    worst finished hypothesis; tokens AND sequence scores must match HF
    exactly (VERDICT r2 order #4)."""
    import torch

    hf, params, cfg = hf_pair
    mel = rng.standard_normal(
        (3, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    max_new = cfg.max_target_positions - 2
    with torch.no_grad():
        out = hf.generate(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
            max_new_tokens=max_new, num_beams=2, do_sample=False,
            length_penalty=length_penalty, early_stopping=early_stopping,
            return_dict_in_generate=True, output_scores=True,
        )
    theirs = out.sequences.numpy()
    hf_scores = out.sequences_scores.numpy()

    enc = jax.jit(lambda p, m: encode(p, cfg, m))(params, mel)
    tokens, scores, lengths = beam_decode(
        params, cfg, enc,
        GenerationConfig(max_new_tokens=max_new, num_beams=2,
                         length_penalty=length_penalty,
                         early_stopping=early_stopping),
    )
    tokens, lengths = np.asarray(tokens), np.asarray(lengths)

    def norm(seq):
        seq = np.asarray(seq)
        if len(seq) and seq[0] == cfg.decoder_start_token_id:
            seq = seq[1:]
        while len(seq) and seq[-1] in (cfg.pad_token_id, cfg.eos_token_id):
            seq = seq[:-1]
        return seq

    for b in range(mel.shape[0]):
        np.testing.assert_array_equal(
            norm(tokens[b, 0, : lengths[b, 0]]), norm(theirs[b]))
    np.testing.assert_allclose(np.asarray(scores)[:, 0], hf_scores,
                               atol=1e-5, rtol=1e-5)


class _TokenTailStop:
    """Torch-side stopping criterion with the reference's stop_words_list
    semantics (full token-sequence tail match) so HF's beam machinery can
    serve as the oracle for ours."""

    def __init__(self, stop_seqs):
        self.stop = [list(s) for s in stop_seqs]

    def __call__(self, input_ids, scores, **kwargs):
        import torch

        out = []
        for row in input_ids.tolist():
            out.append(any(
                len(row) >= len(s) and row[-len(s):] == s for s in self.stop))
        return torch.tensor(out, dtype=torch.bool, device=input_ids.device)


@pytest.mark.parametrize("early_stopping", [True, False])
def test_beam_stop_words_match_hf(hf_pair, rng, early_stopping):
    """A stop word hitting mid-beam retires the candidate into the finished
    pool exactly like EOS (per-candidate stopping criteria — HF
    next_token_hits_stopping_criteria; reference applies stop_words_list
    regardless of beam width, dynamicDecodeLayer.cpp:317-326)."""
    import torch
    from transformers import StoppingCriteria, StoppingCriteriaList

    class TailStop(_TokenTailStop, StoppingCriteria):
        pass

    hf, params, cfg = hf_pair
    mel = rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    max_new = cfg.max_target_positions - 2
    feats = torch.from_numpy(mel.transpose(0, 2, 1))

    # pick a stop bigram from the middle of the unconstrained best beam so
    # the stop genuinely fires mid-decode
    with torch.no_grad():
        free = hf.generate(input_features=feats, max_new_tokens=max_new,
                           num_beams=2, do_sample=False, length_penalty=1.0,
                           early_stopping=early_stopping).numpy()
    stop_word = tuple(int(t) for t in free[0][3:5])
    assert len(stop_word) == 2

    with torch.no_grad():
        out = hf.generate(
            input_features=feats, max_new_tokens=max_new, num_beams=2,
            do_sample=False, length_penalty=1.0,
            early_stopping=early_stopping,
            stopping_criteria=StoppingCriteriaList([TailStop([stop_word])]),
            return_dict_in_generate=True, output_scores=True,
        )
    theirs = out.sequences.numpy()
    hf_scores = out.sequences_scores.numpy()

    enc = jax.jit(lambda p, m: encode(p, cfg, m))(params, mel)
    tokens, scores, lengths = beam_decode(
        params, cfg, enc,
        GenerationConfig(max_new_tokens=max_new, num_beams=2,
                         early_stopping=early_stopping,
                         stop_words=(stop_word,)),
    )
    tokens, lengths = np.asarray(tokens), np.asarray(lengths)

    def norm(seq):
        seq = np.asarray(seq)
        if len(seq) and seq[0] == cfg.decoder_start_token_id:
            seq = seq[1:]
        while len(seq) and seq[-1] in (cfg.pad_token_id, cfg.eos_token_id):
            seq = seq[:-1]
        return seq

    for b in range(mel.shape[0]):
        np.testing.assert_array_equal(
            norm(tokens[b, 0, : lengths[b, 0]]), norm(theirs[b]))
    np.testing.assert_allclose(np.asarray(scores)[:, 0], hf_scores,
                               atol=1e-5, rtol=1e-5)
    # the stop word really fired mid-beam: the winning hypothesis ends with
    # it and is shorter than the unconstrained run
    best = tokens[0, 0, : lengths[0, 0]]
    assert tuple(best[-2:]) == stop_word
    assert lengths[0, 0] < len(norm(free[0])) + 2


@pytest.mark.parametrize("length_penalty", [1.0, 2.0])
def test_beam_scores_match_hf_with_suppress_and_fallback(rng, length_penalty):
    """Cumulative beam scores equal HF's sequences_scores exactly, in the two
    regimes the bookkeeping can get subtly wrong: (a) processors active — HF
    applies suppress AFTER log_softmax, so the suppressed mass stays in the
    normalizer; (b) EOS suppressed entirely, so the finished pool never fills
    and the alive-beam max-length fallback path produces the output (HF
    penalizes it by cur_len + 1 - decoder_prompt_len, i.e. length - 1)."""
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    torch.manual_seed(3)
    hf_cfg = HFConfig(
        vocab_size=53, num_mel_bins=8, d_model=24, encoder_layers=2,
        encoder_attention_heads=4, decoder_layers=2,
        decoder_attention_heads=4, encoder_ffn_dim=48, decoder_ffn_dim=48,
        max_source_positions=12, max_target_positions=12,
        decoder_start_token_id=1, eos_token_id=2, pad_token_id=0,
        bos_token_id=1, suppress_tokens=[2], begin_suppress_tokens=[],
    )
    hf = WhisperForConditionalGeneration(hf_cfg).eval()
    params, cfg = convert_hf_model(hf)
    mel = rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)).astype(np.float32)
    max_new = cfg.max_target_positions - 2

    with torch.no_grad():
        out = hf.generate(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
            max_new_tokens=max_new, num_beams=3, do_sample=False,
            length_penalty=length_penalty, early_stopping=True,
            return_dict_in_generate=True, output_scores=True,
        )
    hf_scores = out.sequences_scores.numpy()

    enc = jax.jit(lambda p, m: encode(p, cfg, m))(params, mel)
    _, scores, lengths = beam_decode(
        params, cfg, enc,
        GenerationConfig(max_new_tokens=max_new, num_beams=3,
                         length_penalty=length_penalty),
    )
    # the fallback path was really exercised: nothing could finish
    assert (np.asarray(lengths)[:, 0] == max_new + 1).all()
    np.testing.assert_allclose(np.asarray(scores)[:, 0], hf_scores,
                               atol=1e-5, rtol=1e-5)
