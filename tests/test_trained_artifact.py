"""Durable trained-weight artifact (VERDICT r4 order 2).

Round 4's trained-weight evidence lived in /tmp and died with the round;
`artifacts/` (built by scripts/make_artifact.py from the synthetic-corpus
training stack) re-anchors it in-repo. These tests load the committed
int8 tiny.en and transcribe a bundled UNSEEN utterance exactly — the
minutes-scale re-verification that used to take a 75-minute retrain.
Match: the reference's committed engine+config artifacts
(examples/whisper/build_encoder.py:44-45,109).
"""

import json
import os
import wave

import numpy as np
import pytest

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts")

# Gate on the WEIGHT file, not the directory: round 5 discovered the
# config dirs can be committed while `.gitignore`'s old `*.msgpack` rule
# silently dropped params.msgpack from the same commit (fixed with an
# explicit `!artifacts/**/*.msgpack` exception + a packaging-time
# `git check-ignore` assertion in scripts/make_artifact.py).
pytestmark = pytest.mark.skipif(
    not os.path.isfile(
        os.path.join(ART, "tiny_en_synth_int8", "params.msgpack")),
    reason="trained artifact weights not built (scripts/make_artifact.py)")


def _read_wav(path):
    with wave.open(path, "rb") as f:
        pcm = np.frombuffer(f.readframes(f.getnframes()), np.int16)
    return pcm.astype(np.float32) / 32768.0


def test_int8_artifact_transcribes_bundled_utterance_exactly():
    import jax.numpy as jnp

    from cli.synthetic_asr import WORDS
    from whisper_trtllm_tpu.audio import log_mel_spectrogram, pad_or_trim
    from whisper_trtllm_tpu.config import GenerationConfig
    from whisper_trtllm_tpu.runtime.generation import transcribe_tokens
    from whisper_trtllm_tpu.utils.checkpoint import load_checkpoint

    params, cfg = load_checkpoint(os.path.join(ART, "tiny_en_synth_int8"))
    audio = _read_wav(os.path.join(ART, "eval", "utt00.wav"))
    with open(os.path.join(ART, "eval", "utt00.txt")) as f:
        truth = f.read().strip()

    mel = log_mel_spectrogram(pad_or_trim(audio),
                              num_mel_bins=cfg.num_mel_bins)
    toks, lens = transcribe_tokens(params, cfg, jnp.asarray(mel),
                                   GenerationConfig(max_new_tokens=32))
    ids = np.asarray(toks)[0, : int(np.asarray(lens)[0])]
    id2word = {100 + i: w for i, w in enumerate(WORDS)}
    got = " ".join(id2word[t] for t in ids if t in id2word)
    assert got == truth


def test_micro_draft_loads_and_matches_spec_shape():
    if not os.path.isfile(
            os.path.join(ART, "micro_draft_bf16", "params.msgpack")):
        pytest.skip("micro draft not packaged yet")
    from whisper_trtllm_tpu.utils.checkpoint import load_checkpoint

    params, cfg = load_checkpoint(os.path.join(ART, "micro_draft_bf16"))
    assert (cfg.d_model, cfg.encoder_layers, cfg.decoder_layers) == (192, 2, 2)
    assert cfg.vocab_size == 51864  # same token space as every target
    assert "encoder" in params and "decoder" in params


def test_expected_json_is_ground_truth():
    """The packaging-time transcripts must BE the ground truth — the
    artifact is only evidence if its eval is exact, not merely stable."""
    with open(os.path.join(ART, "expected.json")) as f:
        exp = json.load(f)
    assert all(exp["exact"]), exp
    assert exp["transcribed"] == exp["texts"]
    for j, text in enumerate(exp["texts"]):
        with open(os.path.join(ART, "eval", f"utt{j:02d}.txt")) as f:
            assert f.read().strip() == text
