"""Build the durable committed trained-weight artifact (VERDICT r4 order 2).

Round 4's trained-weight evidence (GREEN acceptance, drift study,
speculative measurements) died with /tmp; this packages the smallest
artifact set that re-anchors it permanently in-repo:

  artifacts/tiny_en_synth_int8/   int8 weight-only tiny.en trained on the
                                  synthetic corpus (~38 MB msgpack)
  artifacts/micro_draft_bf16/     the 2L/d192 speculative draft (~25 MB)
  artifacts/eval/                 bundled short unseen utterances (wav+txt,
                                  deterministic seed, never in training)
  artifacts/expected.json         transcripts the artifact produced at
                                  packaging time (must equal ground truth)

`tests/test_trained_artifact.py` loads these on CPU and asserts the int8
checkpoint still transcribes a bundled utterance exactly — every future
round (and any connected machine) can re-verify trained-weight claims in
minutes instead of a 75-minute retrain. Match: the reference's committed
engine+config artifact story (examples/whisper/build_encoder.py:44-45,109).

  python scripts/make_artifact.py --target /tmp/wtpu_synth5/ckpt_ft \
      --draft /tmp/wtpu_synth5/ckpt_micro_ft [--out artifacts] [--utts 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", required=True)
    ap.add_argument("--draft")
    ap.add_argument("--out", default="artifacts")
    ap.add_argument("--utts", type=int, default=4)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/wtpu_xla_cache")

    from cli.synthetic_asr import WORDS, make_sentences, sentence_audio, write_wav
    from whisper_trtllm_tpu.audio import log_mel_spectrogram, pad_or_trim
    from whisper_trtllm_tpu.config import GenerationConfig
    from whisper_trtllm_tpu.models.whisper import cast_params
    from whisper_trtllm_tpu.quantization.quantize import weight_only_quantize
    from whisper_trtllm_tpu.runtime.generation import transcribe_tokens
    from whisper_trtllm_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    os.makedirs(args.out, exist_ok=True)

    # ---- int8 target (kernels AND the vocab table — the fp32 embed_tokens
    # alone is ~80 MB at vocab 51864; int8 everywhere lands the artifact
    # near 40 MB. Exactness is re-gated below as stored.) ----
    from whisper_trtllm_tpu.quantization.quantize import quantize_vocab_embedding

    params, cfg = load_checkpoint(args.target)
    qparams = quantize_vocab_embedding(weight_only_quantize(params))
    save_checkpoint(os.path.join(args.out, "tiny_en_synth_int8"), qparams, cfg)

    # ---- bf16 draft ----
    if args.draft:
        d_params, d_cfg = load_checkpoint(args.draft)
        save_checkpoint(os.path.join(args.out, "micro_draft_bf16"),
                        jax.device_get(cast_params(d_params, jnp.bfloat16)),
                        d_cfg)

    # ---- bundled unseen eval utterances (short => small wavs) ----
    eval_dir = os.path.join(args.out, "eval")
    os.makedirs(eval_dir, exist_ok=True)
    sents, rng = make_sentences(args.utts, args.seed, min_words=8,
                                max_words=16)
    texts = []
    for j, s in enumerate(sents):
        write_wav(os.path.join(eval_dir, f"utt{j:02d}.wav"),
                  sentence_audio(s, rng))
        text = " ".join(WORDS[i] for i in s)
        with open(os.path.join(eval_dir, f"utt{j:02d}.txt"), "w") as f:
            f.write(text)
        texts.append(text)

    # ---- packaging-time check: the stored int8 artifact transcribes the
    # bundled audio exactly (as stored — same tree the CPU test loads) ----
    import wave

    qdev = jax.device_put(qparams)
    gen = GenerationConfig(max_new_tokens=32)
    id2word = {100 + i: w for i, w in enumerate(WORDS)}
    got = []
    for j in range(args.utts):
        with wave.open(os.path.join(eval_dir, f"utt{j:02d}.wav"), "rb") as f:
            pcm = np.frombuffer(f.readframes(f.getnframes()), np.int16)
        mel = log_mel_spectrogram(pad_or_trim(pcm.astype(np.float32) / 32768.0),
                                  num_mel_bins=cfg.num_mel_bins)
        toks, lens = transcribe_tokens(qdev, cfg, jnp.asarray(mel), gen)
        ids = np.asarray(toks)[0, : int(np.asarray(lens)[0])]
        got.append(" ".join(id2word[t] for t in ids if t in id2word))
    ok = [g == t for g, t in zip(got, texts)]
    with open(os.path.join(args.out, "expected.json"), "w") as f:
        json.dump({"seed": args.seed, "texts": texts, "transcribed": got,
                   "exact": ok}, f, indent=1)
    print(json.dumps({"exact": sum(ok), "total": len(ok), "out": args.out}))
    if not all(ok):
        raise SystemExit("artifact transcription mismatch — NOT committing "
                         "a checkpoint that fails its own eval")

    # ---- committability: the whole point is weights IN GIT. Round 5
    # found `.gitignore`'s blanket *.msgpack silently dropped
    # params.msgpack from the artifact commits (config.json landed, the
    # 41 MB of weights never did, and the machine reset erased them).
    # Fail packaging loudly if git would ignore any produced file.
    import subprocess

    produced = [os.path.join(args.out, "tiny_en_synth_int8", "params.msgpack")]
    if args.draft:
        produced.append(
            os.path.join(args.out, "micro_draft_bf16", "params.msgpack"))
    ignored = subprocess.run(
        ["git", "check-ignore", *produced],
        capture_output=True, text=True).stdout.strip()
    if ignored:
        raise SystemExit(
            f"git would ignore artifact files (fix .gitignore):\n{ignored}")


if __name__ == "__main__":
    main()
