"""Build a librispeech.cache pickle of (mel, text) pairs.

Analog of the reference's get_LibriSpeech.py (reference:
examples/whisper/get_LibriSpeech.py:13-40), using our own on-device log-mel
frontend instead of openai-whisper's. Accepts either torchaudio's
LIBRISPEECH download or an HF datasets audio dataset.

Usage:
  python -m cli.get_librispeech --output librispeech.cache \
      [--source torchaudio|hf|dir] [--split test-clean] [--limit N]

``--source dir --root <path>``: an already-downloaded LibriSpeech tree (or
any directory) of 16 kHz PCM16 ``.wav`` files with LibriSpeech-style
``*.trans.txt`` transcript files or sibling ``.txt`` files — the
network-free route, validated offline in tests/test_cli_dataset.py.
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np


def _iter_dir(root):
    """Yield (audio float32 16 kHz, transcript) from a local tree of PCM16
    wavs. Transcripts: LibriSpeech `<spk>-<chap>.trans.txt` lines
    ("<utt-id> TEXT") take precedence; else a sibling `<utt>.txt`."""
    import pathlib
    import wave

    root = pathlib.Path(root)
    trans = {}
    for t in root.rglob("*.trans.txt"):
        for line in t.read_text().splitlines():
            if " " in line:
                utt, text = line.split(" ", 1)
                trans[utt] = text.strip()
    wavs = sorted(root.rglob("*.wav"))
    if not wavs:
        raise FileNotFoundError(f"no .wav files under {root}")
    for w in wavs:
        with wave.open(str(w), "rb") as f:
            if f.getsampwidth() != 2 or f.getframerate() != 16000:
                raise ValueError(f"{w}: need 16 kHz PCM16")
            pcm = np.frombuffer(f.readframes(f.getnframes()), np.int16)
            if f.getnchannels() > 1:
                pcm = pcm.reshape(-1, f.getnchannels()).mean(axis=1)
        text = trans.get(w.stem)
        if text is None:
            sib = w.with_suffix(".txt")
            text = sib.read_text().strip() if sib.exists() else ""
        yield pcm.astype(np.float32) / 32768.0, text


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", required=True)
    ap.add_argument("--source", default="torchaudio",
                    choices=["torchaudio", "hf", "dir"])
    ap.add_argument("--split", default="test-clean")
    ap.add_argument("--root", default="./data")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--num-mel-bins", type=int, default=80)
    args = ap.parse_args()

    from whisper_trtllm_tpu.audio import log_mel_spectrogram, pad_or_trim

    items = []
    if args.source == "dir":
        it = _iter_dir(args.root)
    elif args.source == "torchaudio":
        import torchaudio

        ds = torchaudio.datasets.LIBRISPEECH(
            root=args.root, url=args.split, download=True
        )
        it = ((np.asarray(w[0]).reshape(-1), t) for w, sr, t, *_ in ds)
    else:
        from datasets import load_dataset

        ds = load_dataset("librispeech_asr", "clean",
                          split=args.split.replace("-", "."))
        it = ((np.asarray(ex["audio"]["array"], np.float32), ex["text"])
              for ex in ds)

    for i, (audio, text) in enumerate(it):
        if args.limit and i >= args.limit:
            break
        mel = np.asarray(
            log_mel_spectrogram(pad_or_trim(audio.astype(np.float32)),
                                num_mel_bins=args.num_mel_bins)[0]
        )
        items.append((mel, text))
        if (i + 1) % 100 == 0:
            print(f"{i + 1} utterances...")

    with open(args.output, "wb") as f:
        pickle.dump(items, f)
    print(f"wrote {len(items)} (mel, text) pairs to {args.output}")


if __name__ == "__main__":
    main()
