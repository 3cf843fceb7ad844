"""Offline validation of the dataset-cache pipeline: synthetic PCM16 wavs +
LibriSpeech-style transcript files → cli/get_librispeech --source dir →
a cache consumable by cli/cal_wer's loader and the acceptance harness
(the reference's get_LibriSpeech.py is network-bound and was never
validatable in this environment — the dir source closes that gap)."""

import pickle
import runpy
import sys
import wave

import numpy as np


def _write_wav(path, seconds=1.0, freq=220.0):
    t = np.arange(int(16000 * seconds)) / 16000.0
    pcm = (0.3 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(pcm.tobytes())


def test_get_librispeech_dir_source(tmp_path):
    spk = tmp_path / "61" / "70968"
    spk.mkdir(parents=True)
    _write_wav(spk / "61-70968-0000.wav", freq=220)
    _write_wav(spk / "61-70968-0001.wav", freq=440)
    (spk / "61-70968.trans.txt").write_text(
        "61-70968-0000 HELLO WORLD\n61-70968-0001 SECOND LINE\n")
    # one more with a sibling .txt instead
    solo = tmp_path / "solo"
    solo.mkdir()
    _write_wav(solo / "utt.wav", freq=330)
    (solo / "utt.txt").write_text("sibling transcript")

    out = tmp_path / "ls.cache"
    argv = sys.argv
    sys.argv = ["get_librispeech", "--output", str(out), "--source", "dir",
                "--root", str(tmp_path), "--num-mel-bins", "16"]
    try:
        runpy.run_module("cli.get_librispeech", run_name="__main__")
    finally:
        sys.argv = argv

    with open(out, "rb") as f:
        items = pickle.load(f)
    assert len(items) == 3
    texts = sorted(t for _, t in items)
    assert texts == ["HELLO WORLD", "SECOND LINE", "sibling transcript"]
    for mel, _ in items:
        assert mel.shape == (3000, 16) and np.isfinite(mel).all()

    # the cache round-trips through the standard loader
    from cli.transcribe import _load_dataset

    mels, txts = _load_dataset(str(out), 16)
    assert mels.shape == (3, 3000, 16) and len(txts) == 3
