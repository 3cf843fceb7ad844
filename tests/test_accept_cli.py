"""Dry-run of the unattended acceptance harness (cli/accept.py) on a tiny
random HF checkpoint + synthetic dataset: with references set to the HF
transcripts, parity implies WER == 0 and a 100% exact-transcript
differential — the gates the script will enforce against real checkpoints
on a connected machine (reference protocol: examples/whisper/cal_wer.py:
279-287 + examples/whisper/run.py:294-331)."""

import json
import pickle

import numpy as np
import pytest


class _FakeTok:
    """Letters-only detokenizer: ids become distinct words; the toy
    config's special ids (start/eos/bos/forced/suppressed) are skipped —
    symmetric on both sides of every comparison, and inert under the
    EnglishTextNormalizer."""

    SPECIALS = frozenset({0, 1, 2, 3, 5, 7, 11})

    def decode(self, ids, skip_special_tokens=True):
        words = []
        for i in ids:
            i = int(i)
            if i in self.SPECIALS:
                continue
            w = ""
            while True:
                w += chr(97 + i % 26)
                i //= 26
                if not i:
                    break
            words.append("q" + w)
        return " ".join(words)


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    torch.manual_seed(11)
    hf_cfg = HFConfig(
        vocab_size=97, num_mel_bins=16, d_model=32,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=24, max_target_positions=24,
        decoder_start_token_id=1, eos_token_id=2, pad_token_id=2,
        bos_token_id=1, suppress_tokens=[5, 7], begin_suppress_tokens=[3],
        forced_decoder_ids=[[1, 11]],
    )
    hf = WhisperForConditionalGeneration(hf_cfg).eval()
    hf.generation_config.forced_decoder_ids = [[1, 11]]
    path = tmp_path_factory.mktemp("hf") / "whisper-test"
    hf.save_pretrained(str(path))
    return str(path), hf, hf_cfg


@pytest.fixture(scope="module")
def dataset(hf_dir, tmp_path_factory):
    """Synthetic (mel, text) cache where text = the HF transcript, so a
    parity-true framework scores WER 0."""
    import torch

    path, hf, hf_cfg = hf_dir
    rng = np.random.default_rng(0)
    n = 5
    mels = rng.standard_normal(
        (n, 2 * hf_cfg.max_source_positions, hf_cfg.num_mel_bins)
    ).astype(np.float32)
    tok = _FakeTok()
    with torch.no_grad():
        out = hf.generate(
            input_features=torch.from_numpy(mels.transpose(0, 2, 1)),
            decoder_input_ids=torch.tensor([[1, 11]] * n),
            max_new_tokens=9, do_sample=False).numpy()
    texts = [tok.decode(row[row != 2]) for row in out]
    ds = tmp_path_factory.mktemp("data") / "synthetic.cache"
    with open(ds, "wb") as f:
        pickle.dump(list(zip([m for m in mels], texts)), f)
    return str(ds)


def test_accept_passes_gates(hf_dir, dataset, tmp_path, monkeypatch, capsys):
    import transformers

    monkeypatch.setattr(
        transformers.WhisperTokenizerFast, "from_pretrained",
        classmethod(lambda cls, p: _FakeTok()))
    from cli import accept

    out = tmp_path / "accept.json"
    rc = accept.main([
        "--hf-dir", hf_dir[0], "--dataset", dataset,
        "--batch", "2", "--max-new-tokens", "10",
        "--wer-threshold", "0.0", "--min-match-frac", "1.0",
        "--bf16-drift", "--out", str(out),
    ])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["pass"] is True
    assert report["wer_pct"] == 0.0
    assert report["differential_frac"] == 1.0
    assert report["differential_same"] == report["differential_total"] == 5
    assert report["hf_wer_pct"] == 0.0
    assert 0.0 <= report["bf16_token_agreement"] <= 1.0
    assert "bf16_wer_pct" in report


def test_accept_gate_fails_on_bad_refs(hf_dir, dataset, tmp_path,
                                       monkeypatch):
    """Corrupted references must fail the WER gate (nonzero exit)."""
    import transformers

    monkeypatch.setattr(
        transformers.WhisperTokenizerFast, "from_pretrained",
        classmethod(lambda cls, p: _FakeTok()))
    from cli import accept

    with open(dataset, "rb") as f:
        data = pickle.load(f)
    bad = tmp_path / "bad.cache"
    with open(bad, "wb") as f:
        pickle.dump([(m, "qzz totally wrong words") for m, _ in data], f)
    rc = accept.main([
        "--hf-dir", hf_dir[0], "--dataset", str(bad),
        "--batch", "2", "--max-new-tokens", "10",
        "--wer-threshold", "1.0", "--skip-differential",
    ])
    assert rc == 1
